"""Local mirror of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB at a given SF, compare row count, column
names, and order-insensitive values (sorted columns, stringified rows).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v != v:
            return "nan"
        return f"{v:.6f}".rstrip("0").rstrip(".") if abs(v) < 1e15 else repr(v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return norm_cell(float(v))
    except Exception:
        pass
    return str(v)


def canonical(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from oaim_sandbox_spark.session import get_spark

    spark = get_spark("correctness-check")
    duck = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        duck.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(srows)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = duck.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        problems = []
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            problems.append(f"columns differ: spark={scols} duck={dcols}")
        if len(srows) != len(drows):
            problems.append(f"rowcount differs: spark={len(srows)} duck={len(drows)}")
        if not problems:
            s_can = canonical([list(r) for r in srows], [c.lower() for c in scols])
            d_can = canonical([list(r) for r in drows], [c.lower() for c in dcols])
            if s_can != d_can:
                diffs = [(a, b) for a, b in zip(s_can, d_can) if a != b][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
