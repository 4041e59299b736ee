"""Local mirror of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB at a given SF, compare row count, column
names, column TYPES, and order-insensitive values.

DRIVER-STRICT (round-3 hardening — see VERDICT.md r2 "What's wrong" #3): the
round-1/2 version coerced Decimal->float and stringified lists, so it passed
110/110 locally while the driver failed 5 queries on DECIMAL-vs-DOUBLE drift
and an array-typed column. This version is strictly tougher than the driver:

- cells are TYPE-TAGGED before comparison, so Decimal('0.896880') on Spark vs
  0.89688 on DuckDB is a FAIL even when numerically identical (that exact case
  shipped twice);
- list/tuple/dict/set/bytes/ndarray cells raise -> FAIL ("the driver hasher
  cannot hash complex cells");
- per-query column-type parity: Spark dtype vs DuckDB type, canonicalized
  (integer widths collapse — str(5) is width-independent in the driver's
  hash — but decimal-vs-double, and decimal SCALE, are load-bearing).

Usage: python tools/check_correctness.py [--vanilla] [sf_dir] [query ...]
(--vanilla = bare SparkSession with no tuned conf, like the driver runs)
"""

from __future__ import annotations

import decimal
import re
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb


class ComplexCell(Exception):
    pass


_COMPLEX = (list, tuple, dict, set, frozenset, bytes, bytearray, memoryview)


def norm_cell(v):
    """Type-tagged canonical string. The tag makes the comparison strictly
    tougher than the driver's plain stringify: any cross-engine type-class
    drift fails even when the string forms coincide (e.g. '0.5' vs '0.5')."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, _COMPLEX):
        raise ComplexCell(type(v).__name__)
    if type(v).__module__ == "numpy" and hasattr(v, "ndim") and getattr(v, "ndim", 0):
        raise ComplexCell(type(v).__name__)
    if isinstance(v, decimal.Decimal):
        # str() keeps trailing zeros — exactly what the driver hashes and
        # exactly what diverges from a float's shortest-repr.
        return f"dec:{v}"
    if isinstance(v, float):
        if v != v:
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    return f"s:{v}"


def canonical(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    return out


_INT_TYPES = {"tinyint", "smallint", "int", "integer", "bigint", "hugeint",
              "utinyint", "usmallint", "uinteger", "ubigint", "int8", "int16",
              "int32", "int64", "long", "short", "byte"}


def canon_type(t: str) -> str:
    """Collapse engine spellings into driver-relevant classes. Integer widths
    merge (str(5) hashes identically from any width); float vs double merge
    (both reach Python as float); DECIMAL keeps its SCALE (trailing zeros in
    str()); complex types are flagged so they fail before .collect()."""
    t = t.strip().lower()
    m = re.match(r"(?:decimal|numeric)\s*\(\s*\d+\s*,\s*(\d+)\s*\)", t)
    if m:
        return f"decimal(s={m.group(1)})"
    if t in ("decimal", "numeric"):
        return "decimal(s=?)"
    if t in _INT_TYPES:
        return "int"
    if t in ("double", "float", "real", "float64", "float32", "double precision"):
        return "float"
    if t in ("varchar", "string", "text", "char", "bpchar"):
        return "string"
    if t in ("boolean", "bool"):
        return "bool"
    if t.startswith("timestamp"):
        return "timestamp"
    if t == "date":
        return "date"
    if re.match(r"(array|map|struct|list|union)\b|<|\[\]", t):
        return f"COMPLEX:{t}"
    return t


def type_problems(scols, sdtypes, dcols, dtypes):
    """Per-column canonical type parity, matched by lower-cased column name."""
    smap = {c.lower(): canon_type(t) for c, t in zip(scols, sdtypes)}
    dmap = {c.lower(): canon_type(t) for c, t in zip(dcols, dtypes)}
    probs = []
    for col in sorted(set(smap) & set(dmap)):
        st, dt = smap[col], dmap[col]
        if st.startswith("COMPLEX:") or dt.startswith("COMPLEX:"):
            probs.append(f"complex-typed column {col!r}: spark={st} duck={dt} (driver hasher cannot hash it)")
        elif st != dt:
            probs.append(f"type drift on {col!r}: spark={st} duck={dt}")
    return probs


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod

    if vanilla:
        # driver-faithful mode: a bare SparkSession with NO tuned conf — the
        # engine must self-configure (register_views sets nanosAsLong etc.);
        # catches code that silently depends on our own session builder
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
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
            sdtypes = [t for _, t in sdf.dtypes]
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {(str(e).splitlines() or [''])[0][:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(srows)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = duck.sql(oracles[name])
            dcols = rel.columns
            dtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {(str(e).splitlines() or [''])[0][:200]}")
            n_fail += 1
            continue
        problems = []
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            problems.append(f"columns differ: spark={scols} duck={dcols}")
        else:
            problems.extend(type_problems(scols, sdtypes, dcols, dtypes))
        if len(srows) != len(drows):
            problems.append(f"rowcount differs: spark={len(srows)} duck={len(drows)}")
        if not problems:
            try:
                s_can = canonical([list(r) for r in srows], [c.lower() for c in scols])
                d_can = canonical([list(r) for r in drows], [c.lower() for c in dcols])
            except ComplexCell as e:
                problems.append(f"unhashable complex cell ({e}) — driver would ERR")
            else:
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
