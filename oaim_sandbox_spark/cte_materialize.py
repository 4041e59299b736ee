"""Materialize multi-referenced CTEs of a generated SQL statement (r13 opt).

Spark inlines every CTE reference (no Catalyst-level CTE sharing for our
plans — verified empirically on 4.1: a twice-referenced windowed CTE plans
its subtree twice, no ReusedExchange), so an oracle template whose WITH
clause feeds k consumers re-scans and re-computes its subtree k times:
`pagerank_3iter` planned 35 base-table scans, `data_quality_profile` 24,
`funnel_conversion` 20. DuckDB materializes multiply-referenced CTEs on its
own, which is why the shared dual-dialect templates are written this way.
The hand-written SPARK_OVERRIDES fixed the worst known cases one by one
(`_materialized_view` pattern); this module is the GENERIC version applied
by the default registry runner, so every remaining template gets the same
treatment: each multi-referenced corpus-scanning CTE is computed ONCE
through materialize.materialize_relation (size-thresholded localCheckpoint /
durable staging — the 100 TB-safe materializer) and registered as a temp
view under its own CTE name; the rewritten statement simply omits that
definition, so the reference resolves to the materialized view with ZERO
rewriting of the remaining SQL. Results are bit-identical: the same
deterministic subtree feeds every consumer, just computed once.

The parser handles exactly the shape our templates generate — a single
top-level `WITH n1 AS (...), n2 AS (...) <final select>` with arbitrarily
nested parens and single-quoted strings inside bodies. Anything it cannot
parse falls back to plain ``spark.sql`` (parse_failure=None return), so a
novel template shape can never break a certified query.

SIZE THRESHOLD (scale-adaptive, measured r13): at bench scale (17 MB of
parquet) the recomputed subtrees are cheaper than the materialization jobs —
a 16-query A/B read 14.5s plain vs 14.9s materialized, rows identical — so
materialization only fires when the CTE's scanned base tables exceed
``spark.oaim.cte.minInputBytes`` (default 1 GiB: never at test SFs, always
on a corpus that matters). This is the same size-thresholded-strategy rule
as materialize.materialize_relation and the CC driver path: the local bench
keeps its exact plans and timings, the 100 TB plan computes each corpus
subtree once instead of `reference_count` times.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# fires only at corpus scale; override (spark.conf) for tests/production
MIN_INPUT_BYTES_CONF = "spark.oaim.cte.minInputBytes"
MIN_INPUT_BYTES_DEFAULT = 1 << 30

# materialization is only worth a job when the CTE's subtree does corpus
# work: it must scan one of the registered base tables directly
_BASE_TABLES = (
    "documents", "events", "lineitem", "orders", "embeddings",
    "customer", "part", "supplier", "nation", "region",
)
_WITH_RE = re.compile(r"^\s*WITH\s", re.IGNORECASE)
_NAME_AS_RE = re.compile(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s*\(", re.IGNORECASE)

# nondeterminism guard (VERDICT r13 #6): a nondeterministic CTE referenced k
# times computes k INDEPENDENT samples when inlined but ONE shared sample
# when materialized — never materialize such a body. (All current templates
# are hash-deterministic by repo convention, and DuckDB materializes CTEs
# natively so the oracle already has single-evaluation semantics; the guard
# makes the rewriter safe by construction for future templates.)
_NONDET_RE = re.compile(
    r"\b(rand|randn|random|uuid|shuffle|monotonically_increasing_id|now|"
    r"current_timestamp|current_date|unix_timestamp)\s*\(",
    re.IGNORECASE,
)


def split_with_clause(sql: str):
    """Parse `WITH a AS (...), b AS (...) <final>` into ([(name, body)...],
    final_sql). Returns None when the statement has no top-level WITH or the
    shape is anything unexpected (nested WITH at top level, quoting the
    scanner can't track, ...) — callers fall back to plain execution. The
    body scanner tracks single-quoted literals, double-quoted identifiers,
    and `--` line comments (ADVICE r13: an unbalanced paren/quote inside a
    comment or quoted identifier must not mis-split the statement)."""
    m = _WITH_RE.match(sql)
    if not m:
        return None
    pos = m.end()
    ctes: list[tuple[str, str]] = []
    while True:
        nm = _NAME_AS_RE.match(sql, pos)
        if not nm:
            return None
        name = nm.group(1)
        i = nm.end()  # just past the opening paren
        depth = 1
        in_str = False  # inside '...'
        in_dq = False  # inside "..."
        while i < len(sql) and depth:
            ch = sql[i]
            if in_str:
                if ch == "'":
                    # '' is an escaped quote inside a literal
                    if i + 1 < len(sql) and sql[i + 1] == "'":
                        i += 1
                    else:
                        in_str = False
            elif in_dq:
                if ch == '"':
                    if i + 1 < len(sql) and sql[i + 1] == '"':
                        i += 1
                    else:
                        in_dq = False
            elif ch == "-" and i + 1 < len(sql) and sql[i + 1] == "-":
                # line comment: skip to end of line (or end of text)
                nl = sql.find("\n", i)
                i = (nl if nl != -1 else len(sql) - 1)
            elif ch == "'":
                in_str = True
            elif ch == '"':
                in_dq = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            i += 1
        if depth:
            return None
        ctes.append((name, sql[nm.end() : i - 1]))
        # after the closing paren: either `, next AS (` or the final body
        rest = sql[i:]
        comma = re.match(r"\s*,", rest)
        if comma:
            pos = i + comma.end()
            continue
        return ctes, rest


def _ref_pat(name: str) -> re.Pattern:
    """References to a CTE in relation position: FROM/JOIN, or a comma-join
    list item (`FROM a, name`). The comma alternative can over-match (a
    SELECT-list column sharing the CTE's name), which only ever OVER-counts —
    worst case a single-reference CTE is materialized once, same rows, one
    extra bounded job; an under-count would silently skip the optimization.
    A following `(` is excluded so function calls never count."""
    return re.compile(
        rf"(?:\bFROM|\bJOIN|,)\s*{re.escape(name)}\b(?!\s*\()", re.IGNORECASE
    )


def _ref_count(name: str, texts: list[str]) -> int:
    pat = _ref_pat(name)
    return sum(len(pat.findall(t)) for t in texts)


def _table_size_bytes(spark: SparkSession, table: str) -> int:
    """Catalyst size estimate of a registered base view, cached per session.
    A failed lookup counts 0 — the conservative direction (no materialization
    job the local bench would have to pay)."""
    cache = getattr(spark, "_oaim_cte_sizes", None)
    if cache is None:
        cache = {}
        spark._oaim_cte_sizes = cache
    if table not in cache:
        try:
            jdf = spark.table(table)._jdf
            cache[table] = int(jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        except Exception:
            cache[table] = 0
    return cache[table]


def run_sql_materialized(spark: SparkSession, sql: str) -> DataFrame:
    """``spark.sql`` with multi-referenced corpus-scanning CTEs computed once.

    A CTE is materialized when it is referenced >= 2 times across the later
    CTE bodies + final statement AND its body (or the body of a CTE it was
    derived from in an earlier materialization — transitively, because the
    earlier view replaces that scan) names a base table. Materialized views
    are dropped right after the final statement is analyzed (the returned
    plan keeps the resolved relations — the established `_sql_dropping`
    contract)."""
    try:
        floor = int(spark.conf.get(MIN_INPUT_BYTES_CONF, str(MIN_INPUT_BYTES_DEFAULT)))
    except ValueError:
        floor = MIN_INPUT_BYTES_DEFAULT
    parsed = split_with_clause(sql)
    if not parsed:
        return spark.sql(sql)
    ctes, final = parsed
    bodies = {n: b for n, b in ctes}
    later_texts = {  # texts in which references to CTE i count
        n: [b2 for n2, b2 in ctes[i + 1 :]] + [final]
        for i, (n, b) in enumerate(ctes)
    }
    # a CTE "does corpus work" if its body scans a base table, or references
    # a corpus-working CTE that we did NOT materialize (its work is inlined)
    corpus_work: dict[str, bool] = {}
    to_materialize: list[str] = []
    registered: list[str] = []
    from oaim_sandbox_spark.materialize import materialize_relation

    try:
        kept_defs: list[str] = []
        input_bytes: dict[str, int] = {}
        for name, body in ctes:
            scanned = [t for t in _BASE_TABLES if _ref_pat(t).search(body)]
            upstream = [
                n2
                for n2, _ in ctes
                if corpus_work.get(n2, False) and _ref_pat(n2).search(body)
            ]
            inherits = any(n2 not in to_materialize for n2 in upstream)
            corpus_work[name] = bool(scanned) or inherits
            # input mass: direct base scans + (transitively) upstream corpus
            # CTEs still inlined into this body
            input_bytes[name] = sum(_table_size_bytes(spark, t) for t in scanned) + sum(
                input_bytes.get(n2, 0) for n2 in upstream if n2 not in to_materialize
            )
            big_enough = input_bytes[name] >= floor
            # never register a view under a name that already resolves in the
            # session (a CTE legally shadows a table/view; a temp view of the
            # same name would CLOBBER it for every later query). The catalog
            # lookup is a py4j round-trip, so it runs ONLY once the cheap
            # gates pass (at the default floor that is never at bench scale —
            # zero catalog chatter on the hot path).
            if (
                corpus_work[name]
                and big_enough
                and _ref_count(name, later_texts[name]) >= 2
                and name not in _BASE_TABLES
                and not _NONDET_RE.search(body)
                and not spark.catalog.tableExists(name)
            ):
                # compute the body once: earlier non-materialized defs are
                # re-attached; earlier materialized names resolve to their
                # temp views (same name)
                prefix = f"WITH {', '.join(kept_defs)}\n" if kept_defs else ""
                rel = materialize_relation(spark.sql(prefix + body), f"cte_{name}")
                rel.createOrReplaceTempView(name)
                registered.append(name)
                to_materialize.append(name)
            else:
                kept_defs.append(f"{name} AS ({body})")
        if not registered:
            # nothing was materialized: run the ORIGINAL statement text, not
            # a reconstruction (ADVICE r13: the default path for every WITH
            # query must not depend on the scanner's round-trip fidelity)
            return spark.sql(sql)
        out_sql = (f"WITH {', '.join(kept_defs)}\n" if kept_defs else "") + final
        return spark.sql(out_sql)
    finally:
        for name in registered:
            spark.catalog.dropTempView(name)
