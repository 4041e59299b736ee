"""Relational operators beyond the reference's surface — as-of joins, range
(interval) joins, rollups — the time-series shapes a 100 TB event pipeline
needs (SURVEY §2.4 notes the reference has no theta/range/as-of joins; these
are the Spark-first additions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    partition_col: str,
    order_col: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join: for every left row, the most recent right row with
    right.order <= left.order within the same partition key.

    Implementation: union the two streams with a side tag, then
    last_value(ignorenulls) over (partition, order) — ONE shuffle on the
    partition key, no row-by-row lookup, no skewed self-join. This is the
    standard scale-out as-of pattern (vs. a merge-join per key, which Spark
    lacks natively).
    """
    overlap = [c for c in right_cols if c in left.columns]
    if overlap:
        # the final .drop(*right_cols) would silently DELETE the left
        # side's own same-named column (its values rode the union) — make
        # the caller rename instead of losing data without an error
        raise ValueError(
            f"right_cols {overlap} collide with left columns; rename one side "
            f"(the as-of value is emitted as '<col>{suffix}')"
        )
    lt = left.withColumn("_side", F.lit(1))
    rt = right.withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    for c in right_cols:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    all_cols = list(dict.fromkeys(left.columns + right_cols + ["_side"]))
    unioned = lt.select(all_cols).unionByName(rt.select(all_cols))
    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.col(order_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = unioned
    for c in right_cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w),
        )
    return out.filter(F.col("_side") == 1).drop("_side", *right_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    partition_col: str,
    left_point: str,
    right_point: str,
    lower: Column | int,
    upper: Column | int,
) -> DataFrame:
    """Interval join: pairs (l, r) in the same partition with
    r.point - l.point in [lower, upper].

    Plan note: Spark executes equi-key + range predicates as a hash join on
    the key with the range as a post-filter; for key-less range joins, bucket
    the points into coarse bins first so the join is equi on bin (classic
    range-bucketing — avoids the O(n·m) nested loop).
    """
    l, r = left.alias("l"), right.alias("r")
    delta = F.col(f"r.{right_point}") - F.col(f"l.{left_point}")
    return l.join(
        r,
        (F.col(f"l.{partition_col}") == F.col(f"r.{partition_col}"))
        & (delta >= lower)
        & (delta <= upper),
    )


def rollup_agg(df: DataFrame, dims: list[str], aggs: list[Column]) -> DataFrame:
    """Hierarchical rollup (the reference has no grouping-sets machinery at
    all, SURVEY §2.5 — Catalyst gives it for free). Partial aggregation
    applies per grouping set; one shuffle."""
    return df.rollup(*dims).agg(*aggs)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key —
    the metastore-backed layout that makes repeated big joins shuffle-free:
    two tables bucketed on the same key with the same bucket count join as a
    zero-Exchange SortMergeJoin (each task reads matching bucket files).

    This is THE fix for the one irreducible shuffle in the TPC-H-shaped
    plans (orders ⋈ lineitem on orderkey, PLANS.md): pay the shuffle once at
    layout time, amortize it over every subsequent join/agg on that key. At
    100 TB choose buckets so each bucket file lands in the 128MB-1GB range.
    """
    w = df.write.mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def zorder_expr(df: DataFrame, cols: list[str], bits: int = 16) -> "F.Column":
    """Z-value (Morton code) over up to 4 numeric columns: each column is
    quantized to its [min, max] range in ``bits`` levels, then the bit
    planes are interleaved. Rows close in Z-value are close in EVERY keyed
    dimension, so sorting by it clusters multi-column locality into file
    min/max ranges."""
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder takes 1-4 columns")
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    levels = (1 << bits) - 1
    quantized = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None:
            # empty frame or all-null column: no ordering information —
            # contribute a constant 0 plane instead of TypeErroring on
            # None arithmetic (maintenance jobs hit this on empty stores)
            quantized.append("cast(0 as bigint)")
            continue
        span = (mx - mn) or 1.0
        quantized.append(
            f"cast(round((cast({c} as double) - {float(mn)!r}d) / {float(span)!r}d * {levels}) as bigint)"
        )
    # interleave bit planes: bit b of column i lands at position b*n + i
    n = len(cols)
    parts = [
        f"shiftleft(shiftright({q}, {b}) & 1, {b * n + i})"
        for i, q in enumerate(quantized)
        for b in range(bits)
    ]
    return F.expr(" + ".join(parts)).alias("_zval")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Multi-dimensional clustering for data skipping (the open-source shape
    of Delta OPTIMIZE ZORDER BY): range-partition + sort by the interleaved
    Z-value, so parquet footer min/max on EVERY zordered column is narrow
    per file and a filter on ANY of them prunes most files — where a
    single-column sort only skips on its leading column.

    At 100 TB this is the difference between a point query touching a few
    files and touching all of them; pair with ``n_files`` sized so files
    land in the 128MB-1GB range. One full shuffle at layout time, amortized
    over every subsequent selective scan."""
    z = zorder_expr(df, cols, bits)
    (
        df.withColumn("_zval", z)
        .repartitionByRange(n_files, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
        .write.mode(mode)
        .parquet(path)
    )
