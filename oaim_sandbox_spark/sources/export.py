"""Training-data export: sharded JSONL/Parquet/ORC with controlled sizing.

The last stage of an LLM data pipeline writes the curated corpus as shards
sized for the training loader (e.g. ~1e5 rows or ~256 MB per shard,
WebDataset/Mosaic-style). The reference's only export is the K6 debug sink
(single JSON dir, reference split_embed.py — see sources/loaders.py
chunks_to_json); this is the scale form:

  - shard count derived from a target rows-per-shard (ceil(n/target)),
  - `repartition(n_shards)` — round-robin, so shards are size-balanced
    regardless of input skew (a hash key would inherit source skew),
  - deterministic option: `sort_within_partitions` by a key column so a
    shard's contents are stable for a fixed shard count,
  - format-symmetric round trip: JSONL for loader interop, Parquet/ORC for
    columnar re-reads (both are built-in Spark datasources — column-pruned,
    predicate-pushdown scans when the corpus is re-curated later).

At 100 TB this is one narrow exchange (the repartition) and a parallel
write — no driver involvement; shard count scales with the data.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("json", "parquet", "orc")


def write_training_shards(
    df: DataFrame,
    path: str,
    target_rows_per_shard: int = 100_000,
    order_col: str | None = None,
    mode: str = "overwrite",
    fmt: str = "json",
) -> int:
    """Write df as size-balanced shards; returns the shard count.

    A count() pass sizes the shards (one cheap scan — at scale, reuse a
    known count or a metadata estimate instead). order_col makes shard
    contents deterministic for a fixed count. fmt: json (JSONL, loader
    interop) | parquet | orc (columnar, for downstream re-curation)."""
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}, got {fmt!r}")
    n = df.count()
    n_shards = max(1, math.ceil(n / target_rows_per_shard))
    out = df.repartition(n_shards)
    if order_col is not None:
        out = out.sortWithinPartitions(order_col)
    out.write.mode(mode).format(fmt).save(path)
    return n_shards


def read_training_shards(spark: SparkSession, path: str, fmt: str = "json") -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}, got {fmt!r}")
    return spark.read.format(fmt).load(path)
