"""SparkSession factory tuned for the vector/RAG workload.

Local testing uses local[N]; the same conf scales to a multi-executor cluster:
AQE handles skew + dynamic coalescing, Arrow batches size the embed UDF batches
(reference uses 500 chunks/batch — src/server/utils/embedding.py:320-324).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Reference batches embeddings 500 chunks at a time (embedding.py:320-324).
EMBED_BATCH_SIZE = 500


def get_spark(app_name: str = "oaim-sandbox-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    Every knob here is chosen for the 100 TB target, not just local tests:
      - AQE on: runtime coalescing, skew-join splitting, dynamic join selection.
      - Arrow enabled + maxRecordsPerBatch=500: the embed UDF (P9) sees the same
        batch size the reference uses for provider HTTP calls.
      - shuffle.partitions modest locally; on a real cluster set to 2-3x cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(EMBED_BATCH_SIZE))
        .config("spark.sql.session.timeZone", "UTC")
        # zstd over default snappy: ~30% smaller store/shard files at
        # comparable scan CPU — at 100 TB the store IS the cost; snappy's
        # encode-speed edge only matters for shuffle spill, which keeps its
        # own codec setting
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local-mode default heap is 1g — far too small for local[32] on a
        # large box (only effective at first JVM launch; harmless after)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()
