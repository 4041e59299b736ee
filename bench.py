"""Benchmark runner (driver contract): run the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Timing is per-query wall time including the collect (driver-side transfer is
part of the honest cost); Spark session startup is excluded. An extra
composite entry `ingest_pipeline` measures the reference's §3.2 ingest job
(split -> dedup -> mock-embed -> content-id anti-join merge) end to end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oaim_sandbox_spark import queries as Q
from oaim_sandbox_spark.session import get_spark


def ingest_pipeline(spark, sf_dir: str) -> int:
    """Reference §3.2 end to end on the documents table: fixed-stride split
    (P1) -> exact dedup (P7) -> content-address (sha256) -> anti-join merge
    against the even-doc half (K2) -> mock-embed only the new rows (P9,
    skip-recompute improvement) -> count."""
    from pyspark.sql import functions as F

    from oaim_sandbox_spark.operators.dedup import exact_dedup
    from oaim_sandbox_spark.operators.embed import mock_embed_column
    from oaim_sandbox_spark.operators.merge import merge_new_rows, with_content_id
    from oaim_sandbox_spark.operators.split import split_fixed

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = split_fixed(docs, text_col="text", id_col="doc_id", chunk_size=200, chunk_overlap=20)
    deduped = exact_dedup(chunks, text_col="text", order_col="id")
    addressed = with_content_id(deduped, text_col="text", id_col="cid")
    existing = with_content_id(
        split_fixed(docs.filter(F.col("doc_id") % 2 == 0), "text", "doc_id", 200, 20),
        text_col="text",
        id_col="cid",
    )
    fresh = merge_new_rows(addressed, existing, id_col="cid")
    embedded = mock_embed_column(fresh, text_col="text", dim=64)
    return embedded.count()


def testbed_eval(spark, sf_dir: str) -> int:
    """BASELINE target 'testbed evaluation throughput': generate a 500-row QA
    set from document chunks, run the data-parallel answer+judge mapInPandas
    (stub answerer/judge — deterministic, no network), aggregate A1-A3."""
    from oaim_sandbox_spark.operators.split import split_fixed
    from oaim_sandbox_spark.operators.testbed import evaluate_testset, generate_testset

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = split_fixed(docs, text_col="text", id_col="doc_id", chunk_size=400, chunk_overlap=0)
    qa = generate_testset(chunks, n_questions=500)

    def answer_factory():
        return lambda q: "the passage describes " + q[40:80]

    def judge_factory():
        return lambda q, ref, ans: (len(ans) + len(ref)) % 3 != 0

    report = evaluate_testset(spark, qa, answer_factory, judge_factory, tid="bench")
    return int(round(report.correctness * 10_000))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("oaim-sandbox-bench")

    timings: dict[str, float] = {}
    queries = Q.spark_queries()
    # warm the JVM/session (parquet reader, codegen, shuffle machinery) so the
    # first measured query isn't paying one-time startup
    spark.sql("SELECT 1").collect()
    warm = spark.read.parquet(f"{sf_dir}/region.parquet")
    warm.groupBy("r_name").count().collect()

    for name, fn in queries.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            n = len(df.collect())
        except Exception as e:  # a failed query must not zero the whole bench
            print(f"# BENCH ERROR {name}: {str(e).splitlines()[0][:200]}", file=sys.stderr)
            continue
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    for comp_name, comp in (("ingest_pipeline", ingest_pipeline), ("testbed_eval", testbed_eval)):
        t0 = time.time()
        try:
            n = comp(spark, sf_dir)
            timings[comp_name] = round(time.time() - t0, 3)
            print(f"# {comp_name}: {timings[comp_name]}s ({n})", file=sys.stderr)
        except Exception as e:
            print(f"# BENCH ERROR {comp_name}: {str(e).splitlines()[0][:200]}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_wall_seconds_all_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
