"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship RAG retrieval pipeline on sf0.001.
queries()      -> one entry per implemented operator (SURVEY.md §2 + the
                  LLM-data-pipeline suite), each (spark, sf_dir) -> DataFrame.
oracle_sql()   -> DuckDB-runnable ANSI SQL twin for every query, built from
                  the same dual-dialect fragments (oaim_sandbox_spark/
                  functions/portable.py) as the Spark side.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from oaim_sandbox_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's retrieval
    path (§3.1) end to end without network — mock-embed the query string,
    score every document chunk by cosine distance, return the top-5 chunks.
    """
    return Q.spark_queries()["rag_topk_mock_query"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.spark_queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sqls()
