"""Bucketed-layout co-located join: the orders⋈lineitem shuffle eliminated
(PLANS.md 'known costs' item, now implemented via relational.write_bucketed)."""

import pytest
from pyspark.sql import functions as F

from oaim_sandbox_spark.operators.relational import write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_is_shuffle_free(spark, no_broadcast):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders, "b_orders", "o_orderkey", buckets=4)
    write_bucketed(lineitem, "b_lineitem", "l_orderkey", buckets=4)
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        # sanity: same row count as the plain join
        plain = orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_agg_avoids_exchange(spark, no_broadcast):
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(lineitem, "b_li_agg", "l_orderkey", buckets=4)
    try:
        agg = spark.table("b_li_agg").groupBy("l_orderkey").agg(F.sum("l_quantity"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # grouping key == bucket key
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li_agg")
