"""Tests for connected_components (corpus dedup clustering) and redact_pii."""

from pyspark.sql import functions as F

from oaim_sandbox_spark.operators.dedup import connected_components
from oaim_sandbox_spark.operators.text_analysis import redact_pii


def test_cc_basic_components(spark):
    # chain 1-2-3, pair 10-11, singleton 20
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a BIGINT, doc_b BIGINT"
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 20)], "doc_id BIGINT")
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(edges, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_cc_long_chain_pointer_jumping(spark):
    # a 40-node path: worst case for plain propagation; pointer jumping keeps
    # rounds logarithmic and the default max_iter is plenty
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a BIGINT, doc_b BIGINT"
    )
    nodes = spark.createDataFrame([(i,) for i in range(41)], "doc_id BIGINT")
    out = connected_components(edges, nodes)
    assert out.select("cluster_id").distinct().count() == 1
    assert out.agg(F.max("cluster_id")).collect()[0][0] == 0


def test_cc_restores_shuffle_conf(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    edges = spark.createDataFrame([(1, 2)], "doc_a BIGINT, doc_b BIGINT")
    nodes = spark.createDataFrame([(1,), (2,)], "doc_id BIGINT")
    connected_components(edges, nodes).collect()
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_redact_pii_masks_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at john.doe@example.com or call +1 (555) 123-4567 now"),
            (2, "server at 192.168.0.1 ssn 123-45-6789"),
            (3, "nothing sensitive here"),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert "<EMAIL>" in out[1]["text_redacted"] and "example.com" not in out[1]["text_redacted"]
    assert "<PHONE>" in out[1]["text_redacted"]
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] >= 1
    assert "<IPV4>" in out[2]["text_redacted"] and "<SSN>" in out[2]["text_redacted"]
    assert out[3]["text_redacted"] == "nothing sensitive here"
    assert out[3]["n_email"] == out[3]["n_phone"] == out[3]["n_ipv4"] == out[3]["n_ssn"] == 0


def test_redact_pii_no_python_udf(spark):
    df = spark.createDataFrame([(1, "a@b.co")], "doc_id BIGINT, text STRING")
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
