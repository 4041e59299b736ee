"""Idempotent merge (K2): content-addressed ids + anti-join, and the
anti-join-before-embed improvement (SURVEY §4)."""

from oaim_sandbox_spark.operators.embed import mock_embed_column
from oaim_sandbox_spark.operators.merge import merge_into_store, merge_new_rows, with_content_id


def test_content_id_is_sha256(spark):
    import hashlib

    df = spark.createDataFrame([("hello",)], "text STRING")
    row = with_content_id(df).collect()[0]
    assert row.id == hashlib.sha256(b"hello").hexdigest()


def test_merge_new_rows_anti_join(spark):
    new = spark.createDataFrame([("a", 1), ("b", 2)], "id STRING, v INT")
    existing = spark.createDataFrame([("a",)], "id STRING")
    out = merge_new_rows(new, existing).collect()
    assert [r.id for r in out] == ["b"]


def test_merge_into_store_embeds_only_fresh(spark):
    calls = []

    def embed_fn(df):
        out = mock_embed_column(df)
        calls.append(out)
        return out

    chunks = spark.createDataFrame([("t1",), ("t2",), ("t1",)], "text STRING")
    store_rows = with_content_id(spark.createDataFrame([("t1",)], "text STRING")).select("id")
    out = merge_into_store(chunks, store_rows, embed_fn).collect()
    # t1 already in store; the two t1 dup rows drop, only t2 is embedded
    assert [r.text for r in out] == ["t2"]
    assert len(out[0].embedding) == 64


def test_merge_idempotent(spark):
    chunks = spark.createDataFrame([("x",), ("y",)], "text STRING")
    addressed = with_content_id(chunks)
    once = merge_new_rows(addressed, addressed.select("id"))
    assert once.count() == 0
