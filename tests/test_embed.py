"""Embedding operators (P8/P9): the JVM mock embedder, its Python twin, and
the batched provider mapInPandas path with the reference's 500-chunk batching
(embedding.py:320-324)."""

from oaim_sandbox_spark.operators.embed import (
    DeterministicProvider,
    EmbeddingProvider,
    embed_with_provider,
    mock_embed_column,
)


def test_mock_embed_deterministic(spark):
    df = spark.createDataFrame([("same text",), ("same text",)], "text STRING")
    vecs = [r.embedding for r in mock_embed_column(df, dim=16).collect()]
    assert vecs[0] == vecs[1]
    assert len(vecs[0]) == 16
    assert all(-1.0 <= x <= 1.0 for x in vecs[0])


def test_sql_and_python_embedders_agree(spark):
    df = spark.createDataFrame([("abc",)], "text STRING")
    sql_vec = mock_embed_column(df, dim=8).collect()[0].embedding
    py_vec = DeterministicProvider(dim=8).embed_documents(["abc"])[0]
    assert all(abs(a - b) < 1e-6 for a, b in zip(sql_vec, py_vec))


def test_embed_with_provider(spark):
    """mapInPandas provider path (P8/P9): results must equal the JVM mock
    embedder since DeterministicProvider is its Python twin. (Provider classes
    must live in an importable module — executor-side pickling.)"""
    df = spark.createDataFrame([(f"text {i}",) for i in range(50)], "text STRING")
    out = embed_with_provider(df, lambda: DeterministicProvider(dim=8), batch_size=10).collect()
    assert len(out) == 50
    jvm = {r.text: r.embedding for r in mock_embed_column(df, dim=8).collect()}
    for r in out:
        assert all(abs(a - b) < 1e-6 for a, b in zip(r.embedding, jvm[r.text]))


def test_provider_interface_raises():
    import pytest

    with pytest.raises(NotImplementedError):
        EmbeddingProvider().embed_documents(["x"])
