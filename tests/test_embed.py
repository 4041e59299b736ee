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


def test_retry_backoff_recovers_and_gives_up():
    from oaim_sandbox_spark.operators.embed import _call_with_retry

    sleeps = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")
        return [[1.0]]

    assert _call_with_retry(flaky, retries=5, sleeper=sleeps.append) == [[1.0]]
    assert calls["n"] == 3
    assert sleeps == [0.5, 0.75]  # exponential: 0.5 * 1.5^k (reference backoff 1.5)

    import pytest

    with pytest.raises(ConnectionError):
        _call_with_retry(lambda: (_ for _ in ()).throw(ConnectionError("down")), retries=2, sleeper=sleeps.append)


def test_embed_with_provider_retries_transient_failures(spark):
    from oaim_sandbox_spark.operators.embed import embed_with_provider

    class FlakyProvider:
        def __init__(self):
            self.fails = 1

        def embed_documents(self, texts):
            if self.fails:
                self.fails -= 1
                raise ConnectionError("transient")
            return [[float(len(t))] for t in texts]

    df = spark.createDataFrame([("ab",), ("abcd",)], "text STRING").repartition(1)
    out = embed_with_provider(df, FlakyProvider, batch_size=10)
    got = {r["text"]: r["embedding"] for r in out.collect()}
    assert got["ab"] == [2.0] and got["abcd"] == [4.0]
