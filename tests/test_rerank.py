"""Two-stage retrieve-then-rerank (operators/rerank.py) — the model type the
reference declares but never implements (schema.py:104, help_text.py:46-50).
Covers: fetch_k bounds the stage-2 candidate set, mock-vs-provider parity of
the two-stage shape, and both rerank providers' wire shapes."""

import pytest
from pyspark.sql import functions as F

from oaim_sandbox_spark.operators.rerank import (
    crossencoder_rerank_topk,
    mock_rerank_topk,
)
from oaim_sandbox_spark.serving.providers import get_rerank_client


def _store(spark, n=50, dim=4):
    rows = [
        (i, f"document number {i} about topic {i % 7}", [float((i * j) % 5 + 1) for j in range(1, dim + 1)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id BIGINT, text STRING, embedding ARRAY<DOUBLE>")


class FakeRerankTransport:
    """Answers Cohere and TEI rerank wire shapes; scores favor high ids so
    rerank visibly reorders the cosine candidates."""

    def __init__(self):
        self.calls = []

    def post(self, url, payload, headers):
        self.calls.append((url, payload, headers))
        if "documents" in payload:  # cohere
            return {
                "results": [
                    {"index": i, "relevance_score": len(t) / 100.0}
                    for i, t in enumerate(payload["documents"])
                ]
            }
        return [  # hf-tei (bare list)
            {"index": i, "score": len(t) / 100.0}
            for i, t in enumerate(payload["texts"])
        ]


@pytest.mark.parametrize("provider", ["cohere", "hf-tei"])
def test_rerank_clients_wire_shapes(provider):
    t = FakeRerankTransport()
    client = get_rerank_client(provider, "rr1", "http://x/v1", api_key="k", transport=t)
    scores = client.rerank("q", ["ab", "cdef", "x"])
    assert scores == [0.02, 0.04, 0.01]
    url, payload, headers = t.calls[0]
    assert url.endswith("/rerank")
    assert headers.get("Authorization") == "Bearer k"
    if provider == "cohere":
        assert payload["query"] == "q" and payload["top_n"] == 3
    else:
        assert payload["texts"] == ["ab", "cdef", "x"]


def test_rerank_unknown_provider():
    with pytest.raises(ValueError, match="unknown rerank provider"):
        get_rerank_client("nope", "m", "http://x")


def test_mock_rerank_candidates_bounded_by_fetch_k(spark):
    store = _store(spark)
    qv = [1.0, 0.0, 1.0, 0.0]
    out = mock_rerank_topk(store, qv, "my query", k=3, fetch_k=10)
    rows = out.collect()
    assert len(rows) == 3
    # stage 2 may only reorder stage 1's candidates — every winner must be a
    # cosine top-fetch_k member
    cand_ids = {
        r["id"]
        for r in __import__(
            "oaim_sandbox_spark.operators.retrieval", fromlist=["similarity_topk"]
        ).similarity_topk(store, qv, 10, "COSINE", "id", "embedding").collect()
    }
    assert {r["id"] for r in rows} <= cand_ids
    # output is ordered by the rerank score, descending
    scores = [r["rerank_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_crossencoder_rerank_matches_driver_computation(spark):
    store = _store(spark)
    qv = [1.0, 0.0, 1.0, 0.0]

    # defined inside the test so cloudpickle ships it to executors by value
    class ExecutorFakeTransport:
        def post(self, url, payload, headers):
            return {
                "results": [
                    {"index": i, "relevance_score": len(t) / 100.0}
                    for i, t in enumerate(payload["documents"])
                ]
            }

    def factory():
        return get_rerank_client(
            "cohere", "rr1", "http://x/v1", transport=ExecutorFakeTransport()
        )

    out = crossencoder_rerank_topk(
        store, qv, "my query", factory, k=4, fetch_k=12
    ).collect()
    assert len(out) == 4
    # the fake scores by text length desc; recompute expected winners on the
    # driver from the same candidate set
    from oaim_sandbox_spark.operators.retrieval import similarity_topk

    cands = similarity_topk(store, qv, 12, "COSINE", "id", "embedding").collect()
    expected = sorted(cands, key=lambda r: (-len(r["text"]), r["id"]))[:4]
    assert [r["id"] for r in out] == [r["id"] for r in expected]
    for r in out:
        assert r["rerank_score"] == round(len(r["text"]) / 100.0, 6)


def test_mock_rerank_is_pure_jvm_plan(spark):
    """The mock path must stay inside codegen — no Python eval nodes."""
    store = _store(spark)
    plan = mock_rerank_topk(store, [1.0, 0.0, 0.0, 0.0], "q")._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
