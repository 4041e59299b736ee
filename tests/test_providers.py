"""Provider-client factory parity (reference models.py:59-156): each client
speaks its provider's wire shape, the factory dispatches by string, and the
OpenAI embed client runs end-to-end through the Arrow-batched executor UDF
with an injected (picklable) fake transport — no network anywhere."""

import pytest

from oaim_sandbox_spark.serving.providers import (
    get_chat_client,
    get_embed_client,
)


class RecordingTransport:
    """Picklable fake transport: records requests, answers by URL suffix."""

    def __init__(self, dim: int = 4):
        self.dim = dim
        self.calls: list[tuple] = []

    def _vec(self, text: str):
        return [float(len(text)), 1.0, 2.0, 3.0][: self.dim]

    def post(self, url, payload, headers):
        self.calls.append((url, payload, headers))
        if url.endswith("/embeddings"):  # openai: order deliberately shuffled
            data = [
                {"index": i, "embedding": self._vec(t)}
                for i, t in enumerate(payload["input"])
            ]
            return {"data": list(reversed(data))}
        if url.endswith("/embed") and "texts" in payload:  # cohere
            return {"embeddings": [self._vec(t) for t in payload["texts"]]}
        if url.endswith("/api/embed"):  # ollama
            return {"embeddings": [self._vec(t) for t in payload["input"]]}
        if url.endswith("/embed"):  # hf-tei
            return [self._vec(t) for t in payload["inputs"]]
        if url.endswith("/chat/completions"):
            return {
                "choices": [{"message": {"content": f"echo:{payload['messages'][-1]['content']}"}}],
                "usage": {"total_tokens": 7},
            }
        raise AssertionError(f"unexpected url {url}")


@pytest.mark.parametrize("provider", ["openai", "openai-compat", "perplexity", "cohere", "ollama", "hf-tei"])
def test_embed_clients_wire_shapes(provider):
    t = RecordingTransport()
    client = get_embed_client(provider, "m1", "http://x/v1", api_key="k", transport=t)
    out = client.embed_documents(["ab", "cdef"])
    assert out == [[2.0, 1.0, 2.0, 3.0], [4.0, 1.0, 2.0, 3.0]]  # input order preserved
    url, payload, headers = t.calls[0]
    assert headers["Authorization"] == "Bearer k"
    if provider in ("openai", "openai-compat", "perplexity"):
        assert payload == {"model": "m1", "input": ["ab", "cdef"]}
    elif provider == "cohere":
        assert payload["input_type"] == "search_document"


def test_factory_rejects_unknown():
    with pytest.raises(ValueError, match="unknown embed provider"):
        get_embed_client("nope", "m", "http://x")
    with pytest.raises(ValueError, match="unknown chat provider"):
        get_chat_client("cohere-chat", "m", "http://x")


def test_oci_client_gated():
    client = get_embed_client("oci-genai", "m", "http://x")
    with pytest.raises(NotImplementedError, match="oci"):
        client.embed_documents(["a"])


def test_chat_client_callable():
    t = RecordingTransport()
    llm = get_chat_client("openai", "m1", "http://x/v1", transport=t)
    assert llm([{"role": "user", "content": "hi"}]) == "echo:hi"
    assert llm.complete([{"role": "user", "content": "hi"}])["usage"]["total_tokens"] == 7


def test_openai_embed_through_executor_udf(spark):
    """The provider client must survive pickling into mapInPandas tasks and
    produce one vector per row through the batched embed UDF."""
    from oaim_sandbox_spark.operators.embed import embed_with_provider

    # defined in-function so cloudpickle ships it by VALUE (the tests module
    # isn't importable on executor workers)
    class ExecutorFakeTransport:
        def post(self, url, payload, headers):
            assert url.endswith("/embeddings")
            return {
                "data": [
                    {"index": i, "embedding": [float(len(t)), 0.0]}
                    for i, t in enumerate(payload["input"])
                ]
            }

    df = spark.createDataFrame(
        [(i, "t" * (i + 1)) for i in range(20)], "id INT, text STRING"
    )
    out = embed_with_provider(
        df,
        provider_factory=lambda: get_embed_client(
            "openai", "m1", "http://fake/v1", transport=ExecutorFakeTransport()
        ),
        text_col="text",
        batch_size=8,
    ).collect()
    assert len(out) == 20
    by_id = {r.id: r.embedding for r in out}
    assert by_id[4][0] == 5.0  # len("ttttt") -> first vector component
