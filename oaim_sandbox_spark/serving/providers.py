"""Model-provider clients — the reference's string-keyed client factory
(src/server/utils/models.py:59-156) rebuilt without LangChain.

Each provider speaks its own HTTP request/response shape; the shapes below
follow the providers' public embedding/chat APIs:

  - ``openai`` / ``openai-compat`` / ``perplexity``: POST {model, input:[...]}
    -> {data: [{index, embedding}]} (order restored by index);
    chat: POST {model, messages} -> {choices:[{message:{content}}], usage}.
  - ``cohere``: POST {model, texts, input_type} -> {embeddings: [...]}.
  - ``ollama``: POST {model, input:[...]} -> {embeddings: [...]} (api/embed).
  - ``hf-tei``: POST {inputs: [...]} -> [[...], ...] (bare list body).
  - ``oci-genai``: stubbed behind an import-try like every OCI edge in this
    repo (the SDK isn't in the container); raises with a clear message.

The HTTP edge is injected (``transport``) so every client is testable
without network and picklable into executor tasks — the embed clients plug
straight into ``operators.embed.embed_with_provider`` (Arrow-batched
mapInPandas with retry + rate limit). Keyed factory functions
(``get_embed_client`` / ``get_chat_client``) mirror the reference's
``get_client`` dispatch-by-provider-string design.
"""

from __future__ import annotations

import json as _json
import urllib.request
from dataclasses import dataclass, field


class UrllibTransport:
    """Default transport: stdlib-only JSON POST (requests isn't a dependency).

    Any object with ``post(url, payload, headers) -> dict | list`` works in
    its place; tests inject fakes that record requests and return canned
    responses.
    """

    def __init__(self, timeout: float = 120.0):
        self.timeout = timeout

    def post(self, url: str, payload: dict, headers: dict[str, str]) -> dict | list:
        req = urllib.request.Request(
            url,
            data=_json.dumps(payload).encode(),
            headers={"Content-Type": "application/json", **headers},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:  # noqa: S310
            return _json.loads(resp.read().decode())


@dataclass
class _BaseClient:
    model: str
    api_base: str
    api_key: str | None = None
    transport: object = field(default_factory=UrllibTransport)

    def _headers(self) -> dict[str, str]:
        return {"Authorization": f"Bearer {self.api_key}"} if self.api_key else {}


class OpenAIEmbedClient(_BaseClient):
    """OpenAI-compatible /v1/embeddings (also Perplexity & any compat server —
    the reference treats these as one client family, models.py:95-141)."""

    def embed_documents(self, texts: list[str]) -> list[list[float]]:
        resp = self.transport.post(
            f"{self.api_base.rstrip('/')}/embeddings",
            {"model": self.model, "input": list(texts)},
            self._headers(),
        )
        data = sorted(resp["data"], key=lambda d: d["index"])
        return [d["embedding"] for d in data]


class CohereEmbedClient(_BaseClient):
    def embed_documents(self, texts: list[str]) -> list[list[float]]:
        resp = self.transport.post(
            f"{self.api_base.rstrip('/')}/embed",
            {"model": self.model, "texts": list(texts), "input_type": "search_document"},
            self._headers(),
        )
        return [list(v) for v in resp["embeddings"]]


class OllamaEmbedClient(_BaseClient):
    def embed_documents(self, texts: list[str]) -> list[list[float]]:
        resp = self.transport.post(
            f"{self.api_base.rstrip('/')}/api/embed",
            {"model": self.model, "input": list(texts)},
            self._headers(),
        )
        return [list(v) for v in resp["embeddings"]]


class TEIEmbedClient(_BaseClient):
    """HuggingFace Text-Embeddings-Inference: bare {"inputs": [...]} in, bare
    list of vectors out."""

    def embed_documents(self, texts: list[str]) -> list[list[float]]:
        resp = self.transport.post(
            f"{self.api_base.rstrip('/')}/embed", {"inputs": list(texts)}, self._headers()
        )
        return [list(v) for v in resp]


class OCIGenAIEmbedClient(_BaseClient):
    """Gated like every OCI edge (S8): the SDK isn't in this container."""

    def embed_documents(self, texts: list[str]) -> list[list[float]]:
        try:
            import oci  # noqa: F401
        except ImportError as e:  # pragma: no cover - exercised via message test
            raise NotImplementedError(
                "oci-genai embedding requires the 'oci' SDK (not installed); "
                "use provider 'openai-compat' against an OCI GenAI-compatible "
                "endpoint instead"
            ) from e
        raise NotImplementedError("oci-genai client not wired in this environment")


_EMBED_PROVIDERS = {
    "openai": OpenAIEmbedClient,
    "openai-compat": OpenAIEmbedClient,
    "perplexity": OpenAIEmbedClient,
    "cohere": CohereEmbedClient,
    "ollama": OllamaEmbedClient,
    "hf-tei": TEIEmbedClient,
    "oci-genai": OCIGenAIEmbedClient,
}


def get_embed_client(
    provider: str,
    model: str,
    api_base: str,
    api_key: str | None = None,
    transport: object | None = None,
):
    """String-keyed embed-client factory (reference models.py:123-141)."""
    try:
        cls = _EMBED_PROVIDERS[provider]
    except KeyError:
        raise ValueError(
            f"unknown embed provider {provider!r}; one of {sorted(_EMBED_PROVIDERS)}"
        ) from None
    kw = {} if transport is None else {"transport": transport}
    return cls(model=model, api_base=api_base, api_key=api_key, **kw)


class OpenAIChatClient(_BaseClient):
    """OpenAI-compatible /v1/chat/completions — the chat family the serving
    layer consumes as a plain callable (serving/chat.py takes any
    ``llm(messages) -> str``)."""

    def complete(self, messages: list[dict], **params) -> dict:
        resp = self.transport.post(
            f"{self.api_base.rstrip('/')}/chat/completions",
            {"model": self.model, "messages": messages, **params},
            self._headers(),
        )
        return resp

    def __call__(self, messages: list[dict], **params) -> str:
        return self.complete(messages, **params)["choices"][0]["message"]["content"]


@dataclass
class CohereRerankClient(_BaseClient):
    """Cohere /v1/rerank: POST {model, query, documents, top_n} ->
    {results: [{index, relevance_score}]} (order restored by index).
    The reference declares a ``re-rank`` model type but implements no
    client for it (schema.py:104, help_text.py:46-50) — this fills it."""

    def rerank(self, query: str, texts: list[str]) -> list[float]:
        resp = self.transport.post(
            f"{self.api_base.rstrip('/')}/rerank",
            {
                "model": self.model,
                "query": query,
                "documents": list(texts),
                "top_n": len(texts),
            },
            self._headers(),
        )
        scores = [0.0] * len(texts)
        for r in resp["results"]:
            scores[r["index"]] = float(r["relevance_score"])
        return scores


@dataclass
class TEIRerankClient(_BaseClient):
    """HuggingFace TEI /rerank: POST {query, texts} -> [{index, score}]."""

    def rerank(self, query: str, texts: list[str]) -> list[float]:
        resp = self.transport.post(
            f"{self.api_base.rstrip('/')}/rerank",
            {"query": query, "texts": list(texts)},
            self._headers(),
        )
        scores = [0.0] * len(texts)
        for r in resp:
            scores[r["index"]] = float(r["score"])
        return scores


_RERANK_PROVIDERS = {
    "cohere": CohereRerankClient,
    "hf-tei": TEIRerankClient,
}


def get_rerank_client(
    provider: str,
    model: str,
    api_base: str,
    api_key: str | None = None,
    transport: object | None = None,
):
    """String-keyed rerank-client factory — same dispatch design as
    get_embed_client/get_chat_client; covers the model type the reference
    declares but never wires up."""
    try:
        cls = _RERANK_PROVIDERS[provider]
    except KeyError:
        raise ValueError(
            f"unknown rerank provider {provider!r}; one of {sorted(_RERANK_PROVIDERS)}"
        ) from None
    kw = {} if transport is None else {"transport": transport}
    return cls(model=model, api_base=api_base, api_key=api_key, **kw)


_CHAT_PROVIDERS = {
    "openai": OpenAIChatClient,
    "openai-compat": OpenAIChatClient,
    "perplexity": OpenAIChatClient,
}


def get_chat_client(
    provider: str,
    model: str,
    api_base: str,
    api_key: str | None = None,
    transport: object | None = None,
):
    """String-keyed chat-client factory (reference models.py:95-122)."""
    try:
        cls = _CHAT_PROVIDERS[provider]
    except KeyError:
        raise ValueError(
            f"unknown chat provider {provider!r}; one of {sorted(_CHAT_PROVIDERS)}"
        ) from None
    kw = {} if transport is None else {"transport": transport}
    return cls(model=model, api_base=api_base, api_key=api_key, **kw)
