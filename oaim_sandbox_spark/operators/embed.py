"""Embedding operators (SURVEY.md §2.3 P8/P9) — the one genuinely
executor-side UDF in the reference's pipeline.

Two paths:

1. ``mock_embed_column`` — the deterministic test embedder as a pure JVM
   column expression (FIXTURES.md §3): same text -> same vector on Spark AND
   DuckDB, so retrieval results are oracle-checkable end to end. Replaces the
   reference's random test embedder (tests/conftest.py:304-316).

2. ``embed_with_provider`` — production shape: Arrow-batched ``mapInPandas``
   calling a provider client (OpenAI/Cohere/Ollama/HuggingFace-TEI-style —
   reference factory models.py:123-141), batches of 500 (embedding.py:320-324)
   with an optional rate limit (embedding.py:335-338). The HTTP client itself
   is injected; tests use a deterministic fake.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

from oaim_sandbox_spark.functions import portable as P
from oaim_sandbox_spark.schemas import DEFAULT_EMBED_DIM

EMBED_BATCH_SIZE = 500  # reference constant, embedding.py:320-324


def mock_embed_sql(text_col: str, dim: int, dialect: str) -> str:
    return P.mock_embed(text_col, dim, dialect)


def mock_embed_column(df: DataFrame, text_col: str = "text", dim: int = DEFAULT_EMBED_DIM, out_col: str = "embedding") -> DataFrame:
    """Deterministic embedding as a narrow JVM transformation — no Python, no
    shuffle, fully codegen'd. This is the engine's default test/CI embedder."""
    return df.withColumn(out_col, F.expr(mock_embed_sql(text_col, dim, "spark")))


class EmbeddingProvider:
    """Provider-client interface (reference models.py:123-141 factory shape).

    Implementations must be picklable (constructed per executor task).
    """

    def embed_documents(self, texts: list[str]) -> list[list[float]]:  # pragma: no cover
        raise NotImplementedError


class DeterministicProvider(EmbeddingProvider):
    """Python twin of mock_embed_sql — for testing the mapInPandas path."""

    def __init__(self, dim: int = DEFAULT_EMBED_DIM):
        self.dim = dim

    def embed_documents(self, texts: list[str]) -> list[list[float]]:
        import hashlib

        out = []
        for t in texts:
            vec = []
            for i in range(self.dim):
                h = int(hashlib.md5(f"{t}:{i}".encode()).hexdigest()[:15], 16)
                vec.append((h % 2000001) / 1000000.0 - 1.0)
            out.append(vec)
        return out


def _call_with_retry(
    fn: Callable[[], list[list[float]]],
    retries: int = 5,
    backoff: float = 1.5,
    base_sleep: float = 0.5,
    sleeper: Callable[[float], None] = time.sleep,
) -> list[list[float]]:
    """Exponential-backoff retry around one provider call (reference client
    policy: 5 POST retries, backoff factor 1.5 — api_call.py:204-220). Runs
    inside the executor task; a batch that exhausts retries fails the task,
    and Spark's own task retry takes over (different executor, fresh client)."""
    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as e:  # provider/network errors only reach here
            last = e
            if attempt == retries:
                break
            sleeper(base_sleep * (backoff**attempt))
    raise last  # type: ignore[misc]


def embed_with_provider(
    df: DataFrame,
    provider_factory: Callable[[], EmbeddingProvider],
    text_col: str = "text",
    out_col: str = "embedding",
    batch_size: int = EMBED_BATCH_SIZE,
    rate_limit_rpm: int = 0,
    retries: int = 5,
) -> DataFrame:
    """P8+P9: batched embedding via mapInPandas.

    - Arrow batch size is configured session-wide to 500 (session.py), matching
      the reference's batch size; we re-batch inside the UDF anyway so the
      provider never sees more than `batch_size` texts per call.
    - Rate limiting mirrors the reference: sleep 60/rpm between provider calls
      (embedding.py:335-338). NOTE at scale this is per-task throttling; a
      global budget needs rpm divided by the number of concurrent tasks
      (spark.sparkContext.defaultParallelism) — callers pass the per-task rate.

    100 TB note: this stage is network-bound, not CPU-bound — size executors
    by provider throughput. Combine with merge.merge_into_store so only
    never-seen chunks reach the provider.
    """
    out_fields = df.schema.fields + [StructField(out_col, ArrayType(FloatType()), True)]
    out_schema = StructType(out_fields)
    sleep_s = 60.0 / rate_limit_rpm if rate_limit_rpm else 0.0

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        provider = provider_factory()
        # pacing state spans ARROW batches: the session pins Arrow batches
        # to <= batch_size rows, so a sleep keyed only on intra-batch
        # offsets never fires and back-to-back provider calls blow the rpm
        # budget. Throttle on wall time between consecutive calls instead.
        last_call = [float("-inf")]

        def paced_call(chunk):
            if sleep_s:
                wait = sleep_s - (time.monotonic() - last_call[0])
                if wait > 0:
                    time.sleep(wait)
                last_call[0] = time.monotonic()
            return _call_with_retry(
                lambda c=chunk: provider.embed_documents(c), retries=retries
            )

        for pdf in batches:
            embeddings: list[list[float]] = []
            texts = pdf[text_col].tolist()
            for off in range(0, len(texts), batch_size):
                embeddings.extend(paced_call(texts[off : off + batch_size]))
            pdf = pdf.copy()
            pdf[out_col] = embeddings
            yield pdf

    return df.mapInPandas(run, out_schema)
