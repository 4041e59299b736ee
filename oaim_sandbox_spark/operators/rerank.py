"""Two-stage retrieve-then-rerank — the operator the reference DECLARES but
never implements: model type ``re-rank`` exists in its schema
(src/common/schema.py:104) with only a help-text stub
(src/client/utils/help_text.py:46-50); no re-rank model or operator appears
anywhere in its pipeline (SURVEY.md §1.2).

Shape (the standard cross-encoder pattern):

  stage 1  cheap vector recall: exact/ANN top-``fetch_k`` by embedding
           distance — TakeOrderedAndProject, no store shuffle
           (operators/retrieval.similarity_topk);
  stage 2  expensive pairwise scoring of (query, candidate_text) with a
           cross-encoder — bounded by ``fetch_k`` regardless of store size,
           run as an Arrow-batched mapInPandas over the candidate DataFrame
           (the same executor-side HTTP pattern as the embed UDF, P9).

At 100 TB the economics are the whole point: stage 2's cost is O(fetch_k)
model calls, never O(store); stage 1 does the data-scale work and stays
JVM-side. The deterministic mock scorer (functions/portable.py
``mock_rerank_score``) keeps the full two-stage plan oracle-checkable in SQL
(`rerank_crossencoder_topk`).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, functions as F

from oaim_sandbox_spark.functions import portable as P
from oaim_sandbox_spark.operators.retrieval import similarity_topk


def mock_rerank_topk(
    store: DataFrame,
    query_vec: list[float],
    query_text: str,
    k: int = 4,
    fetch_k: int = 20,
    metric: str = "COSINE",
    id_col: str = "id",
    vec_col: str = "embedding",
    text_col: str = "text",
) -> DataFrame:
    """Two-stage rerank with the deterministic mock cross-encoder: JVM-only
    (the score is a hash expression — no Python in the plan), so it is the
    oracle-checked twin of :func:`crossencoder_rerank_topk`."""
    q_lit = P.sql_str_literal(query_text, "spark")
    score = P.mock_rerank_score(q_lit, text_col, "spark")
    cands = similarity_topk(store, query_vec, fetch_k, metric, id_col, vec_col)
    return (
        cands.withColumn("rerank_score", F.expr(f"round({score}, 6)"))
        .orderBy(F.col("rerank_score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def crossencoder_rerank_topk(
    store: DataFrame,
    query_vec: list[float],
    query_text: str,
    client_factory: Callable[[], object],
    k: int = 4,
    fetch_k: int = 20,
    metric: str = "COSINE",
    id_col: str = "id",
    vec_col: str = "embedding",
    text_col: str = "text",
    batch_size: int = 32,
) -> DataFrame:
    """Two-stage rerank with a provider cross-encoder (serving/providers.py
    ``get_rerank_client``). ``client_factory`` is called once per executor
    task (clients hold transports that shouldn't be pickled mid-request);
    each Arrow batch becomes one provider call scoring up to ``batch_size``
    (query, text) pairs."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    cands = similarity_topk(store, query_vec, fetch_k, metric, id_col, vec_col)
    schema = StructType(
        list(cands.schema.fields) + [StructField("rerank_score", DoubleType())]
    )

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        for pdf in batches:
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo : lo + batch_size].copy()
                scores = client.rerank(query_text, chunk[text_col].tolist())
                chunk["rerank_score"] = [round(s, 6) for s in scores]
                yield chunk

    scored = cands.mapInPandas(score_batches, schema=schema)
    return scored.orderBy(F.col("rerank_score").desc(), F.col(id_col).asc()).limit(k)
