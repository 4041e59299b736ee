"""Idempotent vector-store merge (SURVEY.md §2.2 K2) — content-addressed ids +
anti-join insert, the Spark form of the reference's
``INSERT ... WHERE NOT EXISTS (SELECT 1 FROM vs WHERE vs.ID = src.ID)``
(embedding.py:352-359).

Improvement over the reference (noted in SURVEY §4): the reference re-embeds
everything and dedups only at storage time; we anti-join BEFORE the embed UDF
so already-ingested chunks skip the expensive embedding call entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_content_id(df: DataFrame, text_col: str = "text", id_col: str = "id") -> DataFrame:
    """Content-addressed chunk id = sha2(text, 256) — same id for same text,
    which is what makes the merge idempotent (reference: OracleVS hashes the
    content for ID RAW(16); we keep the full sha256 hex)."""
    # coalesce NULL text to '' before hashing: sha2(NULL) is NULL, and a
    # NULL join key NEVER matches in the left-anti merge — NULL-text rows
    # would be re-embedded and re-appended on every ingest forever
    return df.withColumn(id_col, F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256))


def merge_new_rows(
    new: DataFrame, existing: DataFrame, id_col: str = "id", broadcast_existing: bool | None = None
) -> DataFrame:
    """K2: rows of `new` whose id is absent from `existing` (left-anti join).

    100 TB note: the anti-join shuffles only id columns if you project first —
    so we join against existing.select(id). If the existing-id side is small
    (incremental load into a fresh store) broadcast it; at steady state both
    sides are large and AQE picks a shuffled hash join with skew handling.
    """
    ids = existing.select(id_col)
    if broadcast_existing:
        ids = F.broadcast(ids)
    return new.join(ids, id_col, "left_anti")


def merge_into_store(
    new_chunks: DataFrame,
    store: DataFrame,
    embed_fn,
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """Full ingest-merge: content-id -> anti-join against the store ->
    embed only the genuinely new rows -> rows ready to append.

    `embed_fn: DataFrame -> DataFrame` adds the embedding column (see
    operators.embed). Ordering anti-join *before* embed_fn is the
    skip-recompute optimization.
    """
    addressed = with_content_id(new_chunks, text_col, id_col)
    fresh = merge_new_rows(addressed, store, id_col)
    return embed_fn(fresh)
