"""Explicit StructTypes for every persisted table (SURVEY.md §1.2).

The reference declares all schemas explicitly (Pydantic + Oracle DDL); we do the
same with StructTypes — never inference. Vector-store schema mirrors LangChain
OracleVS (reference: src/server/utils/embedding.py:312-318): ID (content hash),
TEXT, METADATA, EMBEDDING.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DecimalType,
    FloatType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Embedding dim of the deterministic mock embedder; reference tests use 384
# (tests/conftest.py:315) but driver testdata embeddings are 64-dim.
DEFAULT_EMBED_DIM = 64

# Post-split chunk rows (reference: embedding.py:78-89 process_metadata).
CHUNK_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),          # f"{stem}_{idx}", idx 1-based
        StructField("text", StringType(), False),
        StructField("source", StringType(), True),
        StructField("filename", StringType(), True),
        StructField("start_index", IntegerType(), True),  # from add_start_index=True
    ]
)

# Vector-store table (reference: OracleVS schema, embedding.py:312-318).
VECTOR_STORE_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),          # sha2(text,256) content-addressed
        StructField("text", StringType(), False),
        StructField("metadata", MapType(StringType(), StringType()), True),
        StructField("embedding", ArrayType(FloatType()), False),
    ]
)

# Test-set tables (reference: testbed.py:60-98).
TESTSET_SCHEMA = StructType(
    [
        StructField("tid", StringType(), False),
        StructField("name", StringType(), False),
        StructField("created", TimestampType(), False),
    ]
)

TESTSET_QA_SCHEMA = StructType(
    [
        StructField("tid", StringType(), False),
        StructField("question", StringType(), False),
        StructField("reference_answer", StringType(), True),
        StructField("reference_context", StringType(), True),
        StructField("conversation_history", ArrayType(StringType()), True),
        StructField("metadata", MapType(StringType(), StringType()), True),
    ]
)

EVALUATION_SCHEMA = StructType(
    [
        StructField("eid", StringType(), False),
        StructField("tid", StringType(), False),
        StructField("evaluated", TimestampType(), False),
        StructField("question", StringType(), False),
        StructField("agent_answer", StringType(), True),
        StructField("correct", BooleanType(), True),
        StructField("topic", StringType(), True),
        StructField("correctness", DecimalType(5, 4), True),  # Oracle NUMBER parity
    ]
)

# Raw document rows (driver testdata documents.parquet shape).
DOCUMENT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
    ]
)
