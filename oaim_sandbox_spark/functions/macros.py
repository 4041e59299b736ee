"""The engine's portable primitives as plain Spark SQL functions.

`register_sql_macros(spark)` exposes the dedup/retrieval fragments from
functions/portable.py as TEMPORARY SQL FUNCTIONS (Spark 4 `CREATE FUNCTION
... RETURNS ... RETURN <expr>` — SQL UDFs, not Python UDFs), so a user can
write

    SELECT doc_id FROM docs a JOIN docs b
    ON hamming64(simhash60(a.text), simhash60(b.text)) <= 3

in `spark.sql(...)` without importing anything. SQL UDFs are inlined by
Catalyst at analysis time: every macro below stays inside whole-stage
codegen, identical to pasting the raw expression — there is no
serialization boundary and no Python in the hot path.

All functions are the exact fragments the oracle-checked registry uses, so
macro output is engine-portable (bit-identical to the DuckDB oracle forms
in functions/portable.py).

Performance caveat: SQL UDFs substitute TEXTUALLY and Spark performs no
cross-expression CSE, so `minhash16(text)` evaluates the md5-shingle
pipeline once per permutation (16x) — fine for exploration, wrong for a hot
path. Bulk jobs should use the hoisted operators
(`operators.dedup.minhash_signatures` / `simhash_fingerprints`), which
materialize the hash array once; see the measured 16x pathology note in
PLANS.md ("expression inlining")."""

from __future__ import annotations

from pyspark.sql import SparkSession

from oaim_sandbox_spark.functions import portable as P

# name -> (typed parameter list, return type, spark-dialect expression body)
_MACROS: dict[str, tuple[str, str, str]] = {
    "portable_hash60": ("s STRING", "BIGINT", P.hash64("s", "spark")),
    "portable_hash_mod": ("s STRING", "BIGINT", P.hash_mod("s", "spark")),
    "ws_tokens": ("s STRING", "ARRAY<STRING>", P.tokens("s", "spark")),
    "word_ngrams3": ("s STRING", "ARRAY<STRING>", P.word_ngrams("s", 3, "spark")),
    "word_ngrams5": ("s STRING", "ARRAY<STRING>", P.word_ngrams("s", 5, "spark")),
    "shingle_hashes3": ("s STRING", "ARRAY<BIGINT>", P.shingle_hashes("s", 3, "spark")),
    "minhash16": ("s STRING", "ARRAY<BIGINT>", P.minhash_signature("s", 16, 3, "spark")),
    "simhash60": ("s STRING", "BIGINT", P.simhash("s", 60, "spark")),
    "hamming64": ("a BIGINT, b BIGINT", "BIGINT", P.hamming64("a", "b", "spark")),
    "cosine_distance": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "DOUBLE",
        P.cosine_distance("a", "b", "spark"),
    ),
    "dot_product": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "DOUBLE",
        P.dot("a", "b", "spark"),
    ),
    "euclidean_distance": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "DOUBLE",
        P.euclidean_distance("a", "b", "spark"),
    ),
    "l2_norm": ("a ARRAY<DOUBLE>", "DOUBLE", P.norm2("a", "spark")),
    "mock_embed8": ("s STRING", "ARRAY<DOUBLE>", P.mock_embed("s", 8, "spark")),
    "normalize_text": ("s STRING", "STRING", P.normalize_text("s", "spark")),
}


def _quality_score_body() -> str:
    from oaim_sandbox_spark.operators.classifier import linear_quality_score_sql

    return linear_quality_score_sql("s")


_MACROS["quality_score"] = ("s STRING", "DOUBLE", _quality_score_body())


def register_sql_macros(spark: SparkSession) -> list[str]:
    """Register every macro as a TEMPORARY SQL FUNCTION; returns the names.
    Idempotent (CREATE OR REPLACE); session-scoped, so call it once per
    SparkSession (e.g. right after get_spark())."""
    for name, (params, ret, body) in _MACROS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
            f"RETURNS {ret} RETURN {body}"
        )
    return list(_MACROS)
