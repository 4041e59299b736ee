"""SQL-macro surface (functions/macros.py): registration, equivalence with
the raw portable fragments, and plan inlining (no Python boundary)."""

import pytest
from pyspark.sql import functions as F

from oaim_sandbox_spark.functions import portable as P
from oaim_sandbox_spark.functions.macros import _MACROS, register_sql_macros


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    names = register_sql_macros(spark)
    assert set(names) == set(_MACROS)
    register_sql_macros(spark)  # idempotent


def test_macros_match_raw_fragments(spark):
    """Each macro applied to a text column equals the pasted raw fragment."""
    df = spark.createDataFrame(
        [(1, "key agg row scan slow fast"), (2, "the a and of table")],
        "id long, text string",
    )
    df.createOrReplaceTempView("macro_probe")
    got = spark.sql(
        "SELECT portable_hash60(text) AS h, minhash16(text) AS mh, "
        "simhash60(text) AS sh, ws_tokens(text) AS tk FROM macro_probe ORDER BY id"
    ).collect()
    want = spark.sql(
        f"SELECT {P.hash64('text', 'spark')} AS h, "
        f"{P.minhash_signature('text', 16, 3, 'spark')} AS mh, "
        f"{P.simhash('text', 60, 'spark')} AS sh, "
        f"{P.tokens('text', 'spark')} AS tk FROM macro_probe ORDER BY id"
    ).collect()
    assert got == want


def test_vector_macros(spark):
    row = spark.sql(
        "SELECT cosine_distance(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c, "
        "dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, "
        "euclidean_distance(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS e, "
        "l2_norm(array(3.0D, 4.0D)) AS n, "
        "hamming64(5, 6) AS hd, "
        "size(mock_embed8('x')) AS md"
    ).collect()[0]
    assert row["c"] == pytest.approx(1.0)
    assert row["d"] == pytest.approx(11.0)
    assert row["e"] == pytest.approx(5.0)
    assert row["n"] == pytest.approx(5.0)
    assert row["hd"] == 2  # 0b101 ^ 0b110 = 0b011
    assert row["md"] == 8


def test_macro_is_inlined_no_python_boundary(spark):
    """SQL UDFs inline into the plan: no BatchEvalPython / ArrowEvalPython
    node, and the expression stays codegen-eligible."""
    df = spark.createDataFrame([(1, "a b c")], "id long, text string")
    df.createOrReplaceTempView("macro_plan_probe")
    plan = (
        spark.sql("SELECT simhash60(text) FROM macro_plan_probe")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_macro_near_dup_join_end_to_end(spark):
    """The advertised use: a simhash near-dup self-join written in plain SQL."""
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),
            (3, "totally different words entirely here now"),
        ],
        "id long, text string",
    )
    df.createOrReplaceTempView("macro_docs")
    pairs = spark.sql(
        "WITH fp AS (SELECT id, simhash60(text) AS f FROM macro_docs) "
        "SELECT a.id AS ia, b.id AS ib FROM fp a JOIN fp b ON a.id < b.id "
        "AND hamming64(a.f, b.f) <= 12"
    ).collect()
    got = {(r["ia"], r["ib"]) for r in pairs}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_quality_score_macro(spark):
    """The classifier gate as plain SQL: same dyadic weights as
    classifier_quality_scores / the pipeline gate."""
    row = spark.sql(
        "SELECT quality_score('vector hash vector') AS hi, "
        "quality_score('slow big slow') AS lo, quality_score('') AS bias"
    ).collect()[0]
    assert row["hi"] > 0.9 and row["lo"] < 0.1
    import math

    assert row["bias"] == pytest.approx(1.0 / (1.0 + math.exp(0.25)))
