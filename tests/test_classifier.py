"""In-engine linear text classifier (operators/classifier.py): training
converges on a planted separable signal, prediction is accurate and
deterministic, and driver traffic stays model-bounded by construction."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from oaim_sandbox_spark.operators.classifier import (
    LinearTextModel,
    fit_logistic,
    hashed_token_features,
    predict_scores,
)

POS_VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon"]
NEG_VOCAB = ["zork", "grue", "mumble", "frotz", "plugh"]
SHARED = ["the", "a", "and", "of"]


def _planted_corpus(spark, n=200):
    """Half the docs draw from POS_VOCAB, half from NEG_VOCAB, all mixed with
    shared filler — linearly separable by construction, deterministic."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng(i)
        vocab = POS_VOCAB if i % 2 == 0 else NEG_VOCAB
        words = list(rng.choice(vocab, 6)) + list(rng.choice(SHARED, 6))
        rng.shuffle(words)
        rows.append((i, " ".join(words), i % 2))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


@pytest.fixture(scope="module")
def corpus(spark):
    return _planted_corpus(spark).persist()


def test_hashed_features_shape(spark, corpus):
    feat = hashed_token_features(corpus, dim=256)
    assert feat.columns == ["id", "idx", "cnt"]
    agg = feat.agg(
        F.min("idx").alias("lo"), F.max("idx").alias("hi"), F.sum("cnt").alias("n")
    ).collect()[0]
    assert 0 <= agg["lo"] and agg["hi"] < 256
    # every token of every doc lands exactly once
    assert agg["n"] == 200 * 12


def test_training_converges_and_separates(spark, corpus):
    feat = hashed_token_features(corpus, dim=256)
    labels = corpus.select(F.col("doc_id").alias("id"), "y")
    model = fit_logistic(spark, feat, labels, dim=256, iters=25, lr=1.0)
    assert model.loss_history[-1] < model.loss_history[0] / 3
    scored = predict_scores(spark, feat, model)
    acc = (
        scored.join(labels, "id")
        .select(((F.col("score") >= 0.5).cast("int") == F.col("y")).cast("int").alias("ok"))
        .agg(F.avg("ok"))
        .collect()[0][0]
    )
    assert acc >= 0.95


def test_training_is_deterministic(spark, corpus):
    feat = hashed_token_features(corpus, dim=128)
    labels = corpus.select(F.col("doc_id").alias("id"), "y")
    m1 = fit_logistic(spark, feat, labels, dim=128, iters=5, lr=0.5)
    m2 = fit_logistic(spark, feat, labels, dim=128, iters=5, lr=0.5)
    np.testing.assert_allclose(m1.weights, m2.weights, rtol=0, atol=1e-12)
    assert m1.bias == m2.bias


def test_oov_docs_score_bias(spark):
    model = LinearTextModel(
        weights=np.zeros(64), bias=-1.0, dim=64, loss_history=[]
    )
    df = spark.createDataFrame([(1, "anything here")], "doc_id long, text string")
    feat = hashed_token_features(df, dim=64)
    score = predict_scores(spark, feat, model).collect()[0]["score"]
    assert score == pytest.approx(1.0 / (1.0 + np.exp(1.0)))


def test_expression_form_matches_join_form(spark):
    """linear_quality_score_sql (join-free CASE-map expression) must score
    exactly like the broadcast-join form in queries.classifier_quality_scores
    — same weights by construction (shared constants)."""
    from pyspark.sql import functions as F

    from oaim_sandbox_spark import queries as Q
    from oaim_sandbox_spark.operators.classifier import linear_quality_score_sql

    sf = "/root/testdata/sf0.001"
    join_form = Q.spark_queries()["classifier_quality_scores"](spark, sf)
    docs = spark.table("documents")
    expr_form = docs.select(
        "doc_id",
        F.round(F.expr(linear_quality_score_sql("text")), 6).cast("double").alias("score"),
    )
    joined = join_form.alias("a").join(expr_form.alias("b"), "doc_id")
    n_diff = joined.filter(F.col("a.score") != F.col("b.score")).count()
    assert n_diff == 0
