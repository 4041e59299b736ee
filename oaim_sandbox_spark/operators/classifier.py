"""In-engine linear text classifier — the fastText-style quality gate.

Production LLM corpora are filtered by cheap linear classifiers over bag-of-
words features (CCNet's fastText language/quality gates; LLaMA's "looks like
a reference page" filter). This module trains and applies that classifier
WITHOUT leaving the engine: features are hashed token counts built with
DataFrame ops, training is batch gradient descent where each iteration is one
broadcast join + two grouped aggregations, and the only driver state is the
weight vector (dim floats — model-bounded, never corpus-bounded).

Scale design (100 TB corpus, dim ~2^18 in practice):
  - features: token explode -> xxhash64 % dim -> (id, idx, cnt) long format.
    Grouped count combines map-side; the text column is dropped immediately.
  - per iteration: weights (dim rows) broadcast-join features; per-doc margin
    is a grouped sum keyed by the id the features are already clustered on;
    the gradient is a dim-bounded grouped sum collected to the driver.
  - at real scale you train on a hash-sampled subset (`sample_frac`) and
    apply to everything — scoring is a single broadcast join + grouped agg.

Reference parity: the reference has no classifier training at all; its
quality control is human/thresholded (SURVEY §2 P10 model filters). This is a
beyond-reference training-data-pipeline capability; the oracle-checked
serving twin is `classifier_quality_scores` in queries.py (fixed literal
weights, same sigmoid-of-token-weights semantics).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F


# Serving-side default weights (dyadic — multiples of 1/16 — so the weight
# sum is exactly representable and bit-identical across engines regardless
# of float-addition order; see queries.classifier_quality_scores, which
# imports these same constants for its oracle-checked twin).
DEFAULT_WEIGHTS: tuple[tuple[str, float], ...] = (
    ("vector", 1.25), ("hash", 0.75), ("stream", 0.5), ("spark", 0.375),
    ("query", 0.25), ("slow", -1.0), ("big", -0.75), ("customer", -0.375),
)
DEFAULT_BIAS = -0.25


def linear_quality_score_sql(
    text_col: str = "text",
    weights: tuple[tuple[str, float], ...] = DEFAULT_WEIGHTS,
    bias: float = DEFAULT_BIAS,
    dialect: str = "spark",
) -> str:
    """sigmoid(bias + Σ w(tok)·count(tok)) as a single JVM-side expression —
    the join-free form of the classifier gate for pipeline filters (the
    weight CASE map lives inside the expression; right for model-sized
    vocabularies. classifier_quality_scores' broadcast-join form is the
    shape for large vocabularies)."""
    from oaim_sandbox_spark.functions import portable as P

    cases = " ".join(
        f"WHEN {P.sql_str_literal(str(t), dialect)} THEN CAST({float(w)!r} AS DOUBLE)"
        for t, w in weights
    )
    per_tok = f"CASE t {cases} ELSE CAST(0 AS DOUBLE) END"
    toks = P.tokens(text_col, dialect)
    if dialect == "spark":
        z = f"aggregate(transform({toks}, t -> {per_tok}), cast({bias} as double), (s, x) -> s + x)"
    else:
        z = f"list_reduce(list_prepend(CAST({bias} AS DOUBLE), list_transform({toks}, t -> {per_tok})), (s, x) -> s + x)"
    return f"(1.0 / (1.0 + exp(-({z}))))"


@dataclass
class LinearTextModel:
    """Trained hashed-bag-of-words logistic model."""

    weights: np.ndarray  # (dim,)
    bias: float
    dim: int
    loss_history: list[float]


def hashed_token_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    normalize: bool = False,
) -> DataFrame:
    """(id, idx, cnt): hashed bag-of-words in long format.

    xxhash64 is JVM-side and partition-parallel; `pmod` keeps the index
    non-negative. The output is grouped (map-side combine) so a doc
    contributes at most min(n_tokens, dim) rows, and the raw text never
    travels past this projection.

    normalize=True emits term frequencies (cnt / doc token count) instead of
    raw counts — bounds the margin magnitude independent of document length,
    which keeps gradient descent stable at one learning rate across corpora
    (raw counts diverge on long/duplicated docs at lr that converges on
    short ones)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    feat = (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok"))
        .select("id", F.pmod(F.xxhash64("tok"), F.lit(dim)).cast("int").alias("idx"))
        .groupBy("id", "idx")
        .agg(F.count("*").cast("double").alias("cnt"))
    )
    if normalize:
        totals = feat.groupBy("id").agg(F.sum("cnt").alias("__tot"))
        feat = feat.join(totals, "id").select(
            "id", "idx", (F.col("cnt") / F.col("__tot")).alias("cnt")
        )
    return feat


def _margins(feat: DataFrame, weights_df: DataFrame, bias: float) -> DataFrame:
    """(id, margin): w·x + b via broadcast join + grouped sum."""
    return (
        feat.join(F.broadcast(weights_df), "idx")
        .groupBy("id")
        .agg((F.sum(F.col("cnt") * F.col("w")) + F.lit(bias)).alias("margin"))
    )


def fit_logistic(
    spark: SparkSession,
    feat: DataFrame,
    labels: DataFrame,
    dim: int = 1024,
    iters: int = 30,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> LinearTextModel:
    """Batch gradient descent for L2-regularized logistic regression.

    `feat` is hashed_token_features output; `labels` is (id, y) with y in
    {0,1}. Each iteration runs entirely in the engine: sigmoid(margin) - y
    per doc, then the gradient grouped by feature index — the collect is dim
    rows, so driver traffic is model-sized regardless of corpus size. The
    iteration count is the scan count; persist the feature relation.

    r13 opt (guide §2.4 "two operations keyed the same way share one
    exchange"): both invariant relations are hash-partitioned by doc id
    BEFORE the persist, so every iteration's margins groupBy(id), the
    labels⋈margins join and the feat⋈err gradient join all reuse the cached
    HashPartitioning instead of re-shuffling the corpus-sized feature
    relation twice per iteration — per iteration only the dim-bounded
    gradient groupBy(idx) exchanges. Same floats per partition layout, so
    results stay deterministic run to run."""
    n_parts = spark.sparkContext.defaultParallelism
    feat = feat.repartition(n_parts, "id").persist()
    labels = (
        labels.select("id", F.col("y").cast("double").alias("y"))
        .repartition(n_parts, "id")
        .persist()
    )
    n = labels.count()
    if n == 0:
        feat.unpersist()
        labels.unpersist()
        # a clear error instead of float(None) TypeErrors mid-iteration
        raise ValueError("fit_logistic needs at least one labeled row")
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    history: list[float] = []
    for _ in range(iters):
        wdf = spark.createDataFrame(
            [(int(i), float(w[i])) for i in np.nonzero(w)[0]] or [(0, float(w[0]))],
            "idx int, w double",
        )
        marg = _margins(feat, wdf, b)
        err = (
            labels.join(marg, "id", "left")
            .select(
                "id",
                "y",
                (1.0 / (1.0 + F.exp(-F.coalesce(F.col("margin"), F.lit(b))))).alias("p"),
            )
            .select("id", "y", "p", (F.col("p") - F.col("y")).alias("e"))
            .persist()
        )
        # dim-bounded gradient + scalar loss in ONE action (r13 opt: the
        # loss/bias stats ride along as two sentinel-idx rows stacked under
        # the gradient union, halving the per-iteration job count; both
        # subtrees read the persisted err relation, and each aggregate's
        # partial-merge structure is unchanged, so every float matches the
        # former two-action form — pinned by the bit-determinism rerun test)
        gcol = (
            feat.join(err.select("id", "e"), "id")
            .groupBy("idx")
            .agg(F.sum(F.col("cnt") * F.col("e")).alias("g"))
        )
        stats = err.agg(
            F.avg(
                -(
                    F.col("y") * F.log(F.greatest(F.col("p"), F.lit(1e-12)))
                    + (1 - F.col("y")) * F.log(F.greatest(1 - F.col("p"), F.lit(1e-12)))
                )
            ).alias("loss"),
            F.avg("e").alias("ge"),
        ).selectExpr("stack(2, -1, loss, -2, ge) AS (idx, g)")
        rows = gcol.unionByName(stats).collect()
        err.unpersist()
        g = np.zeros(dim, dtype=np.float64)
        loss_v = ge_v = None
        for r in rows:
            if r["idx"] == -1:
                loss_v = r["g"]
            elif r["idx"] == -2:
                ge_v = r["g"]
            else:
                g[r["idx"]] = r["g"] / n
        w -= lr * (g + l2 * w)
        b -= lr * float(ge_v)
        history.append(float(loss_v))
    feat.unpersist()
    labels.unpersist()
    return LinearTextModel(weights=w, bias=b, dim=dim, loss_history=history)


def predict_scores(
    spark: SparkSession,
    feat: DataFrame,
    model: LinearTextModel,
    ids: DataFrame | None = None,
) -> DataFrame:
    """(id, score): sigmoid(w·x + b) — one broadcast join + grouped agg.

    The id universe defaults to the ids PRESENT IN `feat` — a document with
    zero tokens produces no feature rows and therefore no score row. Pass
    `ids` (a one-column 'id' frame, e.g. docs.select(col(id).alias('id')))
    to score a full corpus; docs absent from feat then score
    sigmoid(bias)."""
    nz = np.nonzero(model.weights)[0]
    wdf = spark.createDataFrame(
        [(int(i), float(model.weights[i])) for i in nz] or [(0, 0.0)],
        "idx int, w double",
    )
    if ids is None:
        ids = feat.select("id").distinct()
    marg = _margins(feat, wdf, model.bias)
    return ids.join(marg, "id", "left").select(
        "id",
        (1.0 / (1.0 + F.exp(-F.coalesce(F.col("margin"), F.lit(model.bias))))).alias(
            "score"
        ),
    )
