"""Distance-metric parity (Oracle semantics, SURVEY §2.6) + top-k/threshold/
MMR behavior (reference chatbot.py:183-210, schema.py:168-183)."""

import math

import numpy as np
import pytest

from oaim_sandbox_spark.operators.retrieval import mmr_rerank, similarity_topk

VECS = [
    (1, [1.0, 0.0, 0.0]),
    (2, [0.9, 0.1, 0.0]),
    (3, [0.0, 1.0, 0.0]),
    (4, [-1.0, 0.0, 0.0]),
    (5, [0.5, 0.5, 0.0]),
]
QUERY = [1.0, 0.0, 0.0]


@pytest.fixture(scope="module")
def store(spark):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in VECS], "id INT, embedding ARRAY<FLOAT>"
    )


def _np_dist(v, metric):
    a, q = np.asarray(v), np.asarray(QUERY)
    if metric == "COSINE":
        return 1 - a.dot(q) / (np.linalg.norm(a) * np.linalg.norm(q))
    if metric == "EUCLIDEAN_DISTANCE":
        return float(np.linalg.norm(a - q))
    return -float(a.dot(q))  # Oracle DOT_PRODUCT: negated inner product


@pytest.mark.parametrize("metric", ["COSINE", "EUCLIDEAN_DISTANCE", "DOT_PRODUCT"])
def test_topk_matches_numpy(store, metric):
    out = similarity_topk(store, QUERY, k=5, metric=metric).collect()
    expected = sorted(VECS, key=lambda iv: (_np_dist(iv[1], metric), iv[0]))
    assert [r.id for r in out] == [i for i, _ in expected]
    for r in out:
        v = dict(VECS)[r.id]
        assert math.isclose(r.distance, round(_np_dist(v, metric), 6), abs_tol=1e-6)


def test_dot_product_is_negated(store):
    out = similarity_topk(store, QUERY, k=1, metric="DOT_PRODUCT").collect()
    # largest dot product (id 1, dot=1.0) must rank first with distance -1.0
    assert out[0].id == 1
    assert out[0].distance == -1.0


def test_topk_k_limits(store):
    assert len(similarity_topk(store, QUERY, k=3).collect()) == 3


def test_score_threshold(store):
    out = similarity_topk(store, QUERY, k=10, metric="COSINE", score_threshold=0.9).collect()
    # score = 1 - dist/2; cosine dist <= 0.2 <=> cos sim >= 0.8
    assert {r.id for r in out} == {1, 2}
    assert all(r.score >= 0.9 for r in out)


def test_mmr_first_pick_is_most_similar(store):
    rows = mmr_rerank(store, QUERY, k=3, fetch_k=5, lambda_mult=0.5)
    assert rows[0]["id"] == 1


def test_mmr_diversifies(store):
    # with lambda=0 (pure diversity) the 2nd pick should NOT be the 2nd-nearest
    # (id 2 is nearly parallel to id 1); it should pick something orthogonal.
    rows = mmr_rerank(store, QUERY, k=2, fetch_k=5, lambda_mult=0.0)
    assert rows[0]["id"] == 1
    assert rows[1]["id"] != 2


def test_mmr_lambda_one_equals_topk(store):
    rows = mmr_rerank(store, QUERY, k=3, fetch_k=5, lambda_mult=1.0)
    topk = similarity_topk(store, QUERY, k=3).collect()
    assert [r["id"] for r in rows] == [r.id for r in topk]


def test_normalized_store_dot_topk_equals_cosine_topk(spark):
    """Cosine top-k over the raw store == negated-dot top-k over the
    pre-normalized store (the cosine-at-scale layout)."""
    from oaim_sandbox_spark.operators.retrieval import normalize_vectors, similarity_topk

    store = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in store.filter("vec_id = 0").selectExpr(
        "cast(embedding as array<double>)").collect()[0][0]]
    import math
    qn = math.sqrt(sum(x * x for x in qv)) or 1.0
    q_unit = [x / qn for x in qv]

    cos = similarity_topk(store.filter("vec_id <> 0"), qv, k=8, metric="COSINE", id_col="vec_id")
    normed = normalize_vectors(store.filter("vec_id <> 0"))
    dot = similarity_topk(normed, q_unit, k=8, metric="DOT_PRODUCT", id_col="vec_id")
    assert [r["vec_id"] for r in cos.collect()] == [r["vec_id"] for r in dot.collect()]


def test_normalize_vectors_unit_norm_and_zero_safe(spark):
    from oaim_sandbox_spark.operators.retrieval import normalize_vectors

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "id INT, embedding ARRAY<DOUBLE>"
    )
    rows = {r["id"]: r["embedding"] for r in normalize_vectors(df).collect()}
    assert abs(rows[1][0] - 0.6) < 1e-12 and abs(rows[1][1] - 0.8) < 1e-12
    assert rows[2] == [0.0, 0.0]


def test_federated_topk_across_stores(spark, tmp_path):
    """Multi-store search: per-store local top-k union + global re-rank,
    with store provenance; global result equals top-k over the union."""
    from oaim_sandbox_spark.catalog import VectorStorage, VectorStoreCatalog
    from oaim_sandbox_spark.operators.retrieval import federated_topk

    cat = VectorStoreCatalog(spark, str(tmp_path / "cat"))
    # mirrored fans: a_i = [1, i], b_i = [i, 1] — cosine to [1,1] ties only
    # within each mirrored PAIR, so the global top-4 must take a1,b1,a2,b2
    rows_a = [(f"a{i}", [1.0, float(i)]) for i in range(1, 6)]
    rows_b = [(f"b{i}", [float(i), 1.0]) for i in range(1, 6)]
    for alias, rows in (("store_a", rows_a), ("store_b", rows_b)):
        df = spark.createDataFrame(rows, "id STRING, embedding ARRAY<FLOAT>")
        cat.write_store(df, VectorStorage(alias=alias, model="m", chunk_size=8,
                                          chunk_overlap=0, distance_metric="COSINE"))
    got = federated_topk(cat, [1.0, 1.0], k=4).collect()
    assert len(got) == 4
    assert {r["store"] for r in got} == {s.vector_store for s in cat.list_stores()}
    assert sorted(r["id"] for r in got) == ["a1", "a2", "b1", "b2"]

    named = federated_topk(cat, [1.0, 0.0], k=2,
                           stores=[s.vector_store for s in cat.list_stores()
                                   if "STORE_A" in s.vector_store.upper()])
    ids = [r["id"] for r in named.collect()]
    assert all(i.startswith("a") for i in ids) and len(ids) == 2


def test_federated_topk_rejects_mixed_dims(spark, tmp_path):
    """A store from a different embedding space fails loudly instead of
    flooding the global top-k with NULL-distance rows."""
    import pytest as _pytest

    from oaim_sandbox_spark.catalog import VectorStorage, VectorStoreCatalog
    from oaim_sandbox_spark.operators.retrieval import federated_topk

    cat = VectorStoreCatalog(spark, str(tmp_path / "cat"))
    cat.write_store(
        spark.createDataFrame([("a", [1.0, 0.0])], "id STRING, embedding ARRAY<FLOAT>"),
        VectorStorage(alias="d2", model="m2", chunk_size=8, chunk_overlap=0),
    )
    cat.write_store(
        spark.createDataFrame([("b", [1.0, 0.0, 0.0])], "id STRING, embedding ARRAY<FLOAT>"),
        VectorStorage(alias="d3", model="m3", chunk_size=8, chunk_overlap=0),
    )
    with _pytest.raises(ValueError, match="not comparable"):
        federated_topk(cat, [1.0, 0.0], k=2)


def test_mmr_rerank_survives_zero_vectors(spark):
    """A zero vector among the candidates (or as the query) used to produce
    NaN similarities, leave best=None, and crash on cands[None] — it must
    rank cleanly instead (serving/chat.py calls this on live stores)."""
    from pyspark.sql import functions as F

    from oaim_sandbox_spark.operators.retrieval import mmr_rerank

    store = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("z", [0.0, 0.0]), ("b", [0.9, 0.1]), ("c", [0.0, 1.0])],
        "id STRING, embedding ARRAY<DOUBLE>",
    ).withColumn("embedding", F.expr("cast(embedding as array<double>)"))
    got = mmr_rerank(store, [1.0, 0.0], k=3, fetch_k=4)
    assert len(got) == 3
    assert got[0]["id"] == "a"  # most similar first

    # zero QUERY: no crash, deterministic k rows
    got = mmr_rerank(store, [0.0, 0.0], k=2, fetch_k=4)
    assert len(got) == 2
