"""ANN tiers: exact knn_join vs numpy, deterministic LSH buckets, IVF
partition-pruned probe recall (SURVEY §4: Oracle HNSW/IVF analogue)."""

import numpy as np
import pytest

from oaim_sandbox_spark.operators.ann import IVFIndex, knn_join, lsh_knn_join, signed_projection_buckets

N, DIM = 60, 8
RNG = np.random.default_rng(7)
ITEMS = [(i, RNG.standard_normal(DIM).astype(float).tolist()) for i in range(N)]
QUERIES = [(100, ITEMS[0][1]), (101, ITEMS[5][1])]


@pytest.fixture(scope="module")
def items(spark):
    return spark.createDataFrame(ITEMS, "vec_id INT, embedding ARRAY<FLOAT>")


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(QUERIES, "query_id INT, query_vec ARRAY<FLOAT>")


def _np_topk(qv, k):
    mat = np.array([np.array(v, dtype=np.float32).astype(np.float64) for _, v in ITEMS])
    q = np.array(np.array(qv, dtype=np.float32), dtype=np.float64)
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    dists = 1 - sims
    order = sorted(range(N), key=lambda i: (round(dists[i], 6), ITEMS[i][0]))
    return [ITEMS[i][0] for i in order[:k]]


def test_knn_join_matches_numpy(items, queries):
    out = knn_join(items, queries, k=5).collect()
    by_q = {}
    for r in sorted(out, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    for qid, qv in QUERIES:
        assert by_q[qid] == _np_topk(qv, 5)


def test_knn_join_self_match_first(items, queries):
    out = knn_join(items, queries, k=1).collect()
    ranks = {r.query_id: r.neighbor_id for r in out}
    assert ranks[100] == 0 and ranks[101] == 5  # queries ARE items 0 and 5


def test_lsh_buckets_deterministic(items):
    b1 = {r.vec_id: r.bucket for r in signed_projection_buckets(items, n_planes=4, dim=DIM).collect()}
    b2 = {r.vec_id: r.bucket for r in signed_projection_buckets(items, n_planes=4, dim=DIM).collect()}
    assert b1 == b2
    assert all(0 <= b < 16 for b in b1.values())


def test_lsh_knn_join_self_bucket(items, queries):
    out = lsh_knn_join(items, queries, k=1, n_planes=4, dim=DIM).collect()
    # the query equals an item -> same bucket -> rank-1 hit is itself
    first = {r.query_id: r.neighbor_id for r in out if r.rank == 1}
    assert first[100] == 0 and first[101] == 5


def test_ivf_full_probe_equals_exact(spark, items, tmp_path):
    idx = IVFIndex(n_centroids=4, seed=1).fit(items)
    path = str(tmp_path / "ivf")
    idx.write_partitioned(items, path)
    qv = [float(x) for x in ITEMS[3][1]]
    approx = idx.search(spark, path, qv, k=3, nprobe=4, id_col="vec_id").collect()
    exact = _np_topk(qv, 3)
    assert [r.vec_id for r in approx] == exact  # nprobe = all centroids -> exact


def test_ivf_partition_pruning(spark, items, tmp_path):
    idx = IVFIndex(n_centroids=4, seed=1).fit(items)
    path = str(tmp_path / "ivf2")
    idx.write_partitioned(items, path)
    qv = [float(x) for x in ITEMS[3][1]]
    plan = idx.search(spark, path, qv, k=3, nprobe=1, id_col="vec_id")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "centroid" in plan
