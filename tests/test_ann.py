"""ANN tiers: exact knn_join vs numpy, deterministic LSH buckets, IVF
partition-pruned probe recall (SURVEY §4: Oracle HNSW/IVF analogue)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

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


def test_quantize_roundtrip_error_bound(spark):
    from oaim_sandbox_spark.operators.ann import dequantize_embeddings, quantize_embeddings

    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = quantize_embeddings(vecs, vec_col="embedding")
    assert dict(q.dtypes)["qvec"] == "array<tinyint>"
    back = dequantize_embeddings(q.join(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
            "vec_id", F.col("embedding").alias("orig")), "vec_id"), out_col="deq")
    err = back.select(
        F.expr(
            "aggregate(zip_with(cast(orig as array<double>), deq, (a, b) -> abs(a - b)),"
            " cast(0 as double), (s, x) -> greatest(s, x))"
        ).alias("max_err"),
        F.expr(
            "greatest(aggregate(cast(orig as array<double>), cast(0 as double),"
            " (s, x) -> greatest(s, abs(x))), 1e-30) / 254.0 + 1e-9"
        ).alias("bound"),
    )
    assert err.filter("max_err > bound").count() == 0


def test_quantized_storage_shrinks(spark, tmp_path):
    from oaim_sandbox_spark.operators.ann import quantize_embeddings

    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select("vec_id", "embedding")
    fpath, qpath = str(tmp_path / "float"), str(tmp_path / "int8")
    vecs.coalesce(1).write.parquet(fpath)
    quantize_embeddings(vecs).coalesce(1).write.parquet(qpath)
    import pathlib

    size = lambda p: sum(f.stat().st_size for f in pathlib.Path(p).glob("*.parquet"))  # noqa: E731
    assert size(qpath) < 0.45 * size(fpath)  # ~4x smaller vectors (parquet overheads included)


def test_quantized_candidates_recall(spark):
    """Stage-1 quantized cosine top-50 must contain (nearly) all of the exact
    float top-10 — the recall contract that makes exact re-rank lossless."""
    from oaim_sandbox_spark.functions import portable as P

    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").createOrReplaceTempView("emb")
    a = P.to_double_array("e.embedding", "spark")
    qv = P.to_double_array("q.qv", "spark")
    exact = spark.sql(f"""
        WITH q AS (SELECT embedding AS qv FROM emb WHERE vec_id = 0)
        SELECT e.vec_id FROM emb e CROSS JOIN q WHERE e.vec_id <> 0
        ORDER BY {P.cosine_distance(a, qv, 'spark')} ASC, e.vec_id ASC LIMIT 10
    """).collect()
    qa = P.quantize_int8("av", P.absmax("av", "spark"), "spark")
    qq = P.quantize_int8("qvv", P.absmax("qvv", "spark"), "spark")
    approx = spark.sql(f"""
        WITH q AS (SELECT {P.to_double_array("qv", "spark")} AS qvv FROM (SELECT embedding AS qv FROM emb WHERE vec_id = 0) t),
        qq AS (SELECT {qq} AS qvec FROM q),
        store AS (SELECT vec_id, {qa} AS sv FROM (SELECT vec_id, {a} AS av FROM emb e WHERE vec_id <> 0) e)
        SELECT s.vec_id FROM store s CROSS JOIN qq
        ORDER BY (1.0 - {P.int_dot('sv', 'qvec', 'spark')} /
                  (sqrt({P.int_dot('sv', 'sv', 'spark')}) * sqrt({P.int_dot('qvec', 'qvec', 'spark')}))) ASC,
                 s.vec_id ASC LIMIT 50
    """).collect()
    hits = {r.vec_id for r in approx} & {r.vec_id for r in exact}
    assert len(hits) >= 9  # recall@10 >= 0.9 through the 50-candidate stage


# --- product quantization (PQIndex) ----------------------------------------

PQ_DIM = 16


@pytest.fixture(scope="module")
def pq_store(spark):
    rng = np.random.default_rng(11)
    rows = [(i, rng.standard_normal(PQ_DIM).astype(float).tolist()) for i in range(200)]
    return rows, spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<FLOAT>")


def test_pq_encode_shape_and_range(pq_store):
    from oaim_sandbox_spark.operators.ann import PQIndex

    rows, df = pq_store
    idx = PQIndex(m=4, k=8, dim=PQ_DIM).fit(df)
    enc = idx.encode(df)
    assert "embedding" not in enc.columns  # codes replace the vector
    got = enc.select("pq_codes").collect()
    for r in got:
        assert len(r[0]) == 4
        assert all(0 <= c < 8 for c in r[0])


def test_pq_encode_is_nearest_codeword(pq_store):
    from oaim_sandbox_spark.operators.ann import PQIndex

    rows, df = pq_store
    idx = PQIndex(m=4, k=8, dim=PQ_DIM).fit(df)
    got = {r["vec_id"]: r["pq_codes"] for r in idx.encode(df).collect()}
    sub = PQ_DIM // 4
    for vid, vec in rows[:20]:
        x = np.asarray(vec, dtype=np.float32).astype(np.float64)
        for s in range(4):
            xs = x[s * sub : (s + 1) * sub]
            d = ((idx.codebooks[s] - xs[None, :]) ** 2).sum(axis=1)
            assert got[vid][s] == int(d.argmin())


def test_pq_adc_search_recall_with_rerank(pq_store):
    """Two-stage (ADC fetch_k=50 -> exact re-rank) top-10 vs exact euclidean
    top-10: recall must be high — re-rank makes stage-1 error invisible
    whenever the true neighbors survive the candidate cut."""
    from oaim_sandbox_spark.operators.ann import PQIndex

    rows, df = pq_store
    q = rows[3][1]
    idx = PQIndex(m=4, k=16, dim=PQ_DIM).fit(df)
    codes = idx.encode(df)
    got = [r["vec_id"] for r in idx.search(codes, q, k=10, fetch_k=50, exact_df=df).collect()]

    mat = np.array([np.asarray(v, dtype=np.float32).astype(np.float64) for _, v in rows])
    qv = np.asarray(q, dtype=np.float32).astype(np.float64)
    d = np.sqrt(((mat - qv[None, :]) ** 2).sum(axis=1))
    exact = [rows[i][0] for i in sorted(range(len(rows)), key=lambda i: (round(d[i], 6), rows[i][0]))[:10]]
    assert rows[3][0] in got  # the query vector itself is in the store
    assert len(set(got) & set(exact)) >= 8


def test_pq_adc_plan_is_narrow_topk(pq_store):
    """The ADC scan must be shuffle-free: narrow projection over codes +
    TakeOrderedAndProject. No Exchange, no join, no vector column read."""
    from oaim_sandbox_spark.operators.ann import PQIndex

    rows, df = pq_store
    idx = PQIndex(m=4, k=8, dim=PQ_DIM).fit(df)
    codes = idx.encode(df)
    plan = idx.search(codes, rows[0][1], k=5, fetch_k=20)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "TakeOrderedAndProject" in plan


def test_ivf_index_save_load_roundtrip(spark, tmp_path):
    """write_partitioned persists the quantizer as _ivf_index.json inside the
    store dir (underscore-prefixed: invisible to parquet reads); a later
    session loads it and probes identically without refitting."""
    from pyspark.sql import functions as F

    from oaim_sandbox_spark.operators.ann import IVFIndex

    store = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qv = [float(x) for x in store.filter("vec_id = 5").select(
        F.expr("cast(embedding as array<double>)")).collect()[0][0]]
    idx = IVFIndex(n_centroids=4, seed=11, max_iter=5).fit(store)
    path = str(tmp_path / "ivf_persist")
    idx.write_partitioned(store, path)

    loaded = IVFIndex.load(f"{path}/_ivf_index.json")
    assert (loaded.centroids == idx.centroids).all()
    a = [(r["vec_id"], r["distance"]) for r in idx.search(spark, path, qv, k=5, nprobe=2).collect()]
    b = [(r["vec_id"], r["distance"]) for r in loaded.search(spark, path, qv, k=5, nprobe=2).collect()]
    assert a == b and len(a) == 5


def test_lsh_multiprobe_superset_and_no_dupes(items, queries):
    """Radius-1 multiprobe can only ADD candidate pairs (home bucket is
    always probed), never duplicate them (each item lives in one bucket)."""
    single = lsh_knn_join(items, queries, k=N, n_planes=4, dim=DIM)
    multi = lsh_knn_join(items, queries, k=N, n_planes=4, dim=DIM, multiprobe=True)
    s_pairs = {(r.query_id, r.neighbor_id) for r in single.collect()}
    m_rows = multi.collect()
    m_pairs = {(r.query_id, r.neighbor_id) for r in m_rows}
    assert s_pairs <= m_pairs
    assert len(m_pairs) == len(m_rows)  # no duplicate (query, item) rows
    # recall against exact top-5 must not decrease
    def recall(pairs, k=5):
        hits = 0
        for qid, qv in QUERIES:
            approx = {n for q, n in pairs if q == qid}
            hits += len(approx & set(_np_topk(qv, k)))
        return hits
    top5_multi = lsh_knn_join(items, queries, k=5, n_planes=4, dim=DIM, multiprobe=True)
    m5 = {(r.query_id, r.neighbor_id) for r in top5_multi.collect()}
    s5 = {(r.query_id, r.neighbor_id) for r in lsh_knn_join(items, queries, k=5, n_planes=4, dim=DIM).collect()}
    assert recall(m5) >= recall(s5)


def test_ivf_append_partitioned_incremental(spark, items, tmp_path):
    """Incremental maintenance: fit+write on half the store, append the other
    half against the SAME fitted centroids — a full-probe search over the
    merged store then matches the exact oracle over ALL items (append is
    lossless and layout-compatible), and existing partitions aren't refit."""
    half_a = items.filter(F.col("vec_id") < N // 2)
    half_b = items.filter(F.col("vec_id") >= N // 2)
    idx = IVFIndex(n_centroids=4, seed=1).fit(half_a)
    path = str(tmp_path / "ivf_inc")
    idx.write_partitioned(half_a, path)
    idx.append_partitioned(half_b, path)

    merged = spark.read.parquet(path)
    assert merged.count() == N
    qv = [float(x) for x in ITEMS[N - 3][1]]  # a query equal to an APPENDED item
    got = [r.vec_id for r in idx.search(spark, path, qv, k=3, nprobe=4, id_col="vec_id").collect()]
    assert got == _np_topk(qv, 3)

    # reloaded quantizer (no refit) appends identically
    idx2 = IVFIndex.load(f"{path}/_ivf_index.json")
    a1 = {r.vec_id: r.centroid for r in idx.assign(items).collect()}
    a2 = {r.vec_id: r.centroid for r in idx2.assign(items).collect()}
    assert a1 == a2


def test_ivf_search_batch_matches_per_query(spark, tmp_path):
    from pyspark.sql import functions as F

    from oaim_sandbox_spark.operators.ann import IVFIndex

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = IVFIndex(n_centroids=8, seed=11, max_iter=5).fit(emb)
    path = str(tmp_path / "ivf_batch")
    idx.write_partitioned(emb, path)

    qdf = (
        emb.filter(F.col("vec_id") < 4)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").cast("array<double>").alias("query_vec"))
    )
    batch = idx.search_batch(spark, path, qdf, k=5, nprobe=3)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["distance"]))
    queries = {r["query_id"]: [float(x) for x in r["query_vec"]] for r in qdf.collect()}
    assert set(got) == set(queries)
    for qid, qv in queries.items():
        single = idx.search(spark, path, qv, k=5, nprobe=3).collect()
        want = [(i + 1, r["vec_id"], r["distance"]) for i, r in enumerate(single)]
        assert sorted(got[qid]) == want, f"batch != per-query for {qid}"


def test_pq_search_batch_matches_per_query(spark):
    from pyspark.sql import functions as F

    from oaim_sandbox_spark.operators.ann import PQIndex

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pq = PQIndex(m=4, k=16, dim=64, seed=5).fit(emb)
    codes = pq.encode(emb).localCheckpoint()

    qdf = (
        emb.filter(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").cast("array<double>").alias("query_vec"))
    )
    batch = pq.search_batch(codes, qdf, k=5)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["adc_dist"]))
    queries = {r["query_id"]: [float(x) for x in r["query_vec"]] for r in qdf.collect()}
    for qid, qv in queries.items():
        single = pq.search(codes, qv, k=5, fetch_k=5).collect()
        want = [(i + 1, r["vec_id"], r["adc_dist"]) for i, r in enumerate(single)]
        assert sorted(got[qid]) == want, f"batch != per-query for {qid}"


def test_ivf_filtered_search_matches_filtered_exact(spark, tmp_path):
    """Pre-filter semantics: full-probe IVF search with a metadata predicate
    must equal brute-force top-k over the filtered store (exactly k matching
    rows, never an under-filled post-filter), and the predicate must reach
    the parquet scan as a pushed filter."""
    from pyspark.sql import functions as F

    from oaim_sandbox_spark.operators.ann import IVFIndex

    store = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qv = [float(x) for x in store.filter("vec_id = 0").select(
        F.expr("cast(embedding as array<double>)")).collect()[0][0]]
    idx = IVFIndex(n_centroids=4, seed=11, max_iter=5).fit(store)
    path = str(tmp_path / "ivf_filtered")
    idx.write_partitioned(store, path)

    got = idx.search(spark, path, qv, k=8, nprobe=4, where="label = 2 AND vec_id <> 0")
    got_rows = [(r["vec_id"], r["distance"]) for r in got.collect()]

    from oaim_sandbox_spark.operators.retrieval import distance_expr

    exact = (
        store.filter("label = 2 AND vec_id <> 0")
        .withColumn("distance", F.expr(f"round({distance_expr('embedding', qv, 'COSINE')}, 6)"))
        .orderBy(F.col("distance").asc(), F.col("vec_id").asc())
        .limit(8)
    )
    exact_rows = [(r["vec_id"], r["distance"]) for r in exact.collect()]
    assert got_rows == exact_rows and len(got_rows) == 8
    assert all(
        store.filter(f"vec_id = {v}").collect()[0]["label"] == 2 for v, _ in got_rows[:3]
    )

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "label" in plan.split("PushedFilters", 1)[1][:300]


def test_ivf_filtered_search_batch(spark, tmp_path):
    """The batched probe honors the shared predicate too."""
    from pyspark.sql import functions as F

    from oaim_sandbox_spark.operators.ann import IVFIndex

    store = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    idx = IVFIndex(n_centroids=4, seed=11, max_iter=5).fit(store)
    path = str(tmp_path / "ivf_filtered_batch")
    idx.write_partitioned(store, path)
    qdf = store.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"),
        F.expr("cast(embedding as array<double>)").alias("query_vec"),
    )
    out = idx.search_batch(spark, path, qdf, k=5, nprobe=4, where="label = 1")
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    labels = {
        r2["label"]
        for r in rows
        for r2 in store.filter(f"vec_id = {r['vec_id']}").select("label").collect()
    }
    assert labels == {1}


def test_pq_index_save_load_roundtrip(spark, tmp_path, pq_store):
    """PQ codebooks persist and reload bit-exactly: the reloaded index
    encodes and searches identically (codes are meaningless under any other
    codebooks, so persistence is part of the index, not an extra)."""
    import numpy as np

    from oaim_sandbox_spark.operators.ann import PQIndex

    rows, df = pq_store
    idx = PQIndex(m=4, k=8, dim=PQ_DIM).fit(df)
    p = str(tmp_path / "pq.json")
    idx.save(p)
    loaded = PQIndex.load(p)
    np.testing.assert_array_equal(idx.codebooks, loaded.codebooks)
    codes_a = idx.encode(df)
    codes_b = loaded.encode(df)
    a = [(r["vec_id"], tuple(r["pq_codes"])) for r in codes_a.orderBy("vec_id").collect()]
    b = [(r["vec_id"], tuple(r["pq_codes"])) for r in codes_b.orderBy("vec_id").collect()]
    assert a == b
    qa = [r["vec_id"] for r in idx.search(codes_a, rows[0][1], k=5, fetch_k=20).collect()]
    qb = [r["vec_id"] for r in loaded.search(codes_b, rows[0][1], k=5, fetch_k=20).collect()]
    assert qa == qb


def test_partition_histogram_and_fetch_suggestion(spark, tmp_path):
    """Funnel sizing from the index's own layout: partition_histogram
    aggregates per-centroid counts off the partitioned store, and
    suggest_fetch_k returns the floor on balanced data but scales with the
    head cluster under skew — the adversarial-suite lesson as code."""
    from pyspark.sql import functions as F

    from oaim_sandbox_spark.operators.ann import IVFIndex

    # skewed planted set: 70% of vectors in one cluster
    n, dim = 2000, 8
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 7), i -> "
            "3.0 * sin((CASE WHEN id % 10 < 7 THEN 0 ELSE id % 4 END) * 2.4 + i * 0.7) "
            "+ 0.1 * (cast(hash(id, i) as double) / 2147483647.0))"
        ).alias("embedding"),
    )
    idx = IVFIndex(n_centroids=4, seed=3, max_iter=8).fit(emb)
    store = str(tmp_path / "ivf")
    idx.write_partitioned(emb, store)

    hist = idx.partition_histogram(spark, store)
    assert sum(hist.values()) == n
    head = max(hist.values())
    # kmeans may split the planted 70% blob across centroids, but the head
    # partition still dominates the mean by a wide margin
    assert head >= 1.4 * (n / 4)

    # balanced histogram -> floor; skewed -> grows with the head cluster
    assert IVFIndex.suggest_fetch_k({0: 100, 1: 100}, k=10) == 150
    suggested = IVFIndex.suggest_fetch_k(hist, k=10)
    assert suggested == max(150, int(head * 0.25))
    assert suggested > 150
    assert IVFIndex.suggest_fetch_k({}, k=10) == 150


def test_unfitted_index_guards_and_string_qids(spark):
    """Unfitted IVF/PQ indexes raise the clear ValueError from every entry
    point (search/assign/probe/adc — not just search_batch), and PQ
    search_batch accepts string query ids like IVF's does."""
    import pytest
    from pyspark.sql import functions as F

    from oaim_sandbox_spark.operators.ann import IVFIndex, PQIndex

    with pytest.raises(ValueError, match="fit\\(\\) or load\\(\\)"):
        IVFIndex().probe_centroids([0.0] * 8)
    with pytest.raises(ValueError, match="fit\\(\\) or load\\(\\)"):
        IVFIndex().assign(spark.range(1))
    with pytest.raises(ValueError, match="fit\\(\\) or load\\(\\)"):
        PQIndex(m=2, k=4, dim=8).adc_expr([0.0] * 8)

    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(0, 7), i -> cast(hash(id, i) % 100 as double))").alias("embedding"),
    )
    pq = PQIndex(m=2, k=4, dim=8, seed=3).fit(emb)
    codes = pq.encode(emb)
    qdf = spark.createDataFrame(
        [("q1", [float(i) for i in range(8)])], "query_id STRING, query_vec ARRAY<DOUBLE>"
    )
    out = pq.search_batch(codes, qdf, k=3)
    rows = out.collect()
    assert len(rows) == 3 and all(r["query_id"] == "q1" for r in rows)


def test_ivf_fit_samples_uniformly_not_head(spark):
    """fit() on a store CLUSTERED in partition order (head region first)
    must not train the quantizer on the head region only: with a uniform
    sample the centroids span both regions, so assignments split the store
    instead of lumping the tail into one far centroid."""
    from pyspark.sql import functions as F

    from oaim_sandbox_spark.operators.ann import IVFIndex

    n = 60_000  # > max_sample so the sampling path actually engages
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        # first half near (0,..), second half near (50,..): sorted layout
        F.expr(
            "transform(sequence(0, 7), i -> "
            "cast(IF(id < 30000, 0, 50) as double) + (hash(id, i) % 100) / 100.0)"
        ).alias("embedding"),
    ).coalesce(4)  # keep partition order = id order
    idx = IVFIndex(n_centroids=2, seed=7, max_iter=5).fit(emb, max_sample=5000)
    assigned = idx.assign(emb).groupBy("centroid").count().collect()
    counts = sorted(r["count"] for r in assigned)
    assert len(counts) == 2
    # a head-only fit puts both centroids in the head region and assigns
    # lopsidedly; a uniform sample yields a near-even split
    assert counts[0] > 0.4 * n, counts


def test_ivf_search_batch_multi_matches_per_width(spark, tmp_path):
    """search_batch_multi's per-width results must be row-identical to
    standalone search_batch calls (the bench's IVF recall tier relies on
    this equivalence), and compact=True must not change results while
    producing one file per centroid directory."""
    import glob

    from pyspark.sql import functions as F

    from oaim_sandbox_spark.operators.ann import IVFIndex

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = IVFIndex(n_centroids=8, seed=11, max_iter=5).fit(emb)
    path = str(tmp_path / "ivf_multi")
    idx.write_partitioned(emb, path, compact=True)
    for d in glob.glob(f"{path}/centroid=*"):
        assert len(glob.glob(f"{d}/part-*")) == 1, d

    qdf = (
        emb.filter(F.col("vec_id") < 4)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").cast("array<double>").alias("query_vec"))
    )
    multi = idx.search_batch_multi(spark, path, qdf, k=5, nprobes=(1, 3))
    got: dict[int, set] = {}
    for r in multi.collect():
        got.setdefault(r["nprobe"], set()).add((r["query_id"], r["rank"], r["vec_id"], r["distance"]))
    assert set(got) == {1, 3}
    for width in (1, 3):
        single = idx.search_batch(spark, path, qdf, k=5, nprobe=width)
        want = {(r["query_id"], r["rank"], r["vec_id"], r["distance"]) for r in single.collect()}
        assert got[width] == want, f"multi != single at nprobe={width}"


def test_hard_negative_funnel_recall_vs_oracle(spark):
    """The hard_negative_funnel rows-only entry A/B'd against its full
    oracle twin hard_negative_mining (VERDICT r7 task #4): same per-query
    different-label top-5 contract, IVF-pruned candidates vs exhaustive
    scan. The funnel's per-query anti-label predicate rides search_batch's
    query_cols/pair_where. Measured at sf0.01: mean recall@5 0.9333,
    min 0.8 (deterministic: seeded k-means, hash-deterministic sample)."""
    import oaim_sandbox_spark.queries as Q

    sf = "/root/testdata/sf0.01"
    funnel = Q.NON_ORACLE["hard_negative_funnel"](spark, sf).collect()
    Q.register_views(spark, sf)
    oracle = spark.sql(Q.TEMPLATES["hard_negative_mining"]("spark")).collect()

    def by_query(rows, idc):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r[idc])
        return out

    got, want = by_query(funnel, "negative_id"), by_query(oracle, "negative_id")
    assert set(got) == set(want)  # every query answered, none invented
    recalls = [len(got[q] & want[q]) / len(want[q]) for q in want]
    assert sum(recalls) / len(recalls) >= 0.9
    assert min(recalls) >= 0.75
    # contract checks shared with the oracle: rank is 1..5 per query,
    # distances ascend with rank, and no same-label or self negatives
    per_q = {}
    for r in funnel:
        per_q.setdefault(r["query_id"], []).append((r["rnk"], r["distance"], r["negative_id"]))
    qlabels = {r["vec_id"]: r["label"] for r in
               spark.table("embeddings").select("vec_id", "label").collect()}
    for q, rows in per_q.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        dists = [r[1] for r in rows]
        assert dists == sorted(dists)
        for _rnk, _d, neg in rows:
            assert neg != q and qlabels[neg] != qlabels[q]


def test_knn_consensus_funnel_agreement_vs_oracle(spark):
    """The knn_consensus_funnel rows-only entry A/B'd against its full
    oracle twin knn_label_consensus (VERDICT r8 task #3): same per-label
    contract — consensus over each vector's exact-cosine 5-NN — with IVF-
    pruned candidate coverage instead of the all-pairs scan. Measured at
    sf0.01 (deterministic: seeded k-means, hash-deterministic sample):
    n_vectors exact per label, |mean_consensus delta| <= 0.012,
    |n_suspect delta| <= 1."""
    import oaim_sandbox_spark.queries as Q

    sf = "/root/testdata/sf0.01"
    funnel = {r["label"]: r for r in Q.NON_ORACLE["knn_consensus_funnel"](spark, sf).collect()}
    Q.register_views(spark, sf)
    oracle = {r["label"]: r for r in
              spark.sql(Q.TEMPLATES["knn_label_consensus"]("spark")).collect()}
    assert set(funnel) == set(oracle)  # every label audited, none invented
    for lab, o in oracle.items():
        f = funnel[lab]
        # every vector answered: the funnel must not drop queries
        assert f["n_vectors"] == o["n_vectors"], lab
        assert abs(f["mean_consensus"] - o["mean_consensus"]) <= 0.03, lab
        assert abs(f["n_suspect"] - o["n_suspect"]) <= 2, lab
    # the headline signal agrees globally: total suspects within 2%
    tot_f = sum(r["n_suspect"] for r in funnel.values())
    tot_o = sum(r["n_suspect"] for r in oracle.values())
    assert abs(tot_f - tot_o) <= max(2, 0.02 * tot_o)


def test_coreset_coverage_funnel_conservative_vs_oracle(spark):
    """The coreset_coverage_funnel rows-only entry A/B'd against its full
    oracle twin coreset_coverage_radius: IVF over the coreset vs the
    exhaustive point x coreset CROSS JOIN. The pruned probe can only MISS
    the true nearest coreset member, so every funnel radius statistic must
    be >= the oracle's (the audit stays conservative — never reports
    coverage that isn't there) and tight (measured at sf0.01: mean delta
    <= 0.006, p90 <= 0.01, max <= 0.03)."""
    import oaim_sandbox_spark.queries as Q

    sf = "/root/testdata/sf0.01"
    funnel = {r["label"]: r for r in
              Q.NON_ORACLE["coreset_coverage_funnel"](spark, sf).collect()}
    Q.register_views(spark, sf)
    oracle = {r["label"]: r for r in
              spark.sql(Q.TEMPLATES["coreset_coverage_radius"]("spark")).collect()}
    assert set(funnel) == set(oracle)
    for lab, o in oracle.items():
        f = funnel[lab]
        assert f["n_points"] == o["n_points"], lab  # no dropped points
        for col, tol in (("mean_radius", 0.02), ("p90_radius", 0.03), ("max_radius", 0.06)):
            assert f[col] >= o[col] - 1e-9, (lab, col)  # conservative
            assert f[col] - o[col] <= tol, (lab, col)   # and tight


def test_knn_hubness_funnel_distribution_vs_oracle(spark):
    """The knn_hubness_funnel rows-only entry A/B'd against its full oracle
    twin knn_hubness_histogram (VERDICT r9 Missing #1 / task #4): the same
    in-degree roll-up, over IVF-pruned search_batch hit lists instead of
    the exact all-pairs scan. Pruning can swap individual attributions, so
    the contract is DISTRIBUTION agreement, not per-bucket equality:
    vector count exact, total k-occurrence mass exact (every query still
    finds k=5 hits), and the histogram shape close (measured at sf0.01:
    per-bucket L1/n = 0.092, zero-share delta 0.004, tail(>=10)-share
    delta 0.0, max_k delta 0)."""
    import oaim_sandbox_spark.queries as Q

    sf = "/root/testdata/sf0.01"
    funnel = {r["k_occurrence"]: r["n_vectors"] for r in
              Q.NON_ORACLE["knn_hubness_funnel"](spark, sf).collect()}
    Q.register_views(spark, sf)
    oracle = {r["k_occurrence"]: r["n_vectors"] for r in
              spark.sql(Q.TEMPLATES["knn_hubness_histogram"]("spark")).collect()}
    n_f, n_o = sum(funnel.values()), sum(oracle.values())
    assert n_f == n_o  # every vector binned, zeros included
    mass_f = sum(k * v for k, v in funnel.items())
    mass_o = sum(k * v for k, v in oracle.items())
    assert mass_f == mass_o  # k hits per query, conserved through pruning
    l1 = sum(abs(funnel.get(k, 0) - oracle.get(k, 0)) for k in set(funnel) | set(oracle))
    assert l1 <= 0.15 * n_o, f"histogram L1 {l1} over n={n_o}"
    assert abs(funnel.get(0, 0) - oracle.get(0, 0)) <= 0.02 * n_o  # anti-hub head
    tail_f = sum(v for k, v in funnel.items() if k >= 10)
    tail_o = sum(v for k, v in oracle.items() if k >= 10)
    assert abs(tail_f - tail_o) <= max(2, 0.02 * n_o)  # hub tail
    assert abs(max(funnel) - max(oracle)) <= 3  # hubbiest vector comparable
