"""Scale-path quality evidence: the approximate/partitioned variants stay
within measured bounds of their exact oracles (SURVEY §4 — approx modes must
keep the exact form as correctness oracle)."""

from pyspark.sql import functions as F

from oaim_sandbox_spark.operators.ann import IVFIndex, knn_join

SF = "/root/testdata/sf0.01"


def test_ivf_recall_at_partial_probe(spark, tmp_path):
    """nprobe=4 of 8 centroids: recall@10 vs exact must clear 0.5 (coarse
    quantization on 64-dim mock vectors; full probe == exact is covered in
    test_ann). This bounds the speed/recall trade instead of hand-waving it."""
    store = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [float(x) for x in store.filter("vec_id = 7").select(
        F.expr("cast(embedding as array<double>)")).collect()[0][0]]
    qdf = spark.createDataFrame([(0, qv)], "query_id INT, query_vec ARRAY<DOUBLE>")
    exact = [
        r["neighbor_id"] for r in knn_join(store.filter("vec_id <> 7"), qdf, k=10).collect()
    ]
    idx = IVFIndex(n_centroids=8, seed=3, max_iter=10).fit(store)
    path = str(tmp_path / "ivf")
    idx.write_partitioned(store.filter("vec_id <> 7"), path)
    approx = [
        r["vec_id"] for r in idx.search(spark, path, qv, k=10, nprobe=4, id_col="vec_id").collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"recall@10 {recall} below bound"


def test_partitioned_events_scan_prunes(spark, tmp_path):
    """PLANS.md claim made real: events laid out partitionBy(event_type)
    turns the error-only scan into partition pruning (PartitionFilters),
    reading 1/N of the data at any scale."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = spark.read.parquet(f"{SF}/events.parquet")
    path = str(tmp_path / "events_by_type")
    events.write.partitionBy("event_type").parquet(path)
    q = spark.read.parquet(path).filter(F.col("event_type") == "error").select("event_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    assert q.count() == events.filter("event_type = 'error'").count()


def test_approx_percentile_tracks_exact(spark):
    """The 100 TB percentile path (approx_percentile / t-digest) stays within
    1% relative error of the exact interpolated percentile it replaces."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    row = docs.select(
        F.expr("percentile(n_chars, array(0.5D, 0.9D, 0.99D))").alias("exact"),
        F.expr("approx_percentile(n_chars, array(0.5D, 0.9D, 0.99D), 10000)").alias("approx"),
    ).collect()[0]
    for e, a in zip(row["exact"], row["approx"]):
        assert abs(a - e) / e <= 0.01, (e, a)


def test_approx_count_distinct_tracks_exact(spark):
    """HLL++ approx_count_distinct at rsd=0.05 stays within 3 sigma of exact
    distinct counts — the cardinality-estimation scale path (a global
    COUNT(DISTINCT) shuffles every distinct value; HLL sketches merge in
    constant space per partition)."""
    events = spark.read.parquet(f"{SF}/events.parquet")
    exact = events.select("user_id").distinct().count()
    approx = events.agg(F.approx_count_distinct("user_id", rsd=0.05).alias("a")).collect()[0]["a"]
    assert abs(approx - exact) <= max(3, 0.15 * exact)
    # grouped form: every group within tolerance too
    ex = {r.event_type: r.n for r in events.groupBy("event_type")
          .agg(F.countDistinct("user_id").alias("n")).collect()}
    ap = {r.event_type: r.n for r in events.groupBy("event_type")
          .agg(F.approx_count_distinct("user_id", 0.05).alias("n")).collect()}
    for k in ex:
        assert abs(ap[k] - ex[k]) <= max(3, 0.15 * ex[k])


def test_runtime_bloom_filter_join_pruning(spark, tmp_path):
    """Runtime row-level filtering: on a shuffle join where one side carries a
    selective filter, Spark injects a bloom filter built from the filtered
    (creation) side into the other side's scan — at 100 TB this drops most of
    the big side's rows BEFORE the join shuffle. Thresholds are tuned for
    10 GB scans, so force-enable at test scale and assert the injected
    `bloom_filter_might_contain` actually lands in the probe-side plan."""
    big = spark.range(0, 200_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("payload")
    )
    dim = spark.range(0, 5_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("cat")
    )
    big.write.mode("overwrite").parquet(str(tmp_path / "big"))
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        b = spark.read.parquet(str(tmp_path / "big"))
        d = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("cat") == 3)
        joined = b.join(d, "k")
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan, plan[:2000]
        # and the filtered result is still exactly right
        assert joined.count() == d.count()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning(spark, tmp_path):
    """Runtime partition pruning: a partitioned fact joined to a FILTERED
    literal dim (no static relation between filter and partition key, so
    only DPP can prune) plans a dynamicpruning subquery in PartitionFilters
    — at 100 TB this is what keeps a dim-filtered fact join from scanning
    every partition."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "fact")
    spark.range(50_000).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("v")
    ).write.partitionBy("k").parquet(d)
    dim = spark.createDataFrame(
        [(i, "hot" if i in (2, 7) else "cold") for i in range(10)], "k long, temp string"
    )
    fact = spark.read.parquet(d)
    q = fact.join(dim.filter("temp = 'hot'"), "k").agg(F.sum("v"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan
    # and the answer is the hot-partition sum
    expect = sum(v for v in range(50_000) if v % 10 in (2, 7))
    assert q.collect()[0][0] == expect


def test_approx_vocab_overlap_tracks_exact_and_scales(spark, monkeypatch):
    """VERDICT r11 #4: the registered MinHash scale twin of
    source_vocab_overlap. (a) audit config: every pair's estimate sits in
    the 3-sigma envelope of the exact jaccard computed by the certified
    entry's own SQL; (b) production config (audit=False): the exact
    entry's vocab-sized distinct self-join is NEVER built — per-source
    state is num_perm grouped MINs over the shared token explode, nothing
    vocabulary-sized."""
    from oaim_sandbox_spark.queries_extended import source_vocab_overlap
    from oaim_sandbox_spark.queries_registry import approx_vocab_overlap
    from oaim_sandbox_spark.queries_core import register_views

    sf = "/root/testdata/sf0.001"
    audited = approx_vocab_overlap(spark, sf, audit=True).collect()
    assert audited and all(r["within_bound"] for r in audited)

    register_views(spark, sf, tables=("documents",))
    exact = {(r["source_a"], r["source_b"]): r["vocab_jaccard"]
             for r in spark.sql(source_vocab_overlap("spark")).collect()}
    # same pair set as the exact entry (empty-vocab sources aside — none
    # in the testdata) and the audit's exact column IS the exact entry's
    assert {(r["source_a"], r["source_b"]) for r in audited} == set(exact)
    for r in audited:
        assert abs(r["exact_jaccard"] - exact[(r["source_a"], r["source_b"])]) < 1e-9

    # production config must never build the exact entry's SQL (the only
    # vocab-sized piece): poison it and confirm audit=False doesn't touch it
    import oaim_sandbox_spark.queries_extended as QE

    def _poisoned(_d):
        raise AssertionError("audit=False must not run the exact self-join")

    monkeypatch.setattr(QE, "source_vocab_overlap", _poisoned)
    prod = approx_vocab_overlap(spark, sf, audit=False)
    assert prod.columns == ["source_a", "source_b", "n_matches", "approx_jaccard"]
    # the production numbers are the audited run's numbers (determinism:
    # fixed permutation constants, no RNG anywhere)
    assert [(r["source_a"], r["source_b"], r["n_matches"]) for r in prod.collect()] \
        == [(r["source_a"], r["source_b"], r["n_matches"]) for r in audited]
