"""End-to-end tests for pipeline.populate_vs (reference §3.2 parity) and
pipeline.curate_corpus (config-driven corpus curation)."""

import pytest
from pyspark.sql import functions as F

from oaim_sandbox_spark.catalog import VectorStorage, VectorStoreCatalog
from oaim_sandbox_spark.pipeline import curate_corpus, populate_vs

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").limit(100)


def _vs():
    return VectorStorage(
        alias="pipe", model="mock-embed", chunk_size=200, chunk_overlap=20,
        distance_metric="COSINE", index_type="IVF",
    )


def test_populate_vs_end_to_end(spark, docs, tmp_path):
    catalog = VectorStoreCatalog(spark, root=str(tmp_path))
    rep = populate_vs(spark, docs, catalog, _vs())
    assert rep.n_chunks >= rep.n_deduped >= rep.n_new > 0
    store = catalog.read_store(rep.vs_name)
    assert store.count() == rep.n_new
    row = store.first()
    assert len(row["embedding"]) == 64 and row["cid"]
    # catalog discovery sees it (K5 sidecar)
    assert any(s.vector_store == rep.vs_name for s in catalog.list_stores())


def test_populate_vs_idempotent_second_run(spark, docs, tmp_path):
    catalog = VectorStoreCatalog(spark, root=str(tmp_path))
    first = populate_vs(spark, docs, catalog, _vs())
    again = populate_vs(spark, docs, catalog, _vs())
    # anti-join merge: nothing new on an identical re-ingest (K2 semantics)
    assert again.n_new == 0
    assert catalog.read_store(first.vs_name).count() == first.n_new


def test_populate_vs_incremental_delta_only(spark, docs, tmp_path):
    catalog = VectorStoreCatalog(spark, root=str(tmp_path))
    half = docs.filter(F.col("doc_id") % 2 == 0)
    populate_vs(spark, half, catalog, _vs())
    rep = populate_vs(spark, docs, catalog, _vs())
    # only the odd-doc chunks are new
    assert 0 < rep.n_new < rep.n_deduped


def test_curate_corpus_stages_and_counts(spark, docs):
    curated, counts = curate_corpus(
        spark,
        docs,
        {"scrub_pii": True, "min_quality": 0.0, "exact_dedup": True,
         "near_dedup_jaccard": 0.5},
    )
    assert counts["input"] == 100
    assert counts["output"] == curated.count()
    assert counts["after_exact_dedup"] >= counts["after_near_dedup"] == counts["output"]
    assert set(docs.columns) == set(curated.columns)


def test_curate_corpus_near_dedup_drops_known_dupe(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup
        (3, "completely different words entirely here now okay fine"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    curated, counts = curate_corpus(
        spark, df, {"scrub_pii": False, "exact_dedup": True, "near_dedup_jaccard": 0.9}
    )
    ids = {r["doc_id"] for r in curated.collect()}
    assert ids == {1, 3}  # first-wins on the dup pair


def test_curate_corpus_disabled_stages_no_ops(spark, docs):
    curated, counts = curate_corpus(
        spark, docs,
        {"scrub_pii": False, "min_quality": 0.0, "exact_dedup": False,
         "near_dedup_jaccard": None},
    )
    assert counts["output"] == counts["input"]
    assert "after_exact_dedup" not in counts


def test_populate_vs_builds_probeable_index(spark, docs, tmp_path):
    from oaim_sandbox_spark.operators.ann import IVFIndex

    catalog = VectorStoreCatalog(spark, root=str(tmp_path))
    rep = populate_vs(spark, docs, catalog, _vs(), build_index=True, n_centroids=4)
    assert rep.index_path and rep.index_path.endswith("_ivf")
    idx = IVFIndex.load(f"{rep.index_path}/_ivf_index.json")
    qv = [float(x) for x in catalog.read_store(rep.vs_name).first()["embedding"]]
    hits = idx.search(spark, rep.index_path, qv, k=3, nprobe=2, id_col="cid").collect()
    assert 0 < len(hits) <= 3


def test_curate_incremental_drops_cross_batch_dupes(spark):
    from oaim_sandbox_spark.pipeline import curate_incremental

    existing = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id BIGINT, text STRING",
    )
    new = spark.createDataFrame(
        [
            # exact dup of existing (after whitespace normalization)
            (1, "alpha  beta gamma delta epsilon zeta eta theta iota kappa"),
            # near dup: one word changed out of ten
            (2, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
            # genuinely new
            (3, "completely different content with other words entirely here"),
        ],
        "doc_id BIGINT, text STRING",
    )
    kept, counts = curate_incremental(
        spark, new, existing, {"scrub_pii": False, "exact_dedup": False},
        near_dup_jaccard=0.4,
    )
    ids = {r["doc_id"] for r in kept.collect()}
    assert 1 not in ids          # cross-batch exact dup dropped
    assert 3 in ids              # novel doc kept
    assert counts["after_cross_exact"] == 2
    assert counts["output"] == len(ids)


def test_curate_corpus_classifier_gate(spark):
    """The optional linear-model gate keeps high-score docs and drops
    low-score ones (DEFAULT_WEIGHTS: 'vector'/'hash' positive, 'slow'/'big'
    negative), and records its stage count."""
    rows = [
        (1, "vector hash vector stream query table row"),   # strongly positive
        (2, "slow big slow big customer line sort merge"),  # strongly negative
        (3, "vector hash query spark stream part filter"),  # positive
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    curated, counts = curate_corpus(
        spark, df,
        {"scrub_pii": False, "exact_dedup": False, "near_dedup_jaccard": None,
         "classifier_min_score": 0.5},
    )
    assert {r["doc_id"] for r in curated.collect()} == {1, 3}
    assert counts["after_classifier"] == 2 == counts["output"]


def test_curate_corpus_idempotent(spark):
    """Curation is a fixpoint: running the full config over already-curated
    output changes nothing (scrub is idempotent, dedup finds no dups,
    gates pass what they passed)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cfg = {"scrub_pii": True, "min_quality": 0.2, "exact_dedup": True,
           "near_dedup_jaccard": 0.5, "classifier_min_score": 0.05}
    once, counts1 = curate_corpus(spark, docs, cfg)
    once = once.localCheckpoint(eager=True)
    twice, counts2 = curate_corpus(spark, once, cfg)
    assert counts2["output"] == counts1["output"]
    a = {r["doc_id"] for r in once.select("doc_id").collect()}
    b = {r["doc_id"] for r in twice.select("doc_id").collect()}
    assert a == b


def test_populate_vs_rejects_foreign_store_schema(spark, tmp_path):
    """A same-named store built by a different ingest path (content hash in
    'id', no 'cid' column) must fail loudly — an UNRESOLVED_COLUMN
    AnalysisException used to be swallowed as 'first ingest', silently
    re-embedding everything and appending an extra column into the store."""
    import pytest
    from pyspark.sql import functions as F

    from oaim_sandbox_spark.catalog import VectorStorage, VectorStoreCatalog, get_vs_table
    from oaim_sandbox_spark.pipeline import populate_vs

    cat = VectorStoreCatalog(spark, str(tmp_path))
    vs = VectorStorage(alias="fx", model="mock-embed", chunk_size=100, chunk_overlap=10)
    name, _ = get_vs_table(vs.model, vs.chunk_size, vs.chunk_overlap,
                           vs.distance_metric, vs.index_type, vs.alias)
    # foreign-path store: keyed by 'id', no 'cid'
    foreign = spark.range(3).select(
        F.col("id").cast("string").alias("id"),
        F.lit("text").alias("text"),
        F.expr("array(1.0D)").alias("embedding"),
    )
    foreign.write.parquet(str(tmp_path / name))
    docs = spark.createDataFrame([(1, "alpha beta " * 30)], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="different ingest path"):
        populate_vs(spark, docs, cat, vs)


def test_merge_content_id_null_text_stable(spark):
    """NULL text hashes to the empty-string content id (not NULL): a NULL
    join key never matches the anti-join, so such rows used to be
    re-embedded and re-appended on every run forever."""
    from oaim_sandbox_spark.operators.merge import merge_new_rows, with_content_id

    batch = spark.createDataFrame([("a", None), ("b", "x")], "k STRING, text STRING")
    addressed = with_content_id(batch, text_col="text", id_col="id")
    assert all(r["id"] is not None for r in addressed.collect())
    # second delivery of the same batch: nothing is 'fresh'
    fresh = merge_new_rows(addressed, addressed.select("id"), id_col="id")
    assert fresh.count() == 0


def test_curate_corpus_sampled_cosine_stage_agrees_with_minhash(spark):
    """VERDICT r7 task #5: the linear-cost sampled-cosine family is a
    config-selectable near-dup stage. On the planted sf0.001 corpus the two
    stages agree EXACTLY on duplicate mass (measured: both drop the same 24
    of 500 docs at jaccard 0.5 / cosine 0.6) — the sampled-candidate +
    exact-rescore + connected-components chain reproduces the minhash
    verdict while costing C*n_terms instead of a shingle-band self-join."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    mh, mh_counts = curate_corpus(
        spark, docs, {"scrub_pii": False, "exact_dedup": True, "near_dedup_jaccard": 0.5}
    )
    sc, sc_counts = curate_corpus(
        spark, docs,
        {"scrub_pii": False, "exact_dedup": True,
         "near_dup": "sampled_cosine", "near_dedup_cosine": 0.6},
    )
    mh_ids = {r["doc_id"] for r in mh.select("doc_id").collect()}
    sc_ids = {r["doc_id"] for r in sc.select("doc_id").collect()}
    assert mh_counts["input"] - mh_counts["output"] >= 20  # real duplicate mass
    assert mh_ids == sc_ids
    assert sc_counts["after_near_dedup"] == sc_counts["output"] == len(sc_ids)


def test_curate_corpus_sampled_cosine_collapses_transitive_chain(spark):
    """The cosine stage routes pairs through connected components, so a
    transitive chain A~B~C keeps ONLY the canonical min-id doc even when
    the A~C edge itself is below threshold."""
    s1 = "alpha bravo charlie delta echo foxtrot golf hotel"
    s2 = "india juliet kilo lima mike november oscar papa"
    s3 = "quebec romeo sierra tango uniform victor whiskey xray"
    s4 = "yankee zulu apple banana cherry durian elder fig"
    rows = [  # overlapping halves: 10~20 share s2, 20~30 share s3, 10~30 ~nothing
        (10, f"{s1} {s2}"),
        (20, f"{s2} {s3}"),
        (30, f"{s3} {s4}"),
        (40, "completely unrelated document about spark shuffles and parquet readers"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    curated, counts = curate_corpus(
        spark, df,
        {"scrub_pii": False, "exact_dedup": False,
         # measured: the 10~20 and 20~30 overlap edges score 0.2176, the
         # 10~30 edge doesn't surface at all — 0.2 keeps both chain links
         "near_dup": "sampled_cosine", "near_dedup_cosine": 0.2,
         # tiny fixture: disable the df-fraction term drop sized for corpora
         "near_dup_params": {"max_df_frac": 1.0}},
    )
    ids = {r["doc_id"] for r in curated.collect()}
    assert ids == {10, 40}
    assert counts["after_near_dedup"] == 2


def test_curate_corpus_rejects_unknown_near_dup_method(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id BIGINT, text STRING")
    with pytest.raises(ValueError, match="unknown near_dup method"):
        curate_corpus(spark, df, {"near_dup": "nope", "near_dedup_cosine": 0.5})


def test_curate_corpus_accounting_report_equals_standalone_entries(spark):
    """VERDICT r8 task #5: report='accounting' emits the dedup-accounting
    family from the pipeline's OWN materialized pair relation, and on the
    raw documents corpus (gates off, threshold 0.5 = the standalone
    operating point) each report is row-identical to the certified registry
    entries dedup_degree_profile / dedup_threshold_sensitivity /
    cross_source_duplicate_matrix."""
    import oaim_sandbox_spark.queries as Q

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out, counts, reports = curate_corpus(
        spark, docs,
        config={"scrub_pii": False, "exact_dedup": False,
                "near_dedup_jaccard": 0.5},
        report="accounting",
    )
    assert set(reports) == {"degree_profile", "threshold_sensitivity", "source_matrix"}
    standalone = {
        "degree_profile": "dedup_degree_profile",
        "threshold_sensitivity": "dedup_threshold_sensitivity",
        "source_matrix": "cross_source_duplicate_matrix",
    }
    qs = Q.spark_queries()
    for key, entry in standalone.items():
        got = [tuple(r) for r in reports[key].collect()]
        want = [tuple(r) for r in qs[entry](spark, sf).collect()]
        assert got == want, key
    # the report is consistent with the pipeline's own drop accounting:
    # per-source n_dropped sums to the rows the near-dup stage removed
    dropped = sum(r["n_dropped"] for r in reports["degree_profile"].collect())
    assert counts["input"] - counts["after_near_dedup"] == dropped


def test_curate_corpus_accounting_requires_minhash_stage(spark, docs):
    with pytest.raises(ValueError, match="minhash near-dup stage"):
        curate_corpus(spark, docs, config={"near_dedup_jaccard": None},
                      report="accounting")
    with pytest.raises(ValueError, match="unknown report"):
        curate_corpus(spark, docs, report="acct")


def test_curate_corpus_quality_rules_report_equals_standalone_entry(spark):
    """report='quality_rules' emits the Gopher rule matrix over the
    pipeline's INPUT frame via the SAME SQL body as the certified
    gopher_quality_rules entry — row-identical on the raw documents corpus,
    and source-less frames report under source='corpus'."""
    import oaim_sandbox_spark.queries as Q

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    _out, counts, reports = curate_corpus(spark, docs, report="quality_rules")
    assert set(reports) == {"gopher_quality_rules"}
    got = [tuple(r) for r in reports["gopher_quality_rules"].collect()]
    want = [tuple(r) for r in
            Q.spark_queries()["gopher_quality_rules"](spark, sf).collect()]
    assert got == want
    assert counts["input"] == docs.count()
    # source-less frame: one 'corpus' row, counts over the whole frame
    nosrc = docs.select("doc_id", "text")
    _o, _c, rep2 = curate_corpus(spark, nosrc, report="quality_rules")
    rows = rep2["gopher_quality_rules"].collect()
    assert len(rows) == 1 and rows[0]["source"] == "corpus"
    assert rows[0]["n_docs"] == nosrc.count()
