"""Dedup operators: exact first-wins (reference embedding.py:297-304) and the
near-dup suite (minhash LSH / simhash / n-gram jaccard / embedding cosine)."""

from oaim_sandbox_spark.operators.dedup import (
    embedding_cosine_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tomorrow"
OTHER = "completely different words describing an unrelated topic entirely here now"


def test_exact_dedup_first_wins(spark):
    df = spark.createDataFrame(
        [(3, "dup"), (1, "dup"), (2, "unique")], "doc_id INT, text STRING"
    )
    out = exact_dedup(df, order_col="doc_id").collect()
    kept = {r.text: r.doc_id for r in out}
    assert kept == {"dup": 1, "unique": 2}


def test_exact_dedup_no_order(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "doc_id INT, text STRING")
    assert exact_dedup(df).count() == 2


def test_minhash_identical_docs_identical_sigs(spark):
    df = spark.createDataFrame([(1, BASE), (2, BASE)], "doc_id INT, text STRING")
    sigs = {r.doc_id: r.signature for r in minhash_signatures(df).collect()}
    assert sigs[1] == sigs[2]


def test_minhash_lsh_finds_near_dup(spark):
    df = spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, OTHER)], "doc_id INT, text STRING"
    )
    pairs = {(r.doc_a, r.doc_b): r.est_jaccard for r in minhash_lsh_pairs(df).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)] > 0.5
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_identical_zero_hamming(spark):
    df = spark.createDataFrame([(1, BASE), (2, BASE), (3, OTHER)], "doc_id INT, text STRING")
    fps = {r.doc_id: r.simhash for r in simhash_fingerprints(df).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in simhash_near_pairs(df, max_hamming=5).collect()}
    assert pairs.get((1, 2)) == 0


def test_ngram_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [(1, BASE, "blk"), (2, NEAR, "blk"), (3, OTHER, "blk")],
        "doc_id INT, text STRING, source STRING",
    )
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(df, threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.7
    assert (1, 3) not in pairs


def test_embedding_cosine_pairs(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.999, 0.04]), (3, [0.0, 1.0])],
        "vec_id INT, embedding ARRAY<FLOAT>",
    )
    pairs = {(r.id_a, r.id_b): r.cosine_sim for r in embedding_cosine_pairs(df, threshold=0.9).collect()}
    assert set(pairs) == {(1, 2)}


def test_incremental_near_dups_probe_existing_only(spark):
    from oaim_sandbox_spark.operators.dedup import incremental_near_dups

    base = "the quick brown fox jumps over the lazy dog again and again today"
    existing = spark.createDataFrame(
        [(1, base), (2, "completely different words about spark query engines here")],
        "doc_id BIGINT, text STRING",
    )
    new = spark.createDataFrame(
        [(10, base), (11, base.replace("today", "tonight")), (12, "nothing alike at all zzz qqq www eee rrr ttt yyy uuu")],
        "doc_id BIGINT, text STRING",
    )
    out = incremental_near_dups(new, existing)
    rows = {(r["new_id"], r["existing_id"]): r["est_jaccard"] for r in out.collect()}
    assert rows[(10, 1)] == 1.0          # exact copy of existing doc 1
    assert rows[(11, 1)] >= 0.8          # near copy collides, high est_jaccard
    assert all(nid != 12 for nid, _ in rows)  # unrelated doc matches nothing
    assert all(eid in (1, 2) for _, eid in rows)  # never new x new


def test_semantic_dedup_keeps_one_per_component(spark):
    # 3 planted groups of near-identical vectors + 2 singletons; the operator
    # must keep exactly the lowest id of each group and label every row
    from oaim_sandbox_spark.operators.dedup import semantic_dedup

    base = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0],
        2: [0.0, 0.0, 1.0, 0.0],
    }
    rows = []
    for g, v in base.items():
        for j in range(3):  # ids g, g+10, g+20 — same direction, tiny jitter
            vid = g + 10 * j
            rows.append((vid, [x + (0.001 * j if i == 3 else 0.0) for i, x in enumerate(v)]))
    rows.append((100, [1.0, 1.0, 1.0, 1.0]))
    rows.append((101, [-1.0, 1.0, -1.0, 1.0]))
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")

    kept, labels = semantic_dedup(spark, df, threshold=0.99)
    kept_ids = {r["vec_id"] for r in kept.collect()}
    assert kept_ids == {0, 1, 2, 100, 101}
    lab = {r["vec_id"]: r["cluster_id"] for r in labels.collect()}
    for g in (0, 1, 2):
        assert lab[g] == lab[g + 10] == lab[g + 20] == g
    assert lab[100] == 100 and lab[101] == 101


def test_semantic_dedup_rejects_non_integral_ids(spark):
    from oaim_sandbox_spark.operators.dedup import semantic_dedup

    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])], "doc_id STRING, embedding ARRAY<DOUBLE>"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="integral"):
        semantic_dedup(spark, df, id_col="doc_id")


def test_embedding_pairs_survive_zero_vector(spark):
    # an all-zero embedding must neither NaN the quantizer nor emit pairs
    from oaim_sandbox_spark.queries import _embedding_pairs_core

    rows = [(0, [0.0] * 8), (1, [1.0] + [0.0] * 7), (2, [1.0] + [0.0] * 7)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    pairs = _embedding_pairs_core(spark, df, threshold=0.9).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_incremental_near_dups_with_persisted_signatures(spark, tmp_path):
    """Steady-state path: signatures persisted beside the store round-trip
    through parquet and produce EXACTLY the pairs the from-text path does —
    the corpus text is never re-read per batch."""
    from oaim_sandbox_spark.operators.dedup import incremental_near_dups, minhash_signatures

    existing = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta token{i} eta theta iota kappa") for i in range(30)],
        "doc_id BIGINT, text STRING",
    )
    new = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta token3 eta theta iota kappa"),
         (101, "completely different words entirely unrelated content here now")],
        "doc_id BIGINT, text STRING",
    )
    from_text = incremental_near_dups(new, existing)
    a = sorted((r["new_id"], r["existing_id"], r["est_jaccard"]) for r in from_text.collect())

    p = str(tmp_path / "sigs")
    minhash_signatures(existing).write.mode("overwrite").parquet(p)
    persisted = spark.read.parquet(p)
    from_sigs = incremental_near_dups(new, existing, existing_signatures=persisted)
    b = sorted((r["new_id"], r["existing_id"], r["est_jaccard"]) for r in from_sigs.collect())
    assert a == b and len(a) > 0
    assert all(nid == 100 for nid, _, _ in a)  # only the near-dup batch doc pairs


def test_minhash_band_keys_validates_band_count(spark):
    """bands must divide num_perm: bands > num_perm built malformed SQL and
    a non-divisor silently dropped trailing signature positions from the
    LSH recall curve — both are now a clear ValueError."""
    import pytest

    from oaim_sandbox_spark.operators.dedup import minhash_band_keys, minhash_signatures

    df = spark.createDataFrame([("d", "alpha beta gamma " * 5)], "doc_id STRING, text STRING")
    sigs = minhash_signatures(df, num_perm=16)
    for bad in (20, 5, 0, -1):
        with pytest.raises(ValueError, match="divisor"):
            minhash_band_keys(sigs, num_perm=16, bands=bad)
    assert minhash_band_keys(sigs, num_perm=16, bands=4).count() == 4


def test_connected_components_restores_shuffle_conf(spark):
    """The session-wide shuffle-partition override must be restored even
    when the iteration fails mid-loop (a clobbered session silently
    serializes every later query)."""
    import pytest
    from pyspark.sql import functions as F

    from oaim_sandbox_spark.operators.dedup import connected_components

    saved = spark.conf.get("spark.sql.shuffle.partitions")
    edges = spark.createDataFrame([(1, 2), (2, 3)], "a BIGINT, b BIGINT")
    nodes = spark.range(1, 4).select(F.col("id").alias("doc_id"))
    out = connected_components(edges, nodes, node_col="doc_id", a_col="a", b_col="b")
    assert out.count() == 3
    assert spark.conf.get("spark.sql.shuffle.partitions") == saved

    # failure path: nodes frame with the wrong column -> error inside the
    # helper; the conf must STILL come back
    bad_nodes = spark.range(1, 4)  # no doc_id column
    with pytest.raises(Exception):
        connected_components(edges, bad_nodes, node_col="doc_id", a_col="a", b_col="b").count()
    assert spark.conf.get("spark.sql.shuffle.partitions") == saved
