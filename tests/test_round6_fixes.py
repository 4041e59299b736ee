"""Round-6 hardening tests (VERDICT r5 task 3 + the six ADVICE findings):

  - _spread_for_cpu degrades to a no-op when the private ``_jdf`` probe is
    unavailable (Spark Connect / engine drift) instead of raising.
  - IVF/PQ quantizer training caps its sample uniformly (driver-side
    rng.choice), never via a partition-order .limit().
  - TestbedStore reads evaluations with mergeSchema so pre-'failures'
    6-column files can coexist with current 7-column ones.
  - catalog._swap_rewrite rescues a concurrently-appended file even when its
    basename collides with a rewritten output file.
  - PQ/IVF search_batch derives the query-id DDL type from the batch schema
    and rejects non-str/non-integral id columns with a clear error.
  - the HTTP multipart routes 413 an upload whose Content-Length exceeds the
    configured cap BEFORE reading the body.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pytest

from oaim_sandbox_spark.operators.dedup import _spread_for_cpu


class _NoJdfProxy:
    """DataFrame stand-in whose ``_jdf`` access raises, as under Spark
    Connect; everything else delegates to the wrapped DataFrame."""

    def __init__(self, df):
        object.__setattr__(self, "_df", df)

    def __getattr__(self, name):
        if name == "_jdf":
            raise AttributeError("no _jdf under Spark Connect")
        return getattr(object.__getattribute__(self, "_df"), name)


def test_spread_for_cpu_survives_missing_jdf(spark):
    df = spark.range(10)
    proxy = _NoJdfProxy(df)
    # must not raise, and must NOT repartition blind (that could eagerly
    # materialize a shuffle it couldn't inspect) — identity is the contract
    assert _spread_for_cpu(proxy) is proxy


def test_spread_for_cpu_still_spreads_narrow_inputs(spark):
    df = spark.range(100).coalesce(1)
    out = _spread_for_cpu(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_spread_for_cpu_minhash_unaffected(spark):
    # the operator on top of the hardened probe still runs end to end
    from oaim_sandbox_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame(
        [(i, f"some text body number {i} with words") for i in range(8)],
        "doc_id INT, text STRING",
    )
    assert minhash_signatures(df, num_perm=4).count() == 8


# --- quantizer-fit sampling -------------------------------------------------


def test_ivf_fit_caps_sample_uniformly_and_deterministically(spark):
    from oaim_sandbox_spark.operators.ann import IVFIndex

    rng = np.random.default_rng(7)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(500)]
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    a = IVFIndex(n_centroids=4, seed=3).fit(df, max_sample=100)
    b = IVFIndex(n_centroids=4, seed=3).fit(df, max_sample=100)
    assert a.centroids.shape == (4, 8)
    assert np.allclose(a.centroids, b.centroids)  # seeded cap => reproducible


def test_ivf_fit_sample_not_partition_head(spark):
    """Tail-of-store rows must be able to reach quantizer training. The last
    sixth of this store lives at +50 in every coordinate; a partition-order
    .limit() cut (the pre-fix behavior) systematically excludes it, so no
    centroid lands anywhere near it. With the uniform driver-side cap, the
    far region holds ~1/6 of the training set and k-means must place at
    least one of 8 centroids in it."""
    from oaim_sandbox_spark.operators.ann import IVFIndex

    rng = np.random.default_rng(11)
    rows = [(i, (rng.standard_normal(4) + (50.0 if i >= 2500 else 0.0)).tolist())
            for i in range(3000)]
    # one partition in row order => .limit() would take the head only
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>").coalesce(1)
    idx = IVFIndex(n_centroids=8, seed=3).fit(df, max_sample=300)
    assert (idx.centroids.mean(axis=1) > 25).any(), "no centroid near the store tail"


def test_pq_fit_caps_sample(spark):
    from oaim_sandbox_spark.operators.ann import PQIndex

    rng = np.random.default_rng(9)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    idx = PQIndex(m=2, k=4, dim=8, seed=5).fit(df, max_sample=100)
    assert idx.codebooks.shape == (2, 4, 4)


# --- evaluations schema merge ----------------------------------------------


def test_evaluations_merge_old_sixcolumn_files(spark, tmp_path):
    from oaim_sandbox_spark.operators.testbed import EvaluationReport, TestbedStore

    store = TestbedStore(str(tmp_path / "tb"))
    os.makedirs(store.root, exist_ok=True)
    # a pre-'failures' 6-column file already in the evaluations dir
    legacy = spark.createDataFrame(
        [("old-eid", "t1", 1.0, 0.5, "{}", "{}")],
        "eid STRING, tid STRING, evaluated DOUBLE, correctness DOUBLE, "
        "settings STRING, report STRING",
    )
    legacy.coalesce(1).write.mode("overwrite").parquet(store._p("evaluations"))

    eid = store.insert_evaluation(
        spark,
        EvaluationReport(tid="t1", correctness=0.75, by_topic={"g": 0.75},
                         failures=[{"question": "q", "agent_answer": "a"}],
                         settings={"k": 1}),
    )
    # the new row's failures survive footer-schema mixing...
    got = store.get_evaluation(spark, eid)
    assert got["failures"] == [{"question": "q", "agent_answer": "a"}]
    # ...the legacy row reads as failure-less instead of being dropped
    old = store.get_evaluation(spark, "old-eid")
    assert old["failures"] == []
    both = store.get_evaluations(spark, "t1")
    assert both.count() == 2
    assert "failures" in both.columns


# --- rewrite/rescue basename collision --------------------------------------


def test_swap_rewrite_rescues_colliding_basename(spark, tmp_path):
    """A file committed by a concurrent appender AFTER the rewrite's read,
    whose basename collides with a rewritten output file, must survive the
    swap (renamed aside), not be silently dropped with __old."""
    from oaim_sandbox_spark.catalog import VectorStoreCatalog

    cat = VectorStoreCatalog(spark, root=str(tmp_path))
    path = str(tmp_path / "STORE")
    spark.createDataFrame([(i,) for i in range(50)], "id BIGINT").coalesce(1) \
        .write.parquet(path)

    def write_fn(df, tmp):
        df.coalesce(1).write.parquet(tmp)
        # simulate the concurrent append: copy one REWRITTEN output file
        # (same basename => collision) into the live store with 7 new rows
        out = glob.glob(os.path.join(tmp, "*.parquet"))[0]
        late_dir = str(tmp_path / "late")
        spark.createDataFrame([(1000 + i,) for i in range(7)], "id BIGINT") \
            .coalesce(1).write.parquet(late_dir)
        late = glob.glob(os.path.join(late_dir, "*.parquet"))[0]
        shutil.copy(late, os.path.join(path, os.path.basename(out)))

    cat._swap_rewrite(path, "__compacting", write_fn)
    back = spark.read.parquet(path)
    assert back.count() == 57
    assert back.filter("id >= 1000").count() == 7


# --- search_batch query-id typing -------------------------------------------


def test_pq_search_batch_rejects_non_integral_qid(spark):
    from oaim_sandbox_spark.operators.ann import PQIndex

    rng = np.random.default_rng(3)
    emb = spark.createDataFrame(
        [(i, rng.standard_normal(8).tolist()) for i in range(40)],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    pq = PQIndex(m=2, k=4, dim=8, seed=3).fit(emb)
    codes = pq.encode(emb)
    bad = spark.createDataFrame(
        [(1.5, [0.0] * 8)], "query_id DOUBLE, query_vec ARRAY<DOUBLE>"
    )
    with pytest.raises(ValueError, match="string or integral"):
        pq.search_batch(codes, bad, k=3)


def test_pq_search_batch_int_qids_from_schema(spark):
    from oaim_sandbox_spark.operators.ann import PQIndex

    rng = np.random.default_rng(4)
    emb = spark.createDataFrame(
        [(i, rng.standard_normal(8).tolist()) for i in range(40)],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    pq = PQIndex(m=2, k=4, dim=8, seed=3).fit(emb)
    codes = pq.encode(emb)
    qdf = spark.createDataFrame(
        [(7, rng.standard_normal(8).tolist())], "query_id INT, query_vec ARRAY<DOUBLE>"
    )
    out = pq.search_batch(codes, qdf, k=3).collect()
    assert len(out) == 3 and all(r["query_id"] == 7 for r in out)


def test_ivf_search_batch_rejects_non_integral_qid(spark, tmp_path):
    from oaim_sandbox_spark.operators.ann import IVFIndex

    rng = np.random.default_rng(5)
    df = spark.createDataFrame(
        [(i, rng.standard_normal(4).tolist()) for i in range(60)],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    idx = IVFIndex(n_centroids=2, seed=3).fit(df)
    path = str(tmp_path / "ivf")
    idx.write_partitioned(df, path)
    bad = spark.createDataFrame(
        [(2.5, [0.0] * 4)], "query_id DOUBLE, query_vec ARRAY<DOUBLE>"
    )
    with pytest.raises(ValueError, match="string or integral"):
        idx.search_batch(spark, path, bad, k=3)


def test_no_positional_fraction_with_seed_kwarg_in_sample_calls():
    """Repo-wide lint for the PySpark sample() footgun: a call like
    df.sample(0.2, seed=3) routes the POSITIONAL float into withReplacement,
    and the shim then reads the seed from the (absent) positional fraction
    slot — silently IGNORING seed= and leaving the sample unseeded
    (pyspark _preapare_args_for_sample, third branch). Every seeded sample
    must pass fraction= by keyword."""
    import ast
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "oaim_sandbox_spark")
    offenders = []
    for path in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        tree = ast.parse(open(path).read())
        for node in ast.walk(tree):
            if not (isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "sample"):
                continue
            has_seed_kw = any(k.arg == "seed" for k in node.keywords)
            has_frac_kw = any(k.arg == "fraction" for k in node.keywords)
            if has_seed_kw and node.args and not has_frac_kw:
                offenders.append(f"{os.path.relpath(path, root)}:{node.lineno}")
    assert not offenders, (
        f"sample() with positional fraction + seed kwarg (seed is IGNORED): {offenders}"
    )


def test_no_new_bare_decimal_literals_in_templates():
    """Ratchet lint for the decimal-literal footgun: Spark parses bare
    decimal literals (1.0, 1000000.0) as DECIMAL, so `x * 1.0` arithmetic
    and AVG(CASE ... THEN 1.0 ...) silently type DECIMAL where DuckDB
    yields DOUBLE — it truncated AVG coverage to 5 decimals and typed
    hash_unit's quotient DECIMAL before CAST fixes (round-6 finds; the
    round-3 'DECIMAL-drift casts' were the same class). The existing sites
    are grandfathered (each is output-CAST-wrapped and certified); NEW
    arithmetic must use CAST(... AS DOUBLE) or portable.hash_unit.
    Counts may only DECREASE."""
    import re

    frozen = {
        "queries_dedup.py": 2,
        "queries_extended.py": 12,
        "queries_textstats.py": 3,
        "queries_training.py": 4,
        "queries_core.py": 0,
        "queries_relational.py": 0,
        "queries_registry.py": 0,
    }
    pat = re.compile(
        r"\* 1\.0|/ 1\.0[^0-9]|THEN 1\.0|THEN 0\.0|/ 1000001\.0"
        r"|\+ 0\.5\) / 1000000\.0|\* 1000000\.0"
    )
    base = os.path.join(os.path.dirname(__file__), "..", "oaim_sandbox_spark")
    for fname, cap in frozen.items():
        src = open(os.path.join(base, fname)).read()
        n = len(pat.findall(src))
        assert n <= cap, (
            f"{fname}: {n} bare-decimal-literal arithmetic sites (frozen cap {cap}). "
            "New SQL must CAST to DOUBLE (or use portable.hash_unit) instead of "
            "bare decimal literals - Spark types them DECIMAL and drifts from DuckDB."
        )
