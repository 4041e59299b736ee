"""Physical-plan regression guards: the properties PLAN_AUDIT.md records,
asserted as tests so a future change can't silently regress them.

These analyze plans only (no execution) — the whole registry's plans build
in seconds."""

import pytest

from oaim_sandbox_spark import queries as Q

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    """name -> executed-plan string for every template-backed registry query."""
    Q.register_views(spark, SF)
    out = {}
    for name in Q.TEMPLATES:
        if name in Q.SPARK_OVERRIDES:
            # override runners materialize intermediates (collect/checkpoint)
            # — their plans are audited at execution time by plan_audit; the
            # template body here is the DuckDB-oracle form only
            continue
        df = spark.sql(Q.TEMPLATES[name]("spark"))
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_row_python_udf_anywhere(plans):
    """The hot path stays JVM-side: no query in the SQL registry may plan a
    row-at-a-time Python eval (BatchEvalPython). (Arrow-batched mapInPandas
    lives only in the operator runners — multimodal/bpe/embed — by design.)"""
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not offenders, offenders


def test_topk_queries_use_topk_operator(plans):
    """Exact top-k retrieval compiles to TakeOrderedAndProject (no global
    sort, no store shuffle)."""
    for name in ("topk_cosine", "topk_euclidean", "topk_dot_product", "filtered_topk_label",
                 "binary_quant_topk"):
        assert "TakeOrderedAndProject" in plans[name], name


def test_single_exchange_aggregation_family(plans):
    """Representatives of the one-grouped-agg family stay at one hash
    exchange (map-side partial + final)."""
    for name in ("k_anonymity_audit", "dp_noisy_counts"):
        n = plans[name].count("Exchange hashpartitioning")
        assert n <= 1, f"{name}: {n} hash exchanges"


def test_q1_scan_pushes_filter(plans):
    """TPC-H q1's shipdate predicate reaches the parquet scan."""
    p = plans["q1_pricing_summary"]
    assert "PushedFilters: [" in p
    pushed = p.split("PushedFilters: [", 1)[1][:200]
    assert pushed and not pushed.startswith("]")


def test_broadcast_for_small_dims(plans):
    """Dim-sized sides broadcast: the classifier weight table and q5's
    region/nation dims never shuffle the fact side."""
    assert "BroadcastHashJoin" in plans["classifier_quality_scores"]
    assert "BroadcastHashJoin" in plans["q5_local_supplier"]


def test_ntile_curriculum_two_pass_rank_plan(plans):
    """ntile_curriculum_buckets must never plan a corpus-sized
    single-partition window (the r3 verdict's last scale-killer): the Spark
    side computes NTILE's exact bucket assignment as a two-pass distributed
    rank. Invariants: no ntile() anywhere; the row_number window that scans
    the corpus is PARTITIONed by n_chars; the only unpartitioned window is
    the prefix-sum over the per-n_chars count dim (its function references
    the post-aggregate count column, proving its input is dim-sized)."""
    import re

    p = plans["ntile_curriculum_buckets"]
    assert "ntile(" not in p, "global NTILE reappeared"
    rn = [ln for ln in p.splitlines() if "row_number()" in ln]
    assert rn, "two-pass rank missing"
    for ln in rn:
        assert re.search(r"\], \[n_chars#\d+L?\], \[doc_id#", ln), f"unpartitioned corpus window: {ln.strip()[:160]}"
    unpart = [ln for ln in p.splitlines()
              if "windowspecdefinition" in ln and "row_number()" not in ln]
    for ln in unpart:
        assert "sum(c#" in ln, f"unexpected window over non-dim input: {ln.strip()[:160]}"


def test_aqe_skew_join_activates_on_synthetic_skew(spark):
    """Runtime (not static-plan) evidence that AQE's skew-join handling is
    live in this engine's sessions: a sort-merge join whose left side is
    ~90% one key must come out of adaptive execution with skew=true
    (split-and-replicate applied to the oversized partition).

    When salting IS still needed at 100x: AQE splits oversized SHUFFLE
    partitions of a sort-merge join, so post-shuffle join skew self-heals
    — that's this test. It does NOT help a skewed AGGREGATION key (all
    rows of a group must meet in one task regardless of splitting) — the
    two-level salted pre-aggregation in salted_user_counts remains the
    pattern there — and it can't split a broadcast join's driver-side
    build. One more measured caveat this test pins: the optimization is
    suppressed (conservatively, by Spark) when the skewed join FEEDS
    ANOTHER SHUFFLE (e.g. a groupBy on a different key) — measured below:
    the identical skewed join loses its skew=true the moment a groupBy
    consumes it (and forceOptimizeSkewedJoin did not flip it back in this
    Spark build). So at 100x: trailing-join skew self-heals; skew in a
    join that feeds further shuffles needs manual salting — which is why
    the engine keeps the salted pattern alongside AQE. Thresholds here are
    lowered because local test rows are KB-sized; production defaults
    (256 MB / 5x median) trigger the same mechanism at cluster scale."""
    from pyspark.sql import functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # local rows are KB-sized; scale the byte thresholds down so the
        # same 5x-median mechanism that fires at 256 MB fires here
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        # force sort-merge (broadcast would mask the skew entirely)
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        left = spark.range(60_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 100).alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pad"),
        )
        right = spark.range(100).select(
            F.col("id").alias("k"), F.concat(F.lit("dim-"), F.col("id")).alias("name")
        )
        joined = left.join(right, "k")
        assert len(joined.collect()) == 60_000  # every left row matches one dim row
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
        assert "skewed" in final_plan  # AQEShuffleRead split the hot partition

        # the suppression caveat: same join feeding a groupBy on another key
        # is NOT skew-optimized unless forced — pin it so a silent Spark
        # behavior change (either way) is noticed
        agg = left.join(right, "k").groupBy("name").agg(F.count("*").alias("n"))
        assert sum(r["n"] for r in agg.collect()) == 60_000
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in agg_plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_curriculum_approx_no_corpus_window(plans):
    """curriculum_buckets_approx (the continuous-key curriculum path) must
    keep its scale contract: no exact-percentile agg anywhere (the sketch
    carries the cuts), and every unpartitioned window runs over the 10-row
    bucket dim (its function references the post-aggregate count column),
    never the corpus."""
    import re

    p = plans["curriculum_buckets_approx"]
    assert "approx_percentile" in p, "sketch agg missing"
    assert not re.search(r"\bpercentile\(", p), "exact percentile crept in"
    unpart = [
        ln for ln in p.splitlines()
        if "windowspecdefinition" in ln and ln.count("], [") == 1
        and re.search(r"\], \[[^\]]*(ASC|DESC)", ln)
    ]
    for ln in unpart:
        assert "sum(cnt" in ln, f"unexpected window over non-dim input: {ln.strip()[:160]}"
