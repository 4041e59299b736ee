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
