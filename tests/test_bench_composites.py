"""Smoke tests for bench.py's composite entries at sf0.001 — the bench is
the driver's measurement surface, so its composites need the same
don't-break guarantee as the registry."""

import bench

SF = "/root/testdata/sf0.001"


def test_ingest_pipeline_counts(spark):
    n = bench.ingest_pipeline(spark, SF)
    assert n > 0


def test_curation_pipeline_keeps_most_docs(spark):
    n = bench.curation_pipeline(spark, SF)
    # the synthetic corpus is mostly unique, quality-passing text
    assert 0 < n <= 500


def test_testbed_eval_scaled_correctness(spark):
    v = bench.testbed_eval(spark, SF)
    assert 0 <= v <= 10_000  # correctness x 10^4


def test_classifier_train_improves_loss(spark):
    v = bench.classifier_train(spark, SF)
    assert v > 0  # loss must DROP (units: 1e-4 nats)
