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


def test_recall_block_failure_is_isolated(spark, monkeypatch):
    """Round-6 review: one recall flavor failing (here: its store prep
    raising) must report that block as empty and leave the other blocks'
    numbers intact — the shared harness must not collapse all three blocks
    into one failure domain."""
    real_prepare = bench._prepare_recall

    def exploding(spark_, sf_dir, flavor, k, n_queries):
        if flavor == "realistic":
            raise RuntimeError("injected prep failure")
        return real_prepare(spark_, sf_dir, flavor, k, n_queries)

    monkeypatch.setattr(bench, "_prepare_recall", exploding)
    out = bench.ann_recall_all(spark, "/root/testdata/sf0.001")
    assert out["recall_realistic"] == {}
    assert out["recall"] and out["recall_adversarial"]
    assert all(0.0 <= v <= 1.0 for v in out["recall"].values())


def test_host_calibration_probes(spark):
    """The calibration anchor must return small positive fixed-work timings
    and survive into the compact stdout line (it is how a reader separates
    shared-host noise from plan regressions across rounds)."""
    import json

    cal = bench.host_calibration(spark)
    assert set(cal) == {"blas_matmul_s", "jvm_range_agg_s"}
    assert all(0 < v < 60 for v in cal.values())
    full = {"metric": "m", "value": 1.0, "unit": "sec", "queries": {},
            "host_calibration": cal, "sf": 0.1}
    line = bench.compact_bench_line(full)
    assert json.loads(line)["host_calibration"] == cal


def test_stage_metrics_tracker_attributes_shuffle(spark):
    """StageMetricsTracker deltas: a shuffling query shows shuffle-write
    bytes; a scan-only query shows ~none; the tracker only walks NEW stages
    (its last-seen id advances)."""
    from pyspark.sql import functions as F

    import bench

    tracker = bench.StageMetricsTracker(spark)
    assert tracker.delta() is not None  # baseline snapshot
    spark.range(1_000_000).withColumn("k", F.col("id") % 97).groupBy("k").count().collect()
    d_shuffle = tracker.delta()
    assert d_shuffle is not None and d_shuffle[0] > 0
    last_after_shuffle = tracker._last
    spark.range(1000).selectExpr("sum(id)").collect()  # partial-agg only
    d_scan = tracker.delta()
    assert d_scan is not None and d_scan[0] <= d_shuffle[0] / 10
    assert tracker._last > last_after_shuffle


class _FakeStage:
    def __init__(self, sid, status, sw):
        self._sid, self._status, self._sw = sid, status, sw

    def stageId(self):
        return self._sid

    def status(self):
        return self._status

    def shuffleWriteBytes(self):
        return self._sw

    def diskBytesSpilled(self):
        return 0

    def memoryBytesSpilled(self):
        return 0


class _FakeStore:
    """Stand-in for the JVM AppStatusStore: stageList newest-first."""

    def __init__(self):
        self.stages = {}

    def stageList(self, *_args):
        ordered = [self.stages[k] for k in sorted(self.stages, reverse=True)]

        class _L:
            def size(self_inner):
                return len(ordered)

            def apply(self_inner, i):
                return ordered[i]

        return _L()


class _FakeGateway:
    class jvm:  # noqa: N801 — mimics py4j attribute shape
        double = float

        class java:  # noqa: N801
            class util:  # noqa: N801
                ArrayList = list

    def new_array(self, _t, _n):
        return []


def _fake_tracker(store):
    import bench

    t = bench.StageMetricsTracker.__new__(bench.StageMetricsTracker)
    t._ok, t._last, t._pending = True, -1, set()
    t._store, t._gw = store, _FakeGateway()
    return t


def test_stage_metrics_tracker_revisits_straddling_stage():
    """A stage still ACTIVE at snapshot time must NOT be counted with its
    partial bytes and frozen behind the high-water mark; it is carried
    pending and counted exactly once, with final bytes, when terminal."""
    store = _FakeStore()
    tracker = _fake_tracker(store)
    store.stages[1] = _FakeStage(1, "COMPLETE", 100)
    store.stages[2] = _FakeStage(2, "ACTIVE", 50)  # mid-run partial bytes
    d1 = tracker.delta()
    assert d1[0] == 100  # ACTIVE stage excluded, not partially counted
    assert tracker._pending == {2}
    # stage 2 finishes (final bytes 80) while stage 3 also completes
    store.stages[2] = _FakeStage(2, "COMPLETE", 80)
    store.stages[3] = _FakeStage(3, "COMPLETE", 10)
    d2 = tracker.delta()
    assert d2[0] == 90  # 80 (revisited, final) + 10 — stage 2 once, not twice
    assert tracker._pending == set()
    # nothing new: delta is zero and already-counted ids stay counted
    assert tracker.delta()[0] == 0


def test_stage_metrics_tracker_drops_evicted_pending():
    """A pending stage evicted from the status store before completing is
    dropped from the pending set rather than pinning the re-scan cutoff."""
    store = _FakeStore()
    tracker = _fake_tracker(store)
    store.stages[5] = _FakeStage(5, "ACTIVE", 7)
    assert tracker.delta()[0] == 0 and tracker._pending == {5}
    del store.stages[5]
    store.stages[6] = _FakeStage(6, "COMPLETE", 3)
    assert tracker.delta()[0] == 3
    assert tracker._pending == set()
