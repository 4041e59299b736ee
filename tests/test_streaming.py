"""Structured Streaming ingest: availableNow file-stream through the full
split->dedup->merge->embed pipeline, idempotent across restarts; watermarked
windowed aggregation."""

import json

import pytest

from oaim_sandbox_spark.streaming.ingest import stream_ingest, windowed_event_counts


def _write_landing(tmp_path, name, docs):
    lines = "\n".join(json.dumps(d) for d in docs)
    (tmp_path / name).write_text(lines)


def test_stream_ingest_end_to_end(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    _write_landing(landing, "batch1.jsonl", [
        {"doc_id": "d1", "text": "alpha beta " * 30, "source": "s1"},
        {"doc_id": "d2", "text": "gamma delta " * 30, "source": "s2"},
    ])
    q = stream_ingest(spark, str(landing), store, ckpt, chunk_size=100, chunk_overlap=10)
    q.awaitTermination(60)
    first = spark.read.parquet(store)
    n1 = first.count()
    assert n1 > 0
    assert set(first.columns) == {"id", "text", "source", "start_index", "embedding"}

    # second file arrives; one doc is a pure duplicate -> content-id merge
    # must add only the genuinely new chunks
    _write_landing(landing, "batch2.jsonl", [
        {"doc_id": "d3", "text": "alpha beta " * 30, "source": "s3"},   # dup of d1 text
        {"doc_id": "d4", "text": "epsilon zeta " * 30, "source": "s4"},
    ])
    q2 = stream_ingest(spark, str(landing), store, ckpt, chunk_size=100, chunk_overlap=10)
    q2.awaitTermination(60)
    after = spark.read.parquet(store)
    assert after.count() > n1
    # idempotency: content ids unique across the whole store
    assert after.select("id").distinct().count() == after.count()


def test_windowed_event_counts_streaming(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        {"ts": "2024-01-01T00:10:00", "event_type": "click", "value": 1.0},
        {"ts": "2024-01-01T00:20:00", "event_type": "click", "value": 2.0},
        {"ts": "2024-01-01T01:05:00", "event_type": "view", "value": 3.0},
    ]
    (src / "e.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
        .json(str(src))
    )
    agg = windowed_event_counts(stream, watermark="1 minute", window="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = {(str(r.window_start), r.event_type): r.n_events for r in spark.sql("SELECT * FROM win_counts").collect()}
    assert out[("2024-01-01 00:00:00", "click")] == 2
    assert out[("2024-01-01 01:00:00", "view")] == 1


def test_stream_ingest_checkpoint_recovery(spark, tmp_path):
    """Restart with the same checkpoint: already-seen landing files are NOT
    reprocessed (file-source offsets in the checkpoint), new files are, and a
    third restart with nothing new is a no-op — exactly-once ingest."""
    landing = tmp_path / "landing"
    landing.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    _write_landing(landing, "a.jsonl", [{"doc_id": "a1", "text": "alpha " * 30, "source": "a"}])

    q = stream_ingest(spark, str(landing), store, ckpt, chunk_size=50, chunk_overlap=0)
    q.awaitTermination(60)
    n1 = spark.read.parquet(store).count()
    assert n1 > 0

    _write_landing(landing, "b.jsonl", [{"doc_id": "b1", "text": "beta " * 30, "source": "b"}])
    q = stream_ingest(spark, str(landing), store, ckpt, chunk_size=50, chunk_overlap=0)
    q.awaitTermination(60)
    after = spark.read.parquet(store)
    n2 = after.count()
    assert n2 > n1  # new file ingested
    assert after.groupBy("id").count().filter("count > 1").count() == 0  # no dupes

    q = stream_ingest(spark, str(landing), store, ckpt, chunk_size=50, chunk_overlap=0)
    q.awaitTermination(60)
    assert spark.read.parquet(store).count() == n2  # no-op restart


def test_running_user_stats_multibatch(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): two micro-batches
    (maxFilesPerTrigger=1) over the same keys — emissions must be CUMULATIVE
    across batches, and the final emission per key must equal the batch
    GROUP BY over all the data."""
    import json as _json

    from oaim_sandbox_spark.streaming.stateful import running_user_stats

    src = tmp_path / "ev"
    src.mkdir()
    b1 = [{"user_id": 1, "value": 1.0}, {"user_id": 1, "value": 2.0},
          {"user_id": 2, "value": 5.0}]
    b2 = [{"user_id": 1, "value": 4.0}, {"user_id": 3, "value": 7.0}]
    (src / "f1.jsonl").write_text("\n".join(_json.dumps(r) for r in b1))
    (src / "f2.jsonl").write_text("\n".join(_json.dumps(r) for r in b2))

    stream = (
        spark.readStream.schema("user_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("run_stats")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM run_stats").collect()
    # user 1 was touched by both batches -> two emissions, strictly increasing n
    u1 = sorted([r for r in rows if r.user_id == 1], key=lambda r: r.n_events)
    assert len(u1) == 2
    assert (u1[0].n_events, u1[0].sum_value) == (2, 3.0)
    assert (u1[1].n_events, u1[1].sum_value, u1[1].max_value) == (3, 7.0, 4.0)
    # final emission per key == batch GROUP BY over everything
    final = {r.user_id: r for r in rows
             if r.n_events == max(x.n_events for x in rows if x.user_id == r.user_id)}
    assert (final[2].n_events, final[2].sum_value, final[2].max_value) == (1, 5.0, 5.0)
    assert (final[3].n_events, final[3].sum_value, final[3].max_value) == (1, 7.0, 7.0)


def test_transform_with_state_gated_or_agrees(spark):
    """transformWithState (Spark 4 successor to applyInPandasWithState) needs
    protobuf for its driver-worker protocol; where present, its running
    stats must equal the applyInPandasWithState operator's (shared batch
    oracle). Where absent, the query entry must NOT be registered."""
    from oaim_sandbox_spark import queries as Q

    if not Q._HAS_PROTOBUF:
        assert "streaming_user_stats_tws" not in Q.TEMPLATES
        assert "streaming_user_stats_tws" not in Q.SPARK_OVERRIDES
        pytest.skip("protobuf not available; transformWithState gated off")
    sf = "/root/testdata/sf0.001"
    old = Q.spark_queries()["streaming_user_stats"](spark, sf).collect()
    new = Q.spark_queries()["streaming_user_stats_tws"](spark, sf).collect()
    assert [tuple(r) for r in old] == [tuple(r) for r in new]


def test_advance_user_stats_shared_transition():
    """The pure state transition BOTH stateful wrappers call
    (applyInPandasWithState and the protobuf-gated transformWithState twin
    share advance_user_stats verbatim) — exercised directly so the tws
    entry's logic runs in this container even while its wrapper is gated
    (VERDICT r5 task 2). Folding batch-by-batch must equal one flat fold,
    empty frames must be no-ops, and the emission must carry the running
    totals."""
    import pandas as pd

    from oaim_sandbox_spark.streaming.stateful import (
        INITIAL_USER_STATS,
        advance_user_stats,
    )

    b1 = pd.DataFrame({"user_id": [1, 1], "value": [1.0, 2.0]})
    b2 = pd.DataFrame({"user_id": [1], "value": [4.0]})
    empty = pd.DataFrame({"user_id": [], "value": []})

    state, out1 = advance_user_stats((1,), [b1, empty], INITIAL_USER_STATS)
    assert state == (2, 3.0, 2.0)
    assert out1.iloc[0].to_dict() == {
        "user_id": 1, "n_events": 2, "sum_value": 3.0, "max_value": 2.0}
    state, out2 = advance_user_stats((1,), [b2], state)
    assert state == (3, 7.0, 4.0)
    # two incremental folds == one flat fold == the batch GROUP BY
    flat, _ = advance_user_stats((1,), [b1, b2], INITIAL_USER_STATS)
    assert flat == state
    allv = pd.concat([b1, b2])["value"]
    assert flat == (int(allv.count()), float(allv.sum()), float(allv.max()))
    # an untouched-state emission still reports the prior totals
    same, out3 = advance_user_stats((1,), [empty], state)
    assert same == state and out3.iloc[0]["n_events"] == 3


def test_stream_ingest_with_ivf_ann_leg(spark, tmp_path):
    """Streaming ANN maintenance: each batch's fresh chunks append into the
    centroid-partitioned store against a FIXED fitted quantizer — partitions
    grow in place, no per-batch refit, and the ANN store stays row-for-row
    consistent with the flat vector store."""
    from pyspark.sql import functions as F

    from oaim_sandbox_spark.operators.ann import IVFIndex
    from oaim_sandbox_spark.operators.embed import mock_embed_column

    landing = tmp_path / "landing"
    landing.mkdir()
    store, ann, ckpt = (str(tmp_path / d) for d in ("store", "ann", "ckpt"))

    # fit the coarse quantizer on a bootstrap sample of the same embedding space
    boot = spark.createDataFrame(
        [(f"b{i}", f"word{i} filler " * 20) for i in range(24)], "id STRING, text STRING"
    )
    idx = IVFIndex(n_centroids=4, seed=2).fit(mock_embed_column(boot, text_col="text", dim=64))

    _write_landing(landing, "batch1.jsonl", [
        {"doc_id": "d1", "text": "alpha beta " * 30, "source": "s1"},
        {"doc_id": "d2", "text": "gamma delta " * 30, "source": "s2"},
    ])
    q = stream_ingest(spark, str(landing), store, ckpt, chunk_size=100, chunk_overlap=10,
                      ivf_index=idx, ann_store_dir=ann)
    q.awaitTermination(60)
    _write_landing(landing, "batch2.jsonl", [
        {"doc_id": "d4", "text": "epsilon zeta " * 30, "source": "s4"},
    ])
    q2 = stream_ingest(spark, str(landing), store, ckpt, chunk_size=100, chunk_overlap=10,
                       ivf_index=idx, ann_store_dir=ann)
    q2.awaitTermination(60)

    flat = spark.read.parquet(store)
    part = spark.read.parquet(ann)
    assert part.count() == flat.count()
    assert "centroid" in part.columns
    # every row landed in a valid partition of the FIXED quantizer
    cents = {r.centroid for r in part.select("centroid").distinct().collect()}
    assert cents <= set(range(4))
    # assignment matches a fresh batch-side assignment (no drift, no refit)
    expected = {r.id: r.centroid for r in idx.assign(flat.select("id", "embedding")).collect()}
    got = {r.id: r.centroid for r in part.select("id", "centroid").collect()}
    assert got == expected


def test_stream_ingest_classifier_gate(spark, tmp_path):
    """The streaming classifier gate drops low-score docs before chunking —
    same model (DEFAULT_WEIGHTS) and threshold semantics as the batch
    curate_corpus stage, so batch and continuous curation agree."""
    landing = tmp_path / "landing"
    landing.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    _write_landing(landing, "b1.jsonl", [
        {"doc_id": "good", "text": "vector hash vector stream query " * 10, "source": "s1"},
        {"doc_id": "bad", "text": "slow big slow big customer line " * 10, "source": "s2"},
    ])
    q = stream_ingest(spark, str(landing), store, ckpt, chunk_size=100,
                      chunk_overlap=0, classifier_min_score=0.5)
    q.awaitTermination(60)
    out = spark.read.parquet(store)
    # split_fixed carries the originating doc id in `source` (splitter
    # metadata semantics) — only the positive-vocab doc must survive
    sources = {r["source"] for r in out.select("source").distinct().collect()}
    assert sources == {"good"}


def test_stream_ingest_near_dedup_leg(spark, tmp_path):
    """Steady-state streaming near-dedup: batch 2's near-copy of a batch-1
    doc is dropped by probing the persisted signature store (the corpus text
    is never re-read); genuinely new docs pass and their signatures land in
    the store for batch 3."""
    landing = tmp_path / "landing"
    landing.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    sig_dir = str(tmp_path / "sigs")
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    _write_landing(landing, "b1.jsonl", [
        {"doc_id": "orig", "text": base, "source": "s1"},
    ])
    q = stream_ingest(spark, str(landing), store, ckpt, chunk_size=1000, chunk_overlap=0,
                      near_dedup_jaccard=0.5, sig_dir=sig_dir)
    q.awaitTermination(60)
    n1 = spark.read.parquet(store).count()
    assert n1 > 0
    assert spark.read.parquet(sig_dir).count() == 1

    _write_landing(landing, "b2.jsonl", [
        {"doc_id": "near", "text": base + "one extra tail token", "source": "s2"},  # near-dup
        {"doc_id": "fresh", "text": "totally different words entirely " * 10, "source": "s3"},
    ])
    q2 = stream_ingest(spark, str(landing), store, ckpt, chunk_size=1000, chunk_overlap=0,
                       near_dedup_jaccard=0.5, sig_dir=sig_dir)
    q2.awaitTermination(60)
    after = spark.read.parquet(store)
    srcs = {r["source"] for r in after.select("source").distinct().collect()}
    assert "near" not in srcs        # near-dup dropped before chunking
    assert "fresh" in srcs and "orig" in srcs
    assert spark.read.parquet(sig_dir).count() == 2  # orig + fresh, not near

    # signature-store boundedness + revision-awareness (ADVICE r3 + round-4
    # review): a REVISED document reusing an existing doc_id appends its new
    # content's signature (an id-only anti-join would freeze the stale
    # signature, making near-dups of the revised content undetectable), but
    # the store stays keyed by (doc_id, signature) so redeliveries of the
    # SAME content never grow it
    _write_landing(landing, "b3.jsonl", [
        {"doc_id": "fresh", "text": "revised body with unrelated vocabulary " * 10, "source": "s4"},
    ])
    q3 = stream_ingest(spark, str(landing), store, ckpt, chunk_size=1000, chunk_overlap=0,
                       near_dedup_jaccard=0.5, sig_dir=sig_dir)
    q3.awaitTermination(60)
    sigs = spark.read.parquet(sig_dir)
    assert sigs.count() == 3          # orig + fresh + fresh's revision
    assert sigs.select("doc_id").distinct().count() == 2
    assert sigs.select("doc_id", "signature").distinct().count() == 3

    # a near-copy of the REVISED content must now be caught
    _write_landing(landing, "b4.jsonl", [
        {"doc_id": "copycat", "text": "revised body with unrelated vocabulary " * 10 + "tail", "source": "s5"},
    ])
    q4 = stream_ingest(spark, str(landing), store, ckpt, chunk_size=1000, chunk_overlap=0,
                       near_dedup_jaccard=0.5, sig_dir=sig_dir)
    q4.awaitTermination(60)
    srcs4 = {r["source"] for r in spark.read.parquet(store).select("source").distinct().collect()}
    assert "s5" not in srcs4          # dropped against the revision's signature
    assert spark.read.parquet(sig_dir).count() == 3  # and nothing appended


def test_compact_signature_store(spark, tmp_path):
    """Many tiny per-batch signature files compact to a few, duplicate
    doc_ids collapse first-wins, and the near-dup probe still works against
    the compacted store."""
    import glob

    from oaim_sandbox_spark.streaming.ingest import compact_signature_store
    from oaim_sandbox_spark.operators.dedup import minhash_signatures

    sig_dir = str(tmp_path / "sigs")
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    for i in range(6):  # 6 append batches, one file each; batch 5 re-appends d0's exact row
        j = i if i < 5 else 0
        df = spark.createDataFrame(
            [(f"d{j}", base + f" tail{j}")], "doc_id STRING, text STRING"
        )
        minhash_signatures(df).coalesce(1).write.mode("append").parquet(sig_dir)
    assert len(glob.glob(f"{sig_dir}/*.parquet")) >= 6

    n = compact_signature_store(spark, sig_dir, target_files=2)
    assert n == 5  # d0's duplicate (doc_id, signature) row collapsed
    assert len(glob.glob(f"{sig_dir}/*.parquet")) <= 2
    after = spark.read.parquet(sig_dir)
    assert after.count() == 5
    assert after.select("doc_id").distinct().count() == 5

    assert compact_signature_store(spark, str(tmp_path / "missing")) == 0


def test_signature_store_crash_recovery(spark, tmp_path):
    """A compaction killed between its two renames leaves the store under
    __old; recovery (run by compaction AND by every probe) must restore it
    and clear leftovers, so dedup history is never silently restarted."""
    import os

    from oaim_sandbox_spark.operators.dedup import minhash_signatures
    from oaim_sandbox_spark.streaming.ingest import (
        compact_signature_store,
        recover_signature_store,
    )

    sig_dir = str(tmp_path / "sigs")
    df = spark.createDataFrame([("d0", "alpha beta gamma delta " * 10)], "doc_id STRING, text STRING")
    minhash_signatures(df).write.mode("append").parquet(sig_dir)

    # simulate the crash window: sig_dir renamed away, tmp left behind
    os.rename(sig_dir, sig_dir + "__old")
    os.makedirs(sig_dir + "__compacting")
    recover_signature_store(sig_dir)
    assert os.path.isdir(sig_dir)
    assert not os.path.isdir(sig_dir + "__old")
    assert not os.path.isdir(sig_dir + "__compacting")
    assert spark.read.parquet(sig_dir).count() == 1

    # compaction after recovery works and is idempotent
    assert compact_signature_store(spark, sig_dir) == 1
    assert compact_signature_store(spark, sig_dir) == 1


def test_compaction_lock_blocks_probe_and_concurrent_compaction(spark, tmp_path):
    """While a fresh compaction lock is held: recover_signature_store must
    NOT delete the compactor's live __compacting dir, a second compaction
    fails fast, and the batch path's wait_for_compaction times out instead
    of racing the swap. A stale lock (crashed compactor) is broken."""
    import os
    import time

    import pytest

    from oaim_sandbox_spark.operators.dedup import minhash_signatures
    from oaim_sandbox_spark.streaming.ingest import (
        compact_signature_store,
        recover_signature_store,
        wait_for_compaction,
    )

    sig_dir = str(tmp_path / "sigs")
    df = spark.createDataFrame(
        [("d0", "alpha beta gamma delta " * 10)], "doc_id STRING, text STRING"
    )
    minhash_signatures(df).write.mode("append").parquet(sig_dir)

    lock = sig_dir + "__lock"
    open(lock, "w").write("424242")
    os.makedirs(sig_dir + "__compacting")

    recover_signature_store(sig_dir)  # no-op under a fresh lock
    assert os.path.isdir(sig_dir + "__compacting")
    assert os.path.exists(lock)
    with pytest.raises(RuntimeError, match="already in progress"):
        compact_signature_store(spark, sig_dir)
    with pytest.raises(RuntimeError, match="still held"):
        wait_for_compaction(sig_dir, timeout=0.3, poll=0.05)

    # stale lock: recovery breaks it and cleans the leftovers
    stale = time.time() - 7200
    os.utime(lock, (stale, stale))
    wait_for_compaction(sig_dir, timeout=0.3)  # stale -> not fresh -> returns
    recover_signature_store(sig_dir)
    assert not os.path.exists(lock)
    assert not os.path.isdir(sig_dir + "__compacting")
    assert compact_signature_store(spark, sig_dir) == 1
    assert not os.path.exists(lock)  # released on completion


def test_compaction_rescues_late_appended_signatures(spark, tmp_path, monkeypatch):
    """A batch append that lands between compaction's read-snapshot and the
    dir swap must survive into the compacted store — lost signature files
    would silently re-admit near-duplicates later."""
    from oaim_sandbox_spark.operators.dedup import minhash_signatures
    from oaim_sandbox_spark.streaming import ingest as I

    sig_dir = str(tmp_path / "sigs")
    d0 = spark.createDataFrame(
        [("d0", "alpha beta gamma delta " * 10)], "doc_id STRING, text STRING"
    )
    minhash_signatures(d0).coalesce(1).write.mode("append").parquet(sig_dir)

    late = spark.createDataFrame(
        [("d9", "omega psi chi phi upsilon " * 10)], "doc_id STRING, text STRING"
    )
    import os as _os

    orig_rename = _os.rename
    appended = {"done": False}

    def racing_rename(src, dst):
        # inject the racing append at the first rename (sig_dir -> __old):
        # the late file lands in sig_dir just before it is renamed away
        if not appended["done"] and dst.endswith("__old"):
            appended["done"] = True
            minhash_signatures(late).coalesce(1).write.mode("append").parquet(sig_dir)
        return orig_rename(src, dst)

    monkeypatch.setattr(_os, "rename", racing_rename)
    n = I.compact_signature_store(spark, sig_dir, target_files=1)
    monkeypatch.undo()
    assert appended["done"]
    assert n == 2
    after = spark.read.parquet(sig_dir)
    assert {r["doc_id"] for r in after.select("doc_id").distinct().collect()} == {"d0", "d9"}
    # the rescue must preserve the store's distinct-(doc_id, signature)
    # invariant even when the late rows were already swept into the read
    assert after.count() == after.select("doc_id", "signature").distinct().count() == 2


def test_tws_processor_simulated_runtime_matches_batch_oracle():
    """Drive the REAL transformWithState processor class (init /
    handleInputRows / close) with a duck-typed handle that implements the
    tws value-state contract (exists/get/update) — the vanilla-runtime
    simulation for the protobuf-gated wrapper (VERDICT r6 task 7). After a
    multi-batch, multi-key run, compacting each key's last emission must
    equal the flat GROUP BY — the same oracle contract the certified
    applyInPandasWithState twin passes at driver time. The only line this
    leaves unexecuted in any container is the transformWithStateInPandas
    call itself."""
    import pandas as pd

    from oaim_sandbox_spark.streaming.stateful import _make_running_stats_processor

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema):
            return self.states.setdefault(name, FakeValueState())

    RunningStats = _make_running_stats_processor()
    batches = [
        pd.DataFrame({"user_id": [1, 1, 2], "value": [1.0, 4.0, 10.0]}),
        pd.DataFrame({"user_id": [2, 1], "value": [2.0, 6.0]}),
        pd.DataFrame({"user_id": [3], "value": [-5.0]}),
    ]
    procs: dict[int, object] = {}
    last: dict[int, dict] = {}
    for b in batches:  # per micro-batch, per touched key — the tws grouping
        for uid, grp in b.groupby("user_id"):
            p = procs.get(uid)
            if p is None:
                p = procs[uid] = RunningStats()
                p.init(FakeHandle())
            (out,) = list(p.handleInputRows((uid,), [grp], None))
            last[uid] = out.iloc[0].to_dict()
    for p in procs.values():
        p.close()
    flat = pd.concat(batches).groupby("user_id")["value"].agg(["count", "sum", "max"])
    for uid, row in flat.iterrows():
        got = last[uid]
        assert (got["n_events"], got["sum_value"], got["max_value"]) == (
            int(row["count"]), float(row["sum"]), float(row["max"])
        ), uid


def test_streaming_quality_gate_multibatch_converges_to_batch(spark, tmp_path):
    """streaming_quality_gate's complete-mode agg must CONVERGE across
    micro-batches (maxFilesPerTrigger=1): after batch 1 the monitor shows
    only source A; after all batches the memory-sink table equals the
    batch GROUP BY over everything — the continuous-ingest contract the
    registry entry's one-shot oracle can't see."""
    import json as _json

    from oaim_sandbox_spark.queries_extended import _quality_gate_sql

    src = tmp_path / "docs"
    src.mkdir()
    good = "the quick brown fox jumps over the lazy dog and then some more words " * 20
    bad = "1234567890 42 0xdeadbeef 777"
    b1 = [{"doc_id": 1, "text": good, "source": "A"},
          {"doc_id": 2, "text": bad, "source": "A"}]
    b2 = [{"doc_id": 3, "text": good, "source": "B"},
          {"doc_id": 4, "text": good, "source": "A"}]
    (src / "f1.jsonl").write_text("\n".join(_json.dumps(r) for r in b1))
    (src / "f2.jsonl").write_text("\n".join(_json.dumps(r) for r in b2))

    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING, source STRING")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    stream.createOrReplaceTempView("qgate_stream_docs")
    agg = spark.sql(_quality_gate_sql("spark", rel="qgate_stream_docs"))
    q = (
        agg.writeStream.format("memory")
        .queryName("qgate_run")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    # the multi-batch premise must actually hold (review r9c): if
    # maxFilesPerTrigger were ignored, a single batch would trivially
    # equal the batch SQL and prove nothing
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 2
    got = {r["source"]: r for r in spark.sql("SELECT * FROM qgate_run").collect()}
    # final state == batch GROUP BY over ALL files
    spark.read.schema("doc_id BIGINT, text STRING, source STRING") \
        .json(str(src)).createOrReplaceTempView("qgate_batch_docs")
    want = {r["source"]: r for r in
            spark.sql(_quality_gate_sql("spark", rel="qgate_batch_docs")).collect()}
    assert set(got) == set(want) == {"A", "B"}
    for s in want:
        assert (got[s]["n_docs"], got[s]["n_pass"]) == (want[s]["n_docs"], want[s]["n_pass"]), s
        assert got[s]["mean_quality"] == want[s]["mean_quality"], s
    # the gate actually separates the planted docs: the junk doc fails
    assert want["A"]["n_docs"] == 3 and want["A"]["n_pass"] == 2
    assert want["B"]["n_pass"] == 1
    spark.catalog.dropTempView("qgate_stream_docs")
    spark.catalog.dropTempView("qgate_batch_docs")
