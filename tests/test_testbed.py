"""Testbed (M4): deterministic test-set generation, parquet-backed upsert /
cascade delete / ordered scans (K7-K9, S13), distributed evaluation with
aggregations A1-A3."""

import json

from oaim_sandbox_spark.operators.testbed import (
    TestbedStore,
    evaluate_testset,
    generate_testset,
)


def _chunks(spark):
    return spark.createDataFrame(
        [
            ("c1", "spark runs distributed queries over parquet data " * 3, "topic_a"),
            ("c2", "cats sleep on warm windowsills " * 30, "topic_b"),
            ("c3", "minhash finds near duplicate documents quickly", "topic_a"),
        ],
        "id STRING, text STRING, source STRING",
    )


def test_generate_testset_shape(spark):
    qa = generate_testset(_chunks(spark), n_questions=3).collect()
    assert len(qa) == 3
    for r in qa:
        assert r.reference_context
        assert r.question_type in ("simple", "complex")
        assert r.seed_document_id in ("c1", "c2", "c3")
    # round-robin generator assignment in id order (reference parity:
    # question_generators=[simple_questions, complex_questions])
    types = {r.seed_document_id: r.question_type for r in qa}
    assert types == {"c1": "simple", "c2": "complex", "c3": "simple"}
    by_id = {r.seed_document_id: r for r in qa}
    assert by_id["c1"].question.startswith("What does the passage starting with")
    assert by_id["c2"].question.startswith("Considering the passage beginning")


def test_generate_testset_qa_schema_parity(spark):
    """Field set matches the QATestset frame the reference GUI edits
    (client/content/testbed.py:165-212): question, reference_answer,
    reference_context, conversation_history, metadata."""
    qa = generate_testset(_chunks(spark), n_questions=3)
    cols = set(qa.columns)
    assert {"question", "reference_answer", "reference_context",
            "conversation_history", "topic", "question_type",
            "seed_document_id", "metadata"} <= cols
    rows = qa.collect()
    for r in rows:
        meta = json.loads(r.metadata)
        assert meta["question_type"] == r.question_type
        assert meta["seed_document_id"] == r.seed_document_id
        assert meta["topic"] == r.topic
        # simple/complex carry empty history
        assert r.conversation_history == []


def test_generate_testset_conversational_history(spark):
    qa = generate_testset(
        _chunks(spark), n_questions=3,
        question_types=("simple", "conversational"),
    ).collect()
    conv = [r for r in qa if r.question_type == "conversational"]
    assert conv
    for r in conv:
        assert r.question == "What else does it mention?"
        roles = [t.role for t in r.conversation_history]
        assert roles == ["user", "assistant"]
        assert r.conversation_history[0].content.startswith("Let's discuss")


def test_generate_testset_rejects_unknown_type(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        generate_testset(_chunks(spark), question_types=("simple", "weird"))


def test_store_upsert_scan_delete(spark, tmp_path):
    store = TestbedStore(str(tmp_path / "tb"))
    qa = generate_testset(_chunks(spark), n_questions=2)
    tid = store.upsert_testset(spark, "set-one", qa)
    sets = store.get_testsets(spark).collect()
    assert [r.name for r in sets] == ["set-one"]
    assert store.get_testset_qa(spark, tid).count() == 2

    # upsert same name replaces QA rows, keeps one testset row
    tid2 = store.upsert_testset(spark, "set-one", generate_testset(_chunks(spark), n_questions=3))
    assert tid2 == tid
    assert store.get_testsets(spark).count() == 1
    assert store.get_testset_qa(spark, tid).count() == 3

    store.delete_testset(spark, tid)
    assert store.get_testsets(spark).count() == 0


def _factories():
    """Defined as locals so cloudpickle serializes them by VALUE (test modules
    aren't importable on executors)."""

    def answerer():
        return lambda q: "the passage describes spark data" if "spark" in q else "no idea"

    def judge():
        return lambda q, ref, ans: "spark" in ans

    return answerer, judge


def test_evaluate_testset_aggregations(spark):
    answerer, judge = _factories()
    qa = generate_testset(_chunks(spark), n_questions=3)
    report = evaluate_testset(spark, qa, answerer, judge, tid="t0")
    # questions quote the chunk's first words: c1 contains 'spark' -> correct;
    # c2/c3 don't -> judged wrong
    assert 0.0 < report.correctness < 1.0
    assert set(report.by_topic) == {"topic_a", "topic_b"}
    assert len(report.failures) == sum(
        1 for _ in report.failures
    ) and all("question" in f for f in report.failures)
    assert json.dumps(report.by_topic)  # JSON-native, not pickled


def test_insert_and_scan_evaluations(spark, tmp_path):
    answerer, judge = _factories()
    store = TestbedStore(str(tmp_path / "tb2"))
    qa = generate_testset(_chunks(spark), n_questions=2)
    tid = store.upsert_testset(spark, "s", qa)
    report = evaluate_testset(spark, store.get_testset_qa(spark, tid), answerer, judge, tid=tid)
    eid = store.insert_evaluation(spark, report)
    evals = store.get_evaluations(spark, tid).collect()
    assert evals[0].eid == eid
    assert json.loads(evals[0].report) == report.by_topic


def test_swap_crash_recovery(spark, tmp_path):
    """A kill inside the table swap must never lose the live table: the
    old rmtree-then-rename order deleted the table first (data stranded in
    _tmp); the rename-aside order + _recover heals both crash windows."""
    import os

    from oaim_sandbox_spark.operators.testbed import TestbedStore

    store = TestbedStore(str(tmp_path / "tb"))
    qa = spark.createDataFrame(
        [("q?", "a", "c", "t")],
        "question STRING, reference_answer STRING, reference_context STRING, topic STRING",
    )
    tid = store.upsert_testset(spark, "s1", qa)

    # crash window A: table renamed aside, tmp not yet promoted
    path = store._p("testset_qa")
    os.rename(path, path + "__old")
    os.makedirs(path + "_tmp")
    assert store.upsert_testset(spark, "s1", qa) == tid  # recovery healed it
    assert store.get_testset_qa(spark, tid).count() == 1
