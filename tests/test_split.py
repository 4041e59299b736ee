"""Splitter semantics (reference embedding.py:118-124, P1-P6) + the
reference's own property test: smaller chunk_size => more chunks
(test_endpoints_embed.py:224-266)."""

import pytest

from oaim_sandbox_spark.operators.split import (
    RecursiveCharSplitter,
    assign_chunk_ids,
    split_documents,
    split_fixed,
)


def test_split_fixed_boundaries(spark):
    df = spark.createDataFrame([("d1", "a" * 450)], "doc_id STRING, text STRING")
    out = split_fixed(df, chunk_size=200, chunk_overlap=20).orderBy("start_index").collect()
    # stride 180: starts at 0, 180, 360
    assert [r.start_index for r in out] == [0, 180, 360]
    assert [len(r.text) for r in out] == [200, 200, 90]
    assert [r.id for r in out] == ["d1_1", "d1_2", "d1_3"]
    # overlap: chunk i's first 20 chars = chunk i-1's last 20 chars
    assert out[0].text[180:] == out[1].text[:20]


def test_split_fixed_rejects_bad_overlap(spark):
    df = spark.createDataFrame([("d", "xx")], "doc_id STRING, text STRING")
    with pytest.raises(ValueError):
        split_fixed(df, chunk_size=10, chunk_overlap=10)


def test_recursive_splitter_respects_chunk_size():
    text = "para one. " * 30 + "\n\n" + "para two. " * 30
    sp = RecursiveCharSplitter(chunk_size=100, chunk_overlap=10)
    chunks = sp.split_text(text)
    assert len(chunks) > 1
    assert all(len(c) <= 100 for c, _ in chunks)
    # start_index points at the chunk in the original text (strip-aware)
    for c, idx in chunks:
        assert text[idx : idx + len(c)] == c


def test_recursive_splitter_smaller_chunks_more_chunks():
    text = ("word " * 200).strip()
    n_small = len(RecursiveCharSplitter(chunk_size=50, chunk_overlap=5).split_text(text))
    n_big = len(RecursiveCharSplitter(chunk_size=200, chunk_overlap=5).split_text(text))
    assert n_small > n_big


def test_split_documents_distributed(spark):
    df = spark.createDataFrame(
        [("d1", "alpha beta " * 40, "s1"), ("d2", "gamma delta " * 40, "s2")],
        "doc_id STRING, text STRING, source STRING",
    )
    out = split_documents(df, RecursiveCharSplitter(chunk_size=80, chunk_overlap=8)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.filename, []).append(r)
    # ids are 1-based per document (reference embedding.py:199-201)
    for doc, rows in by_doc.items():
        ids = sorted(int(r.id.split("_")[-1]) for r in rows)
        assert ids == list(range(1, len(rows) + 1))


def test_assign_chunk_ids_window(spark):
    df = spark.createDataFrame(
        [("s1", 0), ("s1", 180), ("s2", 0)], "source STRING, start_index INT"
    )
    out = {(r.source, r.start_index): r.id for r in assign_chunk_ids(df).collect()}
    assert out[("s1", 0)] == "s1_1"
    assert out[("s1", 180)] == "s1_2"
    assert out[("s2", 0)] == "s2_1"


def test_split_udtf_sql_surface(spark):
    """The UDTF form must produce exactly the rows the mapInPandas splitter
    produces, straight from SQL."""
    from oaim_sandbox_spark.operators.split import RecursiveCharSplitter, register_split_udtf

    register_split_udtf(spark)
    text = ("alpha beta gamma. " * 20).strip()
    spark.createDataFrame([(1, text)], "doc_id INT, text STRING").createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT d.doc_id, c.chunk, c.start_index, c.chunk_no "
        "FROM udtf_docs d, LATERAL split_chunks(d.text, 100, 10) c ORDER BY c.chunk_no"
    ).collect()
    expected = RecursiveCharSplitter(chunk_size=100, chunk_overlap=10).split_text(text)
    assert [(r.chunk, r.start_index) for r in rows] == expected
    assert [r.chunk_no for r in rows] == list(range(1, len(expected) + 1))
    assert all(len(r.chunk) <= 100 for r in rows)


def test_split_operators_degenerate_docs(spark):
    """Empty and NULL documents flow through every splitter as ZERO chunks:
    split_fixed used to emit two phantom chunks per empty doc (Spark's
    sequence(0,-1) descends — one with id '_0' and a negative start_index),
    and the mapInPandas splitters raised TypeError on NULL text, aborting
    the whole ingest job."""
    from oaim_sandbox_spark.operators.split import (
        RecursiveCharSplitter,
        split_documents,
        split_documents_by_ext,
        split_fixed,
    )

    df = spark.createDataFrame(
        [("d1", "", "s", "txt"), ("d2", None, "s", "txt"), ("d3", "hello world ok", "s", "txt")],
        "doc_id STRING, text STRING, source STRING, ext STRING",
    )
    fixed = split_fixed(df, chunk_size=10, chunk_overlap=2).collect()
    assert all(r["source"] == "d3" for r in fixed)
    assert all(r["start_index"] >= 0 and not r["id"].endswith("_0") for r in fixed)

    rec = split_documents(df, RecursiveCharSplitter(10, 2)).collect()
    assert all(r["filename"] == "d3" for r in rec)

    byext = split_documents_by_ext(df, chunk_size=10, chunk_overlap=2).collect()
    assert all(r["filename"] == "d3" for r in byext)


def test_html_section_chunks_report_document_offsets(spark):
    """Chunks from later HTML sections must carry start_index relative to
    the ORIGINAL document (per-section offsets restarting at 0 made chunk
    ordering nondeterministic and broke original-text slicing)."""
    from oaim_sandbox_spark.operators.split import split_documents_by_ext

    html = "<h1>A</h1>" + "alpha " * 5 + "<h2>B</h2>" + "bravo " * 5
    df = spark.createDataFrame(
        [("d1", html, "s", "html")], "doc_id STRING, text STRING, source STRING, ext STRING"
    )
    rows = sorted(
        split_documents_by_ext(df, chunk_size=20, chunk_overlap=0).collect(),
        key=lambda r: r["start_index"],
    )
    starts = [r["start_index"] for r in rows]
    assert len(starts) == len(set(starts))  # no duplicate offsets across sections
    # every chunk's text appears at its claimed offset in the original doc
    for r in rows:
        assert html[r["start_index"]:].lstrip().startswith(r["text"][:8].lstrip()), r
