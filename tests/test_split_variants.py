"""P2 token splitter, P3 HTML section split, P4 distributed dispatch."""

import pytest

from oaim_sandbox_spark.operators.split import (
    TokenSplitter,
    split_documents_by_ext,
    split_html_sections,
)


def test_token_splitter_respects_token_budget():
    text = "\n\n".join("word " * 20 for _ in range(10))  # 10 paras x 20 tokens
    sp = TokenSplitter(chunk_size=50, chunk_overlap=5)
    chunks = sp.split_text(text)
    assert len(chunks) > 1
    for c in chunks:
        assert sp.count_tokens(c.replace("\n\n", " ")) <= 50 + 20  # overlap carry bound


def test_token_splitter_smaller_budget_more_chunks():
    text = "\n\n".join("alpha beta gamma delta " * 5 for _ in range(8))
    n_small = len(TokenSplitter(chunk_size=30, chunk_overlap=3).split_text(text))
    n_big = len(TokenSplitter(chunk_size=120, chunk_overlap=3).split_text(text))
    assert n_small > n_big


def test_token_splitter_rejects_bad_overlap():
    with pytest.raises(ValueError):
        TokenSplitter(chunk_size=10, chunk_overlap=10)


def test_split_html_sections():
    html = "<h1>One</h1><p>first</p><h2>Two</h2><p>second</p>"
    sections = split_html_sections(html)
    assert len(sections) == 2
    assert "first" in sections[0] and "second" in sections[1]
    assert split_html_sections("no headers at all") == ["no headers at all"]


def test_split_documents_by_ext(spark):
    df = spark.createDataFrame(
        [
            ("d1", "<h1>A</h1>" + "alpha " * 40 + "<h2>B</h2>" + "beta " * 40, "s1", "html"),
            ("d2", "plain text " * 40, "s2", "txt"),
        ],
        "doc_id STRING, text STRING, source STRING, ext STRING",
    )
    out = split_documents_by_ext(df, chunk_size=120, chunk_overlap=12).collect()
    ids = {r.filename: [r.id for r in out if r.filename == r2.filename] for r2 in out for r in out}
    d1_chunks = [r for r in out if r.filename == "d1"]
    d2_chunks = [r for r in out if r.filename == "d2"]
    assert len(d1_chunks) >= 2 and len(d2_chunks) >= 2
    # html: no chunk straddles the <h2> section boundary
    for r in d1_chunks:
        assert not ("alpha" in r.text and "beta" in r.text)
    # 1-based ids per doc
    assert sorted(int(r.id.split("_")[-1]) for r in d1_chunks) == list(range(1, len(d1_chunks) + 1))


def test_split_documents_by_ext_unknown_ext(spark):
    df = spark.createDataFrame([("d", "text", "s", "docx")], "doc_id STRING, text STRING, source STRING, ext STRING")
    import pyspark.errors

    with pytest.raises(Exception, match="unsupported file extension"):
        split_documents_by_ext(df).collect()
