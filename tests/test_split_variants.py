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


def test_token_sentence_splitter_budgets_tokens_with_overlap():
    """ADVICE r10: llama-index SentenceSplitter budgets TOKENS with
    default overlap 200; TokenSentenceSplitter matches that contract —
    sentence-boundary pieces merged under a token budget, overlap carried
    as whole sentences, every chunk a verbatim join of input sentences."""
    from oaim_sandbox_spark.operators.split import (
        TokenSentenceSplitter,
        token_sentence_splitter,
    )

    sentences = [f"Sentence number {i} has exactly seven tokens. " for i in range(40)]
    text = "".join(sentences)
    sp = TokenSentenceSplitter(chunk_size=50, chunk_overlap=10)
    chunks = sp.split_text(text)
    assert len(chunks) > 1
    for c in chunks:
        # budget holds (no single sentence exceeds it here)
        assert sp.count_tokens(c) <= 50
        # chunks are whole-sentence joins: each chunk is a contiguous
        # verbatim span of the input
        assert c in text
    # consecutive chunks overlap by at least one carried sentence (each
    # sentence is unique, so containment is an exact check)
    for a, b in zip(chunks, chunks[1:]):
        first_sentence_of_b = b[: b.index(". ") + 2]
        assert first_sentence_of_b in a, (a, b)
    # defaults match the reference SentenceSplitter defaults
    d = token_sentence_splitter()
    assert (d.chunk_size, d.chunk_overlap) == (2048, 200)
    # an over-budget single sentence still becomes its own chunk (the
    # r9/r10 merge-guard contract, inherited from TokenSplitter._merge)
    big = "word " * 80 + ". Short one. Another short one. "
    got = TokenSentenceSplitter(chunk_size=20, chunk_overlap=4).split_text(big)
    assert any(TokenSentenceSplitter(20, 4).count_tokens(c) > 20 for c in got)
