"""Learned-BPE tokenizer (operators/bpe.py): merge learning, deterministic
retrain, lossless detokenization, distributed-vs-driver encode parity, and
the P2 TokenSplitter integration."""

import pytest

from oaim_sandbox_spark.operators.bpe import _EOW, BPETokenizer


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, "the quick brown fox jumps over the lazy dog " * 3
            + "lower lowest newer newest wider widest " * 2)
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id INT, text STRING")


@pytest.fixture(scope="module")
def bpe(corpus):
    return BPETokenizer.train(corpus, num_merges=60)


def test_train_learns_frequent_subwords(bpe):
    # 'the' is the most frequent word: its full form must become one token
    assert bpe.encode_word("the") == ["the" + _EOW]
    # the learned 'est'/'er' suffix structure compresses unseen-but-related words
    assert 1 <= len(bpe.encode_word("newest")) <= 3


def test_training_is_deterministic(corpus, bpe):
    again = BPETokenizer.train(corpus, num_merges=60)
    assert again.merges == bpe.merges


def test_encode_is_lossless(bpe):
    text = "the widest dog jumps"
    toks = bpe.encode(text)
    assert "".join(toks).replace(_EOW, " ").split() == text.split()


def test_unseen_chars_fall_back_to_symbols(bpe):
    toks = bpe.encode_word("zzqx7")
    assert "".join(toks) == "zzqx7" + _EOW  # never drops content


def test_distributed_matches_driver_encode(corpus, bpe):
    out = bpe.tokenize_df(corpus.limit(5)).select("doc_id", "text", "bpe_tokens").collect()
    for r in out:
        assert list(r["bpe_tokens"]) == bpe.encode(r["text"])


def test_save_load_roundtrip(bpe, tmp_path):
    p = str(tmp_path / "bpe.json")
    bpe.save(p)
    loaded = BPETokenizer.load(p)
    assert loaded.merges == bpe.merges
    assert loaded.encode("the newest fox") == bpe.encode("the newest fox")


def test_token_splitter_integration(bpe):
    """P2: a TokenSplitter budgeted in LEARNED-BPE tokens (the reference's
    tiktoken-counted CharacterTextSplitter shape, with a corpus-fit vocab)."""
    from oaim_sandbox_spark.operators.split import TokenSplitter

    splitter = TokenSplitter(chunk_size=20, chunk_overlap=4, separator="\n\n",
                             count_tokens=bpe.count_tokens)
    text = "\n\n".join(["the quick brown fox"] * 10)
    chunks = splitter.split_text(text)
    assert len(chunks) > 1
    assert all(bpe.count_tokens(c) <= 20 + 8 for c in chunks)  # budget respected (+joiner slack)
