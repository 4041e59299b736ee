"""Text-analysis operators: language ID, quality scoring, token counts,
fingerprints."""

from oaim_sandbox_spark.operators.text_analysis import (
    fingerprints,
    language_id,
    quality_scores,
    token_counts,
)


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog is in a house"),
            (2, "el gato y el perro en la casa de los vecinos"),
            (3, "der hund und die katze sind von dem haus"),
            (4, "xyzzy plugh qwerty"),
        ],
        "doc_id INT, text STRING",
    )
    langs = {r.doc_id: r.detected_lang for r in language_id(df).collect()}
    assert langs[1] == "en"
    assert langs[2] == "es"
    assert langs[3] == "de"
    assert langs[4] == "und"


def test_quality_scores(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and runs to the house in a field. " * 10),
            (2, "000 111 222 333 444 555 666 777 888 999"),
        ],
        "doc_id INT, text STRING",
    )
    rows = {r.doc_id: r for r in quality_scores(df).collect()}
    assert rows[1].quality_score > rows[2].quality_score
    assert rows[2].digit_ratio > 0.5
    assert 0.0 <= rows[1].quality_score <= 1.0


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "hello world, 42 times!")], "doc_id INT, text STRING")
    r = token_counts(df).collect()[0]
    assert r.ws_tokens == 4
    # BPE-ish: hello / world / , / 42 / times / !
    assert r.bpe_tokens == 6


def test_fingerprint_whitespace_case_invariant(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "HELLO\t\tWORLD "), (4, "different")],
        "doc_id INT, text STRING",
    )
    fps = {r.doc_id: r.fingerprint for r in fingerprints(df).collect()}
    assert fps[1] == fps[2] == fps[3]
    assert fps[4] != fps[1]
