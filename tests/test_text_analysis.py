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


def test_tfidf_weights_sql_byte_identical_to_registry():
    """The parameterized builder must reproduce the r6-certified registry
    SQL byte-for-byte at the registry's arguments — the certified
    tfidf_cosine_pairs / tfidf_cosine_sampled templates embed it."""
    from oaim_sandbox_spark import queries_extended as QE
    from oaim_sandbox_spark.operators.text_analysis import tfidf_weights_sql

    for d in ("spark", "duck"):
        assert QE._tfidf_w_sql(d) == tfidf_weights_sql(
            d, rel="documents", text_col="text", id_col="doc_id",
            ngram=QE.TFIDF_NGRAM, max_df_frac=QE.TFIDF_MAX_DF_FRAC,
        )


def test_sampled_cosine_pairs_operator_matches_duckdb(spark):
    """Operator output == pure-SQL est branch run by DuckDB on the same
    parquet (the oracle parity the sampled_cosine_pairs registry entry
    certifies at driver time, exercised here operator-first with
    non-default column names to prove the parameterization)."""
    import duckdb

    from oaim_sandbox_spark.operators.text_analysis import (
        sampled_cosine_pairs,
        sampled_cosine_sql,
        tfidf_weights_sql,
    )

    sf = "/root/testdata/sf0.001"
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .selectExpr("doc_id AS id", "text AS body")
    )
    got = sorted(
        (r.doc_a, r.doc_b, r.est_cosine)
        for r in sampled_cosine_pairs(docs, text_col="body", id_col="id", C=4).collect()
    )
    w = tfidf_weights_sql("duck", rel="d", text_col="body", id_col="id")
    est = sampled_cosine_sql("duck", rel="w", C=4).lstrip()
    sql = (
        f"WITH d AS (SELECT doc_id AS id, text AS body FROM '{sf}/documents.parquet'),\n"
        f"w AS ({w}),\n" + est[len("WITH "):]
    )
    want = sorted((a, b, c) for a, b, c in duckdb.sql(sql).fetchall())
    assert len(got) > 0 and got == want


def test_sampled_cosine_pairs_sampling_bounds(spark):
    """The kept-postings bound that makes the join linear: after sampling,
    the expected postings per term is <= C, and every df<=C term is kept
    in full (p=1) — check the realized sample obeys E[kept] within noise."""
    from oaim_sandbox_spark.operators.text_analysis import tfidf_weights_sql
    from oaim_sandbox_spark.functions import portable as P

    sf = "/root/testdata/sf0.001"
    spark.read.parquet(f"{sf}/documents.parquet").createOrReplaceTempView("tscp_docs")
    C = 3
    w = tfidf_weights_sql("spark", rel="tscp_docs")
    u = P.hash_unit("CAST(a.t AS STRING)", "spark")
    row = spark.sql(f"""
        WITH w AS ({w}),
        samp AS (SELECT a.t, a.df FROM w a
                 WHERE a.df > 1 AND {u} < least(1.0, CAST({C} AS DOUBLE) / a.df))
        SELECT COUNT(*) AS kept,
               (SELECT SUM(least(CAST(df AS DOUBLE), {C})) FROM (SELECT t, ANY_VALUE(df) AS df FROM w WHERE df > 1 GROUP BY t)) AS expected
        FROM samp
    """).collect()[0]
    spark.catalog.dropTempView("tscp_docs")
    assert row.kept <= 1.5 * row.expected + 50
    assert row.kept >= 0.5 * row.expected - 50


def test_sampled_cosine_rescored_matches_exact_on_candidates(spark):
    """Stage-2 exact re-scoring: the rescored operator's values must equal
    the EXACT postings join's cosine for every surfaced pair (no
    importance-correction overshoot survives), and every output pair must
    be one the est branch surfaced (candidates bound the work)."""
    import duckdb

    from oaim_sandbox_spark.operators.text_analysis import (
        sampled_cosine_pairs,
        sampled_cosine_pairs_rescored,
        tfidf_weights_sql,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    rescored = {
        (r.doc_a, r.doc_b): r.tfidf_cosine
        for r in sampled_cosine_pairs_rescored(docs, threshold=0.0).collect()
    }
    cand = {
        (r.doc_a, r.doc_b)
        for r in sampled_cosine_pairs(docs).collect()
    }
    assert rescored and set(rescored) <= cand
    # exact cosine per pair from DuckDB over the same weight relation
    w = tfidf_weights_sql("duck", rel=f"'{sf}/documents.parquet'")
    exact = {
        (a, b): v
        for a, b, v in duckdb.sql(f"""
            WITH w AS ({w}),
            norms AS (SELECT doc_id, sqrt(SUM(w*w)) AS nrm FROM w GROUP BY doc_id),
            dp AS (SELECT a.doc_id da, b.doc_id db, SUM(a.w*b.w) AS dot
                   FROM w a JOIN w b ON a.t = b.t AND a.doc_id < b.doc_id
                   GROUP BY a.doc_id, b.doc_id)
            SELECT da, db, round(dp.dot / (na.nrm * nb.nrm), 6)
            FROM dp JOIN norms na ON na.doc_id = da JOIN norms nb ON nb.doc_id = db
        """).fetchall()
    }
    for pair, v in rescored.items():
        assert exact[pair] == v, (pair, v, exact[pair])
