"""Independent naive-Python pins BACK-FILLED for certified entries, round 13
wave 9 — closing the oracle-only tail: corpus bigrams, VARIANT/JSON
histograms, UNPIVOT reshaping, the vs-table name normalizer, the
Deequ-style data-quality profile (planted NULL key, duplicate key,
negative price, out-of-domain status), benchmark contamination by source,
the quality gate's bigram-vocabulary cost (full composite quality-score
recompute in Python), and the streaming-oracle family (session windows
with the >= 30-min OPENS-a-session boundary — the inverse of the batch
sessionizer's strict->, tumbling hourly, 2-hour sliding with the 2-way
window explode, and the pii-scrub/batch identity)."""

import math
import re
from collections import Counter
from fractions import Fraction as Fr

import duckdb

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "zu", "ein"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "zh": ["de", "shi", "le", "zai", "he", "you", "wo", "ta", "men", "zhe"],
}
ALL_STOP = sorted({w for ws in STOPWORDS.values() for w in ws})


def _r6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _toks(text: str):
    return [t for t in text.split(" ") if t]


def _word_ngrams(text: str, n: int):
    toks = _toks(text)
    if len(toks) >= n:
        return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    return [" ".join(toks)]


def _quality_score(text: str) -> float:
    """operators/text_analysis.quality_score_sql recomputed: composite of
    ROUNDED ratios (the inner round(x, 6) is part of the definition)."""
    n_chars = len(text)
    toks = _toks(text)
    toks_lower = _toks(text.lower())
    stop_ratio = _r6(sum(1 for t in toks_lower if t in ALL_STOP) / len(toks)) \
        if toks else None
    digit_ratio = _r6(sum(1 for c in text if c.isdigit()) / n_chars) \
        if n_chars else None
    if stop_ratio is None or digit_ratio is None:
        return None
    len_term = min(n_chars / 1000.0, 1.0)
    stop_term = min(stop_ratio * 5.0, 1.0)
    digit_pen = 1.0 - min(digit_ratio * 10.0, 1.0)
    return _r6(0.4 * len_term + 0.4 * stop_term + 0.2 * digit_pen)


def _mk_documents(con, rows):
    vals = ", ".join(
        f"({did}, '{text}', '{lang}', '{src}', {len(text)})"
        for did, text, lang, src in rows
    )
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + vals + ") AS v(doc_id, text, lang, source, n_chars)"
    )


def _mk_events(con, rows):
    """rows: (event_id, user_id, event_type, ts_us, value, props)."""
    vals = ", ".join(
        f"({eid}, make_timestamp({ts}), {uid}, '{et}', "
        f"CAST({val} AS DOUBLE), '{props}')"
        for eid, uid, et, ts, val, props in rows
    )
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + vals + ") AS v(event_id, ts, user_id, event_type, value, props)"
    )


def test_bigram_topk_matches_python():
    from oaim_sandbox_spark.queries_training import bigram_topk

    rows = [(1, "a b a b a b", "en", "s"),      # "a b" x3, "b a" x2
            (2, "c d c d", "en", "s"),
            (3, "single", "en", "s")]           # <2 tokens -> the token itself
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(bigram_topk("duck")).fetchall()

    cnt = Counter(g for _, t, _, _ in rows for g in _word_ngrams(t, 2))
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [tuple(r) for r in got] == exp
    assert ("single", 1) in cnt.items()         # degenerate-doc convention


def test_events_variant_histogram_matches_python():
    from oaim_sandbox_spark.queries_textstats import events_variant_histogram

    rows = [(1, 1, "click", 1_000_000, 0.0, '{"k": 3}'),
            (2, 1, "click", 2_000_000, 0.0, '{"k": 17}'),
            (3, 2, "view", 3_000_000, 0.0, '{"k": 10}'),
            (4, 2, "view", 4_000_000, 0.0, '{"other": 1}')]   # NULL k
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(events_variant_histogram("duck")).fetchall()

    cells = {}
    for _, _, et, _, _, props in rows:
        m = re.search(r'"k":\s*(\d+)', props)
        k = int(m.group(1)) if m else None
        b = k // 10 if k is not None else None
        c = cells.setdefault((b, et), [])
        c.append(k)
    exp = {(b, et, len(ks),
            min((k for k in ks if k is not None), default=None),
            max((k for k in ks if k is not None), default=None))
           for (b, et), ks in cells.items()}
    assert {tuple(r) for r in got} == exp
    assert (None, "view", 1, None, None) in exp   # missing-key row surfaces


def test_unpivot_monthly_metrics_matches_python():
    from oaim_sandbox_spark.queries_extended import unpivot_monthly_metrics

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders AS SELECT * FROM (VALUES "
        "(1, TIMESTAMP '1997-01-05 00:00:00', 100.25::DECIMAL(15,2)), "
        "(2, TIMESTAMP '1997-01-20 00:00:00', 199.75::DECIMAL(15,2)), "
        "(3, TIMESTAMP '1997-02-10 00:00:00', 50.00::DECIMAL(15,2))"
        ") AS v(o_orderkey, o_orderdate, o_totalprice)")
    got = con.execute(unpivot_monthly_metrics("duck")).fetchall()

    months = {"1997-01": ["100.25", "199.75"], "1997-02": ["50.00"]}
    exp = []
    for mon in sorted(months):
        ps = [Fr(p) for p in months[mon]]
        q = sum(math.floor(float(p) * 100 + 0.5) for p in ps)   # exact_avg scale 2
        avg = _r6(q / (len(ps) * 100.0))
        for metric, v in sorted(
                [("n_orders", float(len(ps))), ("avg_price", avg),
                 ("max_price", float(max(ps)))]):
            exp.append((mon, metric, v))
    assert [tuple(r) for r in got] == exp


def test_vs_table_names_matches_python():
    from oaim_sandbox_spark.queries_relational import vs_table_names_sql

    rows = [(1, "t", "en", "web-crawl"), (2, "t", "en", "web-crawl"),
            (3, "t", "en", "s3.dump")]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(vs_table_names_sql("duck")).fetchall()

    exp = sorted({
        (src,
         re.sub(r"\W", "_",
                f"alias-{src}_mock.model_200_20_COSINE_HNSW").upper())
        for _, _, _, src in rows})
    assert [tuple(r) for r in got] == exp
    assert got[1][1].startswith("ALIAS_WEB_CRAWL_MOCK_MODEL")


def test_data_quality_profile_matches_python():
    from oaim_sandbox_spark.queries_extended import data_quality_profile

    # plants: one NULL custkey, a DUPLICATE orderkey, one negative price,
    # one out-of-domain status. Prices sum to 400.00 over 4 rows -> the
    # mean (100.00) is exact in binary.
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders AS SELECT * FROM (VALUES "
        "(1, 10, 'O', '1-URGENT', 100.25::DECIMAL(15,2)), "
        "(2, NULL, 'F', '2-HIGH', 200.25::DECIMAL(15,2)), "
        "(2, 11, 'X', '2-HIGH', -50.50::DECIMAL(15,2)), "
        "(3, 12, 'P', '5-LOW', 150.00::DECIMAL(15,2))"
        ") AS v(o_orderkey, o_custkey, o_orderstatus, o_orderpriority,"
        " o_totalprice)")
    got = con.execute(data_quality_profile("duck")).fetchall()

    n = 4.0
    exp = sorted([
        ("size", "*", n),
        ("completeness", "o_custkey", _r6(1.0 - 1 / n)),
        ("completeness", "o_totalprice", 1.0),
        ("distinctness", "o_orderkey", _r6(3 / n)),
        ("approx_distinct", "o_orderstatus", 4.0),
        ("approx_distinct", "o_orderpriority", 3.0),
        ("min", "o_totalprice", -50.5),
        ("max", "o_totalprice", 200.25),
        ("mean", "o_totalprice", 100.0),
        ("violations:non_negative", "o_totalprice", 1.0),
        ("violations:in_domain", "o_orderstatus", 1.0),
        ("violations:unique", "o_orderkey", 1.0),
    ])
    assert [tuple(r) for r in got] == exp


def test_contamination_rate_by_source_matches_python():
    from oaim_sandbox_spark.queries_textstats import contamination_rate_by_source

    bench_run = "alpha beta gamma delta epsilon zeta eta theta"   # 8 words
    rows = [
        (1, bench_run + " iota kappa", "en", "src0"),             # benchmark
        (2, "unrelated benchmark words entirely here now ok yes", "en", "src1"),
        (3, bench_run + " trailing words here", "en", "web"),     # CONTAMINATED
        (4, "clean document with eight words minimum for grams", "en", "web"),
        (5, "another clean doc longer than eight words for sure", "en", "cc"),
    ]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(contamination_rate_by_source("duck")).fetchall()

    bench_grams = {g for did, t, _, s in rows if s in ("src0", "src1")
                   for g in _word_ngrams(t, 8)}
    agg = {}
    for did, t, _, s in rows:
        if s in ("src0", "src1"):
            continue
        grams = set(_word_ngrams(t, 8))
        a = agg.setdefault(s, [0, 0])
        a[0] += 1
        a[1] += 1 if grams & bench_grams else 0
    exp = sorted((s, n, c, _r6(c / n)) for s, (n, c) in agg.items())
    assert [tuple(r) for r in got] == exp
    by_src = {r[0]: r for r in got}
    assert by_src["web"][2] == 1 and by_src["cc"][2] == 0


def test_filter_vocab_loss_matches_python():
    from oaim_sandbox_spark.queries_extended import filter_vocab_loss

    # source 'm': one high-quality doc (stopword-rich) and one junk doc
    # (digit-heavy) whose exclusive bigrams the mean-cut must cost.
    rows = [
        (1, "the cat and the dog is on the mat with a hat for fun", "en", "m"),
        (2, "1234 5678 9012 3456 7890 garbage numbers here", "en", "m"),
        (3, "the quick brown fox is in the barn with a friend", "en", "p"),
        (4, "the slow red fox is in the barn with a friend", "en", "p"),
    ]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(filter_vocab_loss("duck")).fetchall()

    qs = {did: _quality_score(t) for did, t, _, _ in rows}
    cuts = {}
    for src in ("m", "p"):
        scores = [qs[did] for did, _, _, s in rows if s == src]
        cuts[src] = sum(scores) / len(scores)
    vocab = {}
    for did, t, _, s in rows:
        for g in _word_ngrams(t.lower(), 2):
            kept = vocab.setdefault((s, g), 0)
            if qs[did] >= cuts[s]:
                vocab[(s, g)] = 1
    per_src = {}
    for (s, g), kept in vocab.items():
        a = per_src.setdefault(s, [0, 0])
        a[0] += 1
        a[1] += kept
    exp = sorted((s, t, k, t - k, _r6((t - k) / t))
                 for s, (t, k) in per_src.items())
    assert [tuple(r) for r in got] == exp
    by_src = {r[0]: r for r in got}
    assert by_src["m"][3] > 0            # junk doc's bigrams lost at the cut
    assert by_src["p"][3] < by_src["p"][1]


def test_streaming_sessions_oracle_matches_python():
    from oaim_sandbox_spark.queries_registry import streaming_sessions_oracle

    g = 1_800_000_000
    rows = [(1, 1, "view", 0, 0.0, "{}"),
            (2, 1, "view", g, 0.0, "{}"),          # EXACTLY 30 min: NEW session
            (3, 1, "view", g + 100, 0.0, "{}"),
            (4, 50, "view", 0, 0.0, "{}"),         # user_id < 50 excludes
            (5, 7, "view", 42, 0.0, "{}")]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(streaming_sessions_oracle("duck")).fetchall()

    exp = []
    for uid in (1, 7):
        evs = sorted((r[3] for r in rows if r[1] == uid))
        sessions = []
        for ts in evs:
            if not sessions or ts - sessions[-1][-1] >= g:
                sessions.append([ts])
            else:
                sessions[-1].append(ts)
        for s in sessions:
            exp.append((uid, s[0], len(s)))
    assert [tuple(r) for r in got] == exp
    u1 = [r for r in got if r[0] == 1]
    assert len(u1) == 2 and u1[1][2] == 2   # boundary event OPENS session 2


def test_streaming_hourly_counts_oracle_matches_python():
    from oaim_sandbox_spark.queries_registry import streaming_hourly_oracle

    h = 3_600_000_000
    rows = [(1, 1, "click", 10, 1.5, "{}"), (2, 2, "click", h - 1, 2.25, "{}"),
            (3, 1, "view", h + 5, 4.0, "{}")]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(streaming_hourly_oracle("duck")).fetchall()

    agg = {}
    for _, _, et, ts, val, _ in rows:
        a = agg.setdefault((ts // h, et), [0, 0.0])
        a[0] += 1
        a[1] += val
    exp = {(hh, et, n, sv) for (hh, et), (n, sv) in agg.items()}
    assert {tuple(r) for r in got} == exp


def test_streaming_sliding_counts_oracle_matches_python():
    from oaim_sandbox_spark.queries_registry import streaming_sliding_oracle

    h = 3_600_000_000
    rows = [(1, 1, "click", h + 10, 0.0, "{}"),
            (2, 2, "click", 2 * h + 20, 0.0, "{}"),
            (3, 1, "view", h + 30, 0.0, "{}")]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(streaming_sliding_oracle("duck")).fetchall()

    agg = Counter()
    for _, _, et, ts, _, _ in rows:
        hh = ts // h
        for x in (0, 1):                      # the 2h/1h window pair
            agg[((hh - x) * h, et)] += 1
    exp = sorted((ws, et, n) for (ws, et), n in agg.items())
    assert [tuple(r) for r in got] == exp
    clicks_h1 = [r for r in got if r[0] == h and r[1] == "click"]
    assert clicks_h1[0][2] == 2               # hour-1 window sees both clicks


def test_streaming_pii_scrub_is_batch_identical():
    from oaim_sandbox_spark.queries_extended import (pii_redaction_stats,
                                                     streaming_pii_scrub)

    # The streaming entry's oracle IS the batch PII SQL (stream-over-static
    # == batch): pin the identity so a future edit can't silently fork the
    # two scrub paths. The batch SQL's value pin lives in
    # test_r13_backfill3_pins.test_pii_redaction_stats_matches_re_python.
    assert streaming_pii_scrub("duck") == pii_redaction_stats("duck")
    assert streaming_pii_scrub("spark") == pii_redaction_stats("spark")
