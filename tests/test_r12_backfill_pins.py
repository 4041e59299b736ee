"""Independent naive-Python pins BACK-FILLED for pre-r9 certified entries,
round 12 (VERDICT r11 task #3): the DuckDB oracle certifies Spark-vs-DuckDB
agreement on the SAME SQL, so a wrong shared query certifies green — only a
direct recomputation catches it (the r10 sweepline/Gopher and r11 MIN=MAX
degenerate-guard precedents). These eleven cover the math-heavy retrieval /
corpus-hygiene / sketch entries the r12 verdict named."""

import hashlib
import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

MOD = 1_000_000_007


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _r6(x: float) -> float:
    """round-half-away-from-zero at 6 decimals (DuckDB/Spark round())."""
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _mk_docs(con, docs, langs=None):
    vals = ", ".join(
        f"({i}, 'src{s}', '{' '.join(words)}', "
        f"'{(langs or {}).get(i, 'en')}', {len(' '.join(words))})"
        for i, (s, words) in enumerate(docs)
    )
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + vals + ") AS v(doc_id, source, text, lang, n_chars)"
    )


def _mk_docs_ids(con, rows, langs=None):
    """rows: (doc_id, source_idx, words) — explicit ids (gaps allowed)."""
    vals = ", ".join(
        f"({i}, 'src{s}', '{' '.join(words)}', "
        f"'{(langs or {}).get(i, 'en')}', {len(' '.join(words))})"
        for i, s, words in rows
    )
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + vals + ") AS v(doc_id, source, text, lang, n_chars)"
    )


def _mk_events(con, rows):
    """rows: (event_id, user_id, event_type, ts_us, value)."""
    vals = ", ".join(
        f"({eid}, make_timestamp({ts}), {uid}, '{et}', "
        f"CAST({val} AS DOUBLE), '{{}}')"
        for eid, uid, et, ts, val in rows
    )
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + vals + ") AS v(event_id, ts, user_id, event_type, value, props)"
    )


def _mk_embeddings(con, vecs):
    """vecs: (vec_id, label, [floats])."""
    vals = ", ".join(
        f"({i}, [{', '.join(f'{x!r}' for x in v)}]::DOUBLE[], {lab})"
        for i, lab, v in vecs
    )
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        + vals + ") AS v(vec_id, embedding, label)"
    )


def _toks(text: str) -> list[str]:
    return [t for t in text.split(" ") if t]


def _word_ngrams(text: str, n: int) -> list[str]:
    t = _toks(text)
    if len(t) >= n:
        return [" ".join(t[j:j + n]) for j in range(len(t) - n + 1)]
    return [" ".join(t)]  # the <n-token fallback both engines share


def _mock_embed(text: str, dim: int = 64) -> np.ndarray:
    """functions/portable.py mock_embed replica: H(text ':' i) grid."""
    return np.array([(_h64(f"{text}:{i}") % 2000001) / 1e6 - 1.0
                     for i in range(dim)])


def _cos_dist(a: np.ndarray, b: np.ndarray) -> float:
    den = float(np.linalg.norm(a) * np.linalg.norm(b))
    if den == 0.0:
        return 1.0
    return 1.0 - float(a @ b) / den


# --- BM25 --------------------------------------------------------------

BM25_DOCS = [
    (0, ["vector", "search", "is", "fast", "and", "scalable"]),
    (1, ["join", "strategies", "for", "distributed", "query", "engines"]),
    (2, ["vector", "join", "fast", "vector", "join", "fast", "vector"]),
    (3, ["nothing", "relevant", "in", "this", "one", "at", "all"]),
    (4, ["fast", "fast", "fast", "iteration", "loops"]),
    (5, ["a", "vector", "database", "with", "fast", "approximate", "join"]),
    (6, ["join", "the", "club"]),
]


def _bm25_scores():
    """Naive BM25 (k1=1.2, b=0.75, idf=ln((N-df+.5)/(df+.5)+1)) over
    BM25_DOCS for the fixed query tokens."""
    from oaim_sandbox_spark.queries_training import (
        BM25_B, BM25_K1, BM25_QUERY_TOKENS)

    dl = {i: len(w) for i, (_, w) in enumerate(BM25_DOCS)}
    n = len(BM25_DOCS)
    avgdl = sum(dl.values()) / n
    tf: dict[tuple[int, str], int] = Counter()
    for i, (_, words) in enumerate(BM25_DOCS):
        for w in words:
            if w in BM25_QUERY_TOKENS:
                tf[(i, w)] += 1
    df = Counter(tok for (_, tok) in tf)
    scores: dict[int, float] = defaultdict(float)
    for (i, tok), f in tf.items():
        idf = math.log((n - df[tok] + 0.5) / (df[tok] + 0.5) + 1.0)
        scores[i] += idf * f * (BM25_K1 + 1.0) / (
            f + BM25_K1 * (1.0 - BM25_B + BM25_B * dl[i] / avgdl))
    return scores


def test_bm25_topk_matches_direct_python():
    from oaim_sandbox_spark.queries_training import bm25_topk

    con = duckdb.connect()
    _mk_docs(con, [(i % 3, w) for i, (_, w) in enumerate(BM25_DOCS)])
    got = con.execute(bm25_topk("duck")).fetchall()
    exp = sorted(_bm25_scores().items(), key=lambda kv: (-_r6(kv[1]), kv[0]))[:10]
    assert [r[0] for r in got] == [i for i, _ in exp]
    for (_, bm), (_, ebm) in zip(got, exp):
        assert abs(bm - ebm) < 2e-6


def test_hybrid_rrf_topk_matches_direct_python():
    """Full replication: BM25 sparse ranks + md5 mock-embed dense cosine
    ranks fused by 1/(60+r) — covers mock_embed, the cosine guard, both
    rank windows, and the outer-join fusion in one pin."""
    from oaim_sandbox_spark.queries_training import hybrid_rrf_topk

    con = duckdb.connect()
    _mk_docs(con, [(i % 3, w) for i, (_, w) in enumerate(BM25_DOCS)])
    got = con.execute(hybrid_rrf_topk("duck")).fetchall()

    qv = _mock_embed("spark vector search")
    dense_keys = sorted(
        (( _r6(_cos_dist(_mock_embed(" ".join(w)), qv)), i)
         for i, (_, w) in enumerate(BM25_DOCS)),
    )
    dense_rank = {i: r + 1 for r, (_, i) in enumerate(dense_keys) if r < 20}
    sp = _bm25_scores()
    sparse_keys = sorted(sp.items(), key=lambda kv: (-_r6(kv[1]), kv[0]))
    sparse_rank = {i: r + 1 for r, (i, _) in enumerate(sparse_keys) if r < 20}
    rrf = {
        i: (1.0 / (60 + dense_rank[i]) if i in dense_rank else 0.0)
        + (1.0 / (60 + sparse_rank[i]) if i in sparse_rank else 0.0)
        for i in set(dense_rank) | set(sparse_rank)
    }
    exp = sorted(rrf.items(), key=lambda kv: (-_r6(kv[1]), kv[0]))[:10]
    assert [r[0] for r in got] == [i for i, _ in exp]
    for (_, v), (_, ev) in zip(got, exp):
        assert abs(v - ev) < 2e-6


# --- corpus hygiene ----------------------------------------------------

def test_ngram_novelty_decay_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import ngram_novelty_decay

    rows = []
    # src0: ids 0..19 (gappy: x3), half repeating the same text (saturates),
    # half fresh; src1: ids 100..109, all fresh
    for j in range(10):
        words = (["tmpl", "tmpl2", "tmpl3", "again", "again2"] if j % 2
                 else [f"w{j}a", f"w{j}b", f"w{j}c", f"w{j}d"])
        rows.append((3 * j, 0, words))
    for j in range(10):
        rows.append((100 + j, 1, [f"u{j}a", f"u{j}b", f"u{j}c", f"u{j}d"]))
    con = duckdb.connect()
    _mk_docs_ids(con, rows)
    got = con.execute(ngram_novelty_decay("duck")).fetchall()

    bounds: dict[str, tuple[int, int]] = {}
    for i, s, _ in rows:
        src = f"src{s}"
        lo, hi = bounds.get(src, (i, i))
        bounds[src] = (min(lo, i), max(hi, i))
    first: dict[tuple[str, int], int] = {}
    for i, s, words in rows:
        src = f"src{s}"
        lo, hi = bounds[src]
        bucket = ((i - lo) * 10) // (hi - lo + 1)
        for g in set(_word_ngrams(" ".join(words), 3)):
            sh = _h64(g) % MOD
            k = (src, sh)
            first[k] = min(first.get(k, bucket), bucket)
    per_src = Counter(src for src, _ in first)
    agg = Counter((src, b) for (src, _), b in first.items())
    exp = sorted(
        (src, b, n, n / per_src[src]) for (src, b), n in agg.items())
    assert [(r[0], r[1], r[2]) for r in got] == [(s, b, n) for s, b, n, _ in exp]
    for r, (_, _, _, frac) in zip(got, exp):
        assert abs(r[3] - frac) < 2e-6


def test_boilerplate_gram_fraction_matches_direct_python():
    from oaim_sandbox_spark.queries_training import boilerplate_gram_fraction

    docs = []
    # 25 docs share the template 5-gram (df=25 > 20) plus one unique gram
    for j in range(25):
        docs.append((j % 2, ["the", "same", "footer", "text", "here",
                             f"unique{j}"]))
    docs.append((0, ["entirely", "fresh", "document", "no", "template"]))
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(boilerplate_gram_fraction("duck")).fetchall()

    dg = {i: set(_word_ngrams(" ".join(w), 5)) for i, (_, w) in enumerate(docs)}
    df = Counter(g for gs in dg.values() for g in gs)
    exp = []
    for i in sorted(dg):
        n = len(dg[i])
        nb = sum(1 for g in dg[i] if df[g] > 20)
        exp.append((i, n, nb, nb / n))
    assert [(r[0], r[1], r[2]) for r in got] == [(i, n, nb) for i, n, nb, _ in exp]
    for r, (_, _, _, frac) in zip(got, exp):
        assert abs(r[3] - frac) < 2e-6
    # the construction actually exercised the threshold on both sides
    assert any(r[2] > 0 for r in got) and any(r[2] == 0 for r in got)


def test_decontamination_8gram_matches_direct_python():
    from oaim_sandbox_spark.queries_training import decontamination_8gram

    bench_words = ["b1", "b2", "b3", "b4", "b5", "b6", "b7", "b8", "b9"]
    docs = [
        (0, bench_words),                        # src0: benchmark
        (1, ["c1"] + bench_words[:8]),           # src1: benchmark too
        (2, ["x0"] + bench_words[:8] + ["x1"]),  # candidate, contaminated
        (2, [f"y{k}" for k in range(12)]),       # candidate, clean
        (3, bench_words[1:9] + ["z1", "z2"]),    # candidate, contaminated
        (3, ["short", "doc"]),                   # <8 tokens: fallback gram
    ]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(decontamination_8gram("duck")).fetchall()

    bench_g = set()
    for i, (s, w) in enumerate(docs):
        if s in (0, 1):
            bench_g |= set(_word_ngrams(" ".join(w), 8))
    exp = []
    for i, (s, w) in enumerate(docs):
        if s in (0, 1):
            continue
        gs = set(_word_ngrams(" ".join(w), 8))
        shared = len(gs & bench_g)
        exp.append((i, shared, 1 if shared else 0))
    assert got == exp
    assert any(r[2] == 1 for r in got) and any(r[2] == 0 for r in got)


def test_quality_filter_matches_direct_python():
    from oaim_sandbox_spark.operators.text_analysis import STOPWORDS
    from oaim_sandbox_spark.queries_training import quality_filter

    all_stop = {w for ws in STOPWORDS.values() for w in ws}
    long_doc = ["the", "quick", "brown", "fox", "jumps", "over", "a",
                "lazy", "dog", "with", "plenty", "of", "meaningful",
                "content", "to", "read"] * 2
    docs = [
        (0, ["tiny"]),                                   # too_short
        (0, ["characters"] * 10),                        # >=80 chars, <12 toks
        (1, ["n12345678"] * 13),                         # digit_heavy
        (1, ["repeat"] * 16),                            # repetitive
        (2, [f"qz{c}x" for c in "abcdefghijklmnopqrst"]),  # low_quality_score
        (2, long_doc),                                   # keep
    ]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(quality_filter("duck")).fetchall()

    exp = []
    for i, (_, w) in enumerate(docs):
        text = " ".join(w)
        toks = _toks(text)
        n_chars, n_tok = len(text), len(toks)
        digit = _r6(sum(c.isdigit() for c in text) / n_chars)
        stop = _r6(sum(t in all_stop for t in
                       _toks(text.lower())) / n_tok)
        distinct_ratio = len(set(toks)) / n_tok
        score = _r6(0.4 * min(n_chars / 1000.0, 1.0)
                    + 0.4 * min(stop * 5.0, 1.0)
                    + 0.2 * (1.0 - min(digit * 10.0, 1.0)))
        if n_chars < 80:
            v = "too_short"
        elif n_tok < 12:
            v = "too_few_tokens"
        elif digit > 0.2:
            v = "digit_heavy"
        elif distinct_ratio < 0.3:
            v = "repetitive"
        elif score < 0.35:
            v = "low_quality_score"
        else:
            v = "keep"
        exp.append((i, v, score))
    assert [(r[0], r[1]) for r in got] == [(i, v) for i, v, _ in exp]
    for r, (_, _, s) in zip(got, exp):
        assert abs(r[2] - s) < 2e-6
    assert sorted({v for _, v, _ in exp}) == sorted(
        ["too_short", "too_few_tokens", "digit_heavy", "repetitive",
         "low_quality_score", "keep"])  # every branch exercised


# --- sketch / percentile contracts --------------------------------------

def test_doc_len_percentiles_exact_landmarks_match_numpy():
    from oaim_sandbox_spark.queries_training import doc_len_percentiles_approx

    rng = np.random.default_rng(7)
    langs, rows = {}, []
    for i in range(120):
        lang = ["en", "de"][i % 2]
        langs[i] = lang
        rows.append((i % 4, [f"w{j}" for j in range(int(rng.integers(2, 30)))]))
    con = duckdb.connect()
    _mk_docs(con, rows, langs=langs)
    got = con.execute(doc_len_percentiles_approx("duck")).fetchall()

    by_lang: dict[str, list[int]] = defaultdict(list)
    for i, (_, w) in enumerate(rows):
        by_lang[langs[i]].append(len(" ".join(w)))
    assert [r[0] for r in got] == sorted(by_lang)
    for r in got:
        vals = np.array(by_lang[r[0]], dtype=float)
        exp = np.percentile(vals, [45, 55, 85, 95, 98.5, 100],
                            method="linear")
        for v, e in zip(r[1:7], exp):
            assert abs(v - e) < 2e-6
        assert r[7] and r[8] and r[9]  # duck states the contract as TRUE


def test_mad_outliers_exact_payload_matches_numpy():
    from oaim_sandbox_spark.queries_training import mad_outliers_approx

    rng = np.random.default_rng(11)
    rows, eid = [], 0
    vals = {"click": list(rng.normal(10, 2, 80)) + [300.0, -250.0],
            "purchase": list(rng.normal(50, 5, 60))}
    for et, vs in vals.items():
        for v in vs:
            rows.append((eid, eid % 7, et, 1_000_000 * eid, round(v, 3)))
            eid += 1
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(mad_outliers_approx("duck")).fetchall()

    assert [r[0] for r in got] == sorted(vals)
    for r in got:
        v = np.array([round(x, 3) for x in vals[r[0]]])
        med48, med, med52 = np.percentile(v, [48, 50, 52], method="linear")
        dev = np.abs(v - med)
        d48, dmed, d52 = np.percentile(dev, [48, 50, 52], method="linear")
        n_out = int((dev > 4.4478 * dmed).sum())
        assert abs(r[1] - med48) < 2e-6 and abs(r[2] - med52) < 2e-6
        assert abs(r[3] - d48) < 2e-6 and abs(r[4] - d52) < 2e-6
        assert r[5] == n_out
        assert r[6] and r[7]
    assert any(r[5] > 0 for r in got) and any(r[5] == 0 for r in got)


def test_countmin_token_topk_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import (
        CMS_ROWS, CMS_WIDTH, countmin_token_topk)

    rng = np.random.default_rng(3)
    # zipf-ish corpus over ~700 distinct tokens (> CMS_WIDTH=512, so some
    # buckets MUST collide and the overestimate path is really exercised)
    vocab = [f"t{j}" for j in range(700)]
    docs = []
    for i in range(40):
        k = int(rng.integers(5, 25))
        words = [vocab[min(int(rng.zipf(1.3)) - 1, 699)] for _ in range(k)]
        docs.append((i % 3, words))
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(countmin_token_topk("duck")).fetchall()

    toks = [t for _, w in docs for t in w]
    exact = Counter(toks)
    sketch: Counter = Counter()
    for t, n in exact.items():
        for r in range(CMS_ROWS):
            sketch[(r, (_h64(f"cms{r}:{t}") % MOD) % CMS_WIDTH)] += n
    est = {t: min(sketch[(r, (_h64(f"cms{r}:{t}") % MOD) % CMS_WIDTH)]
                  for r in range(CMS_ROWS)) for t in exact}
    exp = sorted(est.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r[0], r[1]) for r in got] == exp
    for tok, e, n, over in got:
        assert n == exact[tok] and over == e - n and over >= 0
    assert any(r[3] > 0 for r in got)  # collisions actually happened


# --- geometry / skew ----------------------------------------------------

def test_embedding_centroid_outliers_matches_numpy():
    from oaim_sandbox_spark.queries_textstats import embedding_centroid_outliers

    rng = np.random.default_rng(19)
    vecs = []
    for lab in (0, 1):
        base = rng.normal(1.0 + lab, 0.05, 64)
        for j in range(6):
            vecs.append((lab * 10 + j, lab,
                         [round(float(x), 4) for x in base + rng.normal(0, 0.02, 64)]))
        # one planted outlier per label, pointing away
        vecs.append((lab * 10 + 9, lab,
                     [round(float(x), 4) for x in -base]))
    con = duckdb.connect()
    _mk_embeddings(con, vecs)
    got = con.execute(embedding_centroid_outliers("duck")).fetchall()

    exp_rows = []
    for lab in (0, 1):
        mine = [(i, np.array(v)) for i, l, v in vecs if l == lab]
        cent = np.mean([v for _, v in mine], axis=0)
        sims = sorted(
            ((float(v @ cent / (np.linalg.norm(v) * np.linalg.norm(cent))), i)
             for i, v in mine),
        )[:3]
        rows = [(lab, i, 1.0 - s) for s, i in sims]
        rows.sort(key=lambda r: (-r[2], r[1]))
        exp_rows.extend(rows)
    assert [(r[0], r[1]) for r in got] == [(l, i) for l, i, _ in exp_rows]
    for r, (_, _, dist) in zip(got, exp_rows):
        assert abs(r[2] - dist) < 2e-6
    # the planted outliers are flagged worst in both labels
    assert got[0][1] == 9 and got[3][1] == 19


def test_salted_user_counts_spark_matches_direct_python(spark):
    """The Spark side is a custom two-phase SALTED aggregation (not the
    oracle's plain GROUP BY) — pin IT directly against a naive recount of
    the same parquet."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    got = [(r["user_id"], r["n_events"])
           for r in E.queries()["salted_user_counts"](spark, sf).collect()]
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id FROM read_parquet('{sf}/events.parquet')").fetchall()
    counts = Counter(u for (u,) in rows)
    exp = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert got == exp


# --- round-12 window re-certification pins (the r8-stale entries being
# re-certified this round that still rested on the shared oracle alone) ---


def test_bigram_pmi_topk_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import bigram_pmi_topk

    docs = []
    # "data lake" collocation x6 (>= 5 floor), "data base" x5, fillers, and
    # a 1-token doc exercising the LIKE '% %' short-doc fallback guard
    for j in range(6):
        docs.append((j % 2, ["data", "lake", f"w{j}", "data", "lake"]))
    for j in range(5):
        docs.append((j % 2, ["data", "base", f"z{j}"]))
    docs.append((0, ["solo"]))
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(bigram_pmi_topk("duck")).fetchall()

    bg, ug = Counter(), Counter()
    for _, w in docs:
        toks = list(w)
        ug.update(toks)
        if len(toks) >= 2:
            bg.update(" ".join(toks[j:j + 2]) for j in range(len(toks) - 1))
        # <2-token docs fall back to a space-free pseudo-bigram; the LIKE
        # guard drops it from the pair table but NOT from... (it never
        # enters ba at all: no space). Unigrams still count the token.
    nb, nu = sum(bg.values()), sum(ug.values())
    exp = []
    for g, c in bg.items():
        if c >= 5:
            w1, w2 = g.split(" ")
            pmi = math.log((c / nb) / ((ug[w1] / nu) * (ug[w2] / nu)))
            exp.append((g, c, pmi))
    exp.sort(key=lambda t: (-_r6(t[2]), t[0]))
    assert [(r[0], r[1]) for r in got] == [(g, c) for g, c, _ in exp[:20]]
    for r, (_, _, pmi) in zip(got, exp):
        assert abs(r[2] - pmi) < 2e-6


def test_dow_seasonality_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import dow_seasonality

    day_us = 86400 * 1_000_000
    rows, eid = [], 0
    counts = {0: [3, 5], 1: [2], 2: [7, 1, 4]}  # dow -> per-day counts
    for dow, days in counts.items():
        for k, n in enumerate(days):
            day = dow + 7 * (k + 1)
            for _ in range(n):
                rows.append((eid, 1, "click", day * day_us + eid, 1.0)); eid += 1
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(dow_seasonality("duck")).fetchall()

    means = {dw % 7: sum(ds) / len(ds) for dw, ds in counts.items()}
    wk = sum(means.values())
    exp = [(dw, means[dw], len(counts[dw]), means[dw] / wk,
            means[dw] / (wk / 7.0) - 1.0) for dw in sorted(counts)]
    assert [(r[0], r[2]) for r in got] == [(dw, nd) for dw, _, nd, _, _ in exp]
    for r, (_, m, _, share, vs) in zip(got, exp):
        assert abs(r[1] - m) < 2e-6 and abs(r[3] - share) < 2e-6 \
            and abs(r[4] - vs) < 2e-6


def test_event_markov_transitions_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import event_markov_transitions

    seqs = {1: ["a", "b", "a", "b", "c"], 2: ["b", "b", "a"], 3: ["c"]}
    rows, eid = [], 0
    for uid, seq in seqs.items():
        for k, et in enumerate(seq):
            rows.append((eid, uid, et, 1_000_000 * (10 * uid + k), 1.0)); eid += 1
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(event_markov_transitions("duck")).fetchall()

    trans = Counter()
    for seq in seqs.values():
        trans.update(zip(seq, seq[1:]))
    froms = Counter()
    for (f, _), n in trans.items():
        froms[f] += n
    exp = sorted((f, t, n, n / froms[f]) for (f, t), n in trans.items())
    assert [(r[0], r[1], r[2]) for r in got] == [(f, t, n) for f, t, n, _ in exp]
    for r, (_, _, _, p) in zip(got, exp):
        assert abs(r[3] - p) < 2e-6


def test_source_lang_entropy_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import source_lang_entropy

    langs = {}
    docs = []
    plan = {0: ["en"] * 4, 1: ["en", "de", "de", "fr"], 2: ["zh"]}
    i = 0
    for s, ls in plan.items():
        for lg in ls:
            langs[i] = lg
            docs.append((s, [f"w{i}", "text"])); i += 1
    con = duckdb.connect()
    _mk_docs(con, docs, langs=langs)
    got = con.execute(source_lang_entropy("duck")).fetchall()

    exp = []
    for s, ls in sorted(plan.items()):
        c = Counter(ls)
        tot = len(ls)
        h = -sum((n / tot) * math.log(n / tot) for n in c.values())
        exp.append((f"src{s}", len(c), h))
    assert [(r[0], r[1]) for r in got] == [(s, nl) for s, nl, _ in exp]
    for r, (_, _, h) in zip(got, exp):
        assert abs(r[2] - h) < 2e-6
    assert got[0][2] == 0.0  # monolingual source: exactly zero (the +0.0 pin)


def _perm_ab(i: int) -> tuple[int, int]:
    ha = int(hashlib.md5(f"minhash:a:{i}".encode()).hexdigest()[:15], 16)
    hb = int(hashlib.md5(f"minhash:b:{i}".encode()).hexdigest()[:15], 16)
    return (ha % (MOD - 1)) + 1, hb % MOD


def test_minhash_signatures_matches_direct_python():
    """Full pipeline replication: word 3-gram shingles -> md5 60-bit hashes
    mod MOD -> 16 (a_i*h+b_i) % MOD permutation mins — the certified
    signature every LSH entry builds on."""
    from oaim_sandbox_spark.queries_dedup import NGRAM, NUM_PERM, minhash_signatures_q

    docs = [
        (0, ["the", "quick", "brown", "fox", "jumps", "over", "dogs"]),
        (0, ["the", "quick", "brown", "fox", "leaps", "over", "dogs"]),
        (1, ["an", "entirely", "different", "document", "body", "here"]),
        (1, ["tiny", "doc"]),  # <3 tokens: whole-text fallback shingle
    ]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(minhash_signatures_q("duck")).fetchall()

    exp = []
    for i, (_, w) in enumerate(docs):
        hs = [_h64(g) % MOD for g in _word_ngrams(" ".join(w), NGRAM)]
        for p in range(NUM_PERM):
            a, b = _perm_ab(p)
            exp.append((i, p, min((a * h + b) % MOD for h in hs)))
    assert sorted(got) == sorted(exp)


def test_simhash_near_pairs_matches_direct_python():
    """Fingerprint (tf-weighted 60-bit votes) + 4x15-bit banded candidate
    join + hamming<=20 verify, pairs reported once — the full simhash
    near-dup pipeline replicated bit for bit."""
    from oaim_sandbox_spark.queries_dedup import (
        MAX_HAMMING, SIMHASH_BANDS, SIMHASH_BITS, simhash_near_pairs_q)

    base = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    docs = [
        (0, base),
        (0, base + ["extra"]),          # near-dup of doc 0
        (1, base[:-1] + ["changed"]),   # near-ish
        (1, ["completely", "unrelated", "terms", "list", "now"]),
    ]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(simhash_near_pairs_q("duck")).fetchall()

    def simhash(words):
        votes = [0] * SIMHASH_BITS
        for tk, w in Counter(words).items():
            h = _h64(tk)
            for j in range(SIMHASH_BITS):
                votes[j] += w if (h >> j) & 1 else -w
        return sum(1 << j for j in range(SIMHASH_BITS) if votes[j] > 0)

    fps = {i: simhash(w) for i, (_, w) in enumerate(docs)}
    slice_bits = SIMHASH_BITS // SIMHASH_BANDS
    exp = []
    for a in sorted(fps):
        for b in sorted(fps):
            if a >= b:
                continue
            shares_band = any(
                (fps[a] >> (k * slice_bits)) % (1 << slice_bits)
                == (fps[b] >> (k * slice_bits)) % (1 << slice_bits)
                for k in range(SIMHASH_BANDS))
            ham = bin(fps[a] ^ fps[b]).count("1")
            if shares_band and ham <= MAX_HAMMING:
                exp.append((a, b, ham))
    assert got == exp
    assert (0, 1) in {(a, b) for a, b, _ in exp}  # planted near-dup surfaced


def test_topk_cosine_matches_numpy():
    from oaim_sandbox_spark.queries_relational import topk_cosine

    rng = np.random.default_rng(23)
    vecs = [(i, i % 3, [round(float(x), 4) for x in rng.normal(0, 1, 64)])
            for i in range(40)]
    con = duckdb.connect()
    _mk_embeddings(con, vecs)
    got = con.execute(topk_cosine("duck")).fetchall()

    q = np.array(vecs[0][2])
    scored = []
    for i, _, v in vecs[1:]:
        v = np.array(v)
        dist = 1.0 - float(q @ v) / float(np.linalg.norm(q) * np.linalg.norm(v))
        scored.append((_r6(dist), i))
    scored.sort()
    assert [(r[0],) for r in got] == [(i,) for _, i in scored[:10]]
    for r, (dist, _) in zip(got, scored):
        assert abs(r[1] - dist) < 2e-6


# --- r9-certified math-heavy entries (standing back-fill continues) ------


def test_bigram_entropy_rate_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import bigram_entropy_rate

    docs = [
        (0, ["a", "b", "a", "b", "a", "c"]),    # varied continuations
        (0, ["a", "b", "c", "a", "b"]),
        (1, ["x", "y", "x", "y", "x", "y"]),    # deterministic next-word
        (1, ["solo"]),                          # <2 tokens: excluded
    ]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(bigram_entropy_rate("duck")).fetchall()

    per_src = defaultdict(Counter)
    for _, (s, w) in enumerate(docs):
        if len(w) >= 2:
            per_src[f"src{s}"].update(_word_ngrams(" ".join(w), 2))
    exp = []
    for src in sorted(per_src):
        c12 = per_src[src]
        c1 = Counter()
        for g, c in c12.items():
            c1[g.split(" ")[0]] += c
        n = sum(c12.values())
        h = -sum((c / n) * math.log(c / c1[g.split(" ")[0]])
                 for g, c in c12.items())
        exp.append((src, n, len(c12), h))
    assert [(r[0], r[1], r[2]) for r in got] == [(s, n, dc) for s, n, dc, _ in exp]
    for r, (_, _, _, h) in zip(got, exp):
        assert abs(r[3] - h) < 2e-6
    # deterministic source: conditional entropy exactly 0 (the +0.0 pin)
    assert got[1][3] == 0.0


def test_char_entropy_matches_direct_python():
    from oaim_sandbox_spark.queries_training import char_entropy_q

    docs = [(i % 2, [f"w{i}", "some", "text", "here"]) for i in range(25)]
    docs[0] = (0, ["aaaa", "aaaa"])   # low entropy (a + space only)
    docs[20] = (0, ["abcdefg", "hij"])  # higher entropy
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(char_entropy_q("duck")).fetchall()

    exp = []
    for i, (_, w) in enumerate(docs):
        if i % 20 != 0:
            continue  # the deterministic bench-slice subset
        text = " ".join(w)
        c = Counter(text)  # spaces count: split(text,'') keeps them
        n = len(text)
        h = -sum((k / n) * math.log2(k / n) for k in c.values())
        exp.append((i, h, len(c)))
    assert [(r[0], r[2]) for r in got] == [(i, dc) for i, _, dc in exp]
    for r, (_, h, _) in zip(got, exp):
        assert abs(r[1] - h) < 2e-6
    assert {r[0] for r in got} == {0, 20}


def test_mixture_ess_curve_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import mixture_ess_curve

    # token masses 8 / 4 / 2 across three sources (doc words = ws tokens)
    docs = [(0, [f"a{k}" for k in range(8)]),
            (1, [f"b{k}" for k in range(4)]),
            (2, [f"c{k}" for k in range(2)])]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(mixture_ess_curve("duck")).fetchall()

    masses = {s: len(w) for s, w in docs}
    nn = sum(masses.values())
    exp = []
    for tau in (0.3, 0.7, 1.0):
        raw = {s: (n / nn) ** tau for s, n in masses.items()}
        z = sum(raw.values())
        w = {s: r / z for s, r in raw.items()}
        ess = 1.0 / sum(v * v for v in w.values())
        epochs = {s: w[s] * nn / masses[s] for s in masses}
        exp.append((tau, len(masses), ess, max(epochs.values()),
                    min(epochs.values())))
    assert [(r[0], r[1]) for r in got] == [(t, k) for t, k, _, _, _ in exp]
    for r, (_, _, ess, mx, mn) in zip(got, exp):
        assert abs(r[2] - ess) < 2e-6 and abs(r[3] - mx) < 2e-6 \
            and abs(r[4] - mn) < 2e-6
    # tau=1.0 is proportional sampling: every source runs exactly 1 epoch
    assert got[2][3] == 1.0 and got[2][4] == 1.0


def test_lsh_banding_tradeoff_matches_direct_python():
    """Full pipeline replication at all three bandings: 16-perm MinHash
    signatures -> per-band concat-hash buckets -> distinct candidate pairs
    -> signature-agreement 'strong' counts (est_jaccard >= 0.5)."""
    from oaim_sandbox_spark.queries_dedup import NGRAM, NUM_PERM
    from oaim_sandbox_spark.queries_extended import lsh_banding_tradeoff

    base = ["the", "quick", "brown", "fox", "jumps", "over", "a", "dog"]
    docs = [
        (0, base),
        (0, base[:-1] + ["cat"]),           # near-dup of doc 0
        (1, base),                          # exact dup of doc 0
        (1, ["other", "unrelated", "words", "entirely", "here", "now"]),
        (2, ["fifth", "doc", "with", "its", "own", "content"]),
    ]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(lsh_banding_tradeoff("duck")).fetchall()

    sigs = {}
    for i, (_, w) in enumerate(docs):
        hs = [_h64(g) % MOD for g in _word_ngrams(" ".join(w), NGRAM)]
        sigs[i] = [min((a * h + b) % MOD for h in hs)
                   for a, b in (_perm_ab(p) for p in range(NUM_PERM))]
    exp = []
    for bands in (2, 4, 8):
        rows = NUM_PERM // bands
        cands = set()
        for bidx in range(bands):
            buckets = defaultdict(list)
            for i, sig in sigs.items():
                key = _h64(",".join(str(v) for v in
                                    sig[bidx * rows:(bidx + 1) * rows]))
                buckets[key].append(i)
            for ids in buckets.values():
                for x in ids:
                    for y in ids:
                        if x < y:
                            cands.add((x, y))
        strong = sum(
            1 for a, b in cands
            if sum(u == v for u, v in zip(sigs[a], sigs[b])) >= NUM_PERM // 2)
        exp.append((bands, rows, len(cands), strong,
                    None if not cands else strong / len(cands)))
    assert [(r[0], r[1], r[2], r[3]) for r in got] == \
           [(b, rws, nc, ns) for b, rws, nc, ns, _ in exp]
    for r, (_, _, _, _, prec) in zip(got, exp):
        if prec is None:
            assert r[4] is None
        else:
            assert abs(r[4] - prec) < 2e-6
    # the planted exact dup is strong at EVERY banding; candidates grow
    # (or hold) as bands narrow
    assert all(r[3] >= 1 for r in got)
    assert got[0][2] <= got[1][2] <= got[2][2]


def test_quantization_error_profile_matches_numpy():
    from oaim_sandbox_spark.queries_extended import quantization_error_profile

    rng = np.random.default_rng(31)
    vecs = [(i, i % 2, [round(float(x), 4) for x in rng.normal(0, 1, 64)])
            for i in range(12)]
    con = duckdb.connect()
    _mk_embeddings(con, vecs)
    got = con.execute(quantization_error_profile("duck")).fetchall()

    per_label = defaultdict(list)
    for i, lab, v in vecs:
        x = np.array(v)
        s = max(np.abs(x).max(), 1e-30)
        xq = np.floor(x / s * 127.0 + 0.5) * s / 127.0
        err = np.abs(x - xq)
        den = np.linalg.norm(x) * np.linalg.norm(xq)
        shift = 1.0 - float(x @ xq) / den if den else None
        per_label[lab].append((err.mean(), err.max(), shift))
    exp = []
    for lab in sorted(per_label):
        rows = per_label[lab]
        exp.append((lab, len(rows),
                    sum(r[0] for r in rows) / len(rows),
                    max(r[1] for r in rows),
                    sum(r[2] for r in rows) / len(rows)))
    assert [(r[0], r[1]) for r in got] == [(l, n) for l, n, _, _, _ in exp]
    for r, (_, _, me, mx, cs) in zip(got, exp):
        assert abs(r[2] - me) < 2e-6 and abs(r[3] - mx) < 2e-6 \
            and abs(r[4] - cs) < 2e-6
    # int8 round-trip is tight on well-scaled vectors but never exactly 0
    assert all(0 < r[2] < 0.02 for r in got)


def test_split_balance_audit_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import split_balance_audit

    docs = [(i % 3, [f"w{i}", "text"]) for i in range(60)]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(split_balance_audit("duck")).fetchall()

    assign = {}
    for i in range(60):
        h = _h64(f"{i}-split-v1") % 10
        assign[i] = "train" if h < 8 else ("valid" if h == 8 else "test")
    per = Counter((f"src{i % 3}", assign[i]) for i in range(60))
    tot = Counter(f"src{i % 3}" for i in range(60))
    g = Counter(assign.values())
    exp = []
    for (src, split), n in sorted(per.items()):
        fi = n / tot[src]
        fg = g[split] / 60
        exp.append((src, split, n, fi, fg, abs(fi - fg)))
    assert [(r[0], r[1], r[2]) for r in got] == [(s, sp, n) for s, sp, n, _, _, _ in exp]
    for r, (_, _, _, fi, fg, dev) in zip(got, exp):
        assert abs(r[3] - fi) < 2e-6 and abs(r[4] - fg) < 2e-6 \
            and abs(r[5] - dev) < 2e-6
    assert {r[1] for r in got} <= {"train", "valid", "test"}


def test_packing_fragmentation_curve_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import packing_fragmentation_curve

    rng = np.random.default_rng(37)
    docs = []
    for i in range(40):
        k = int(rng.integers(20, 400))
        docs.append((i % 2, [f"t{i}x{j}" for j in range(k)]))
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(packing_fragmentation_curve("duck")).fetchall()

    by_src = defaultdict(list)
    for i, (s, w) in enumerate(docs):
        by_src[f"src{s}"].append((i, len(w)))
    exp = []
    for ctx in (256, 1024, 4096):
        n_split = crossings = n_docs = 0
        for src in by_src:
            run = 0
            for _, n in sorted(by_src[src]):
                first, last = run // ctx, (run + n - 1) // ctx
                n_docs += 1
                if n > 0 and first != last:
                    n_split += 1
                if n > 0:
                    crossings += last - first
                run += n
        exp.append((ctx, n_docs, n_split, n_split / n_docs, crossings))
    assert [(r[0], r[1], r[2], r[4]) for r in got] == \
           [(c, nd, ns, cr) for c, nd, ns, _, cr in exp]
    for r, (_, _, _, frac, _) in zip(got, exp):
        assert abs(r[3] - frac) < 2e-6
    # the curve is monotone: bigger contexts fragment fewer docs
    splits = [r[2] for r in got]
    assert splits[0] >= splits[1] >= splits[2]


def test_k_anonymity_audit_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import K_ANON, k_anonymity_audit

    langs, docs = {}, []
    # src0/en: 6 docs of ~same decile (safe); src1/de: 2 docs (violates);
    # src2/fr: 1 long doc in decile 9 (violates)
    for i in range(6):
        langs[i] = "en"
        docs.append((0, ["w"] * 10))          # n_chars 19 -> decile 0
    for i in (6, 7):
        langs[i] = "de"
        docs.append((1, ["x"] * 10))
    langs[8] = "fr"
    docs.append((2, ["y" * 30] * 40))         # n_chars > 900 -> decile 9
    con = duckdb.connect()
    _mk_docs(con, docs, langs=langs)
    got = con.execute(k_anonymity_audit("duck")).fetchall()

    classes = Counter()
    for i, (s, w) in enumerate(docs):
        dec = min(9, len(" ".join(w)) // 100)
        classes[(langs[i], f"src{s}", dec)] += 1
    exp = sorted((lg, sr, dec, n, 1) for (lg, sr, dec), n in classes.items()
                 if n < K_ANON)
    assert got == exp
    assert ("de", "src1", 0, 2, 1) in got and len(got) == 2  # safe class absent


def test_dp_noisy_counts_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import DP_EPSILON, dp_noisy_counts

    langs, docs = {}, []
    i = 0
    for s, lg, n in ((0, "en", 7), (0, "de", 3), (1, "en", 12)):
        for _ in range(n):
            langs[i] = lg
            docs.append((s, [f"w{i}", "text"])); i += 1
    con = duckdb.connect()
    _mk_docs(con, docs, langs=langs)
    got = con.execute(dp_noisy_counts("duck")).fetchall()

    counts = Counter((f"src{s}", langs[j]) for j, (s, _) in enumerate(docs))
    exp = []
    for (src, lg), n in sorted(counts.items()):
        u = ((_h64(f"dp:{src}:{lg}") % 1_000_000) + 0.5) / 1_000_000.0
        noise = (1.0 if u < 0.5 else -1.0) * math.log(1.0 - 2.0 * abs(u - 0.5)) / DP_EPSILON
        noisy = max(0, int(math.copysign(math.floor(abs(n + noise) + 0.5), n + noise)))
        exp.append((src, lg, noisy,
                    "laplace-seeded-hash-demo (NOT differentially private)"))
    assert got == exp
    # the mechanism actually perturbed at least one count
    raw = {(s, lg): n for (s, lg), n in counts.items()}
    assert any(r[2] != raw[(r[0], r[1])] for r in got)


def test_event_pattern_match_matches_direct_python():
    import re

    from oaim_sandbox_spark.queries_extended import event_pattern_match

    rows, eid = [], 0
    seqs = {
        0: ["click", "view", "error", "purchase", "click", "purchase"],  # 2 matches
        5: ["click", "view", "view", "signup", "purchase"],  # s breaks: 0 matches
        10: ["view", "click", "purchase"],                    # 1 match
        3: ["click", "purchase"],                             # uid % 5 != 0: excluded
    }
    for uid, ets in seqs.items():
        for k, et in enumerate(ets):
            rows.append((eid, uid, et, 1_000_000 * (100 * uid + k), 1.0)); eid += 1
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(event_pattern_match("duck")).fetchall()

    sym = {"click": "c", "view": "v", "error": "e", "signup": "s",
           "purchase": "p"}
    exp = []
    for uid in sorted(seqs):
        if uid % 5 != 0:
            continue
        s = "".join(sym[e] for e in seqs[uid])
        n = len(re.findall(r"c[ve]*p", s))
        if n > 0:
            exp.append((uid, len(s), n))
    assert got == exp
    assert (0, 6, 2) in got and all(r[0] != 5 for r in got)


def test_weekly_cohort_retention_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import weekly_cohort_retention

    wk_us = 7 * 86400 * 1_000_000
    rows, eid = [], 0
    plan = {  # uid -> active weeks
        1: [0, 1, 3], 2: [0], 3: [1, 2], 4: [1],
    }
    for uid, wks in plan.items():
        for w in wks:
            rows.append((eid, uid, "click", w * wk_us + eid, 1.0)); eid += 1
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(weekly_cohort_retention("duck")).fetchall()

    first = {u: min(w) for u, w in plan.items()}
    cohort_size = Counter(first.values())
    active = defaultdict(set)
    for u, wks in plan.items():
        for w in wks:
            active[(first[u], w)].add(u)
    exp = sorted(
        (cw, w - cw, cohort_size[cw], len(us), len(us) / cohort_size[cw])
        for (cw, w), us in active.items())
    assert [(r[0], r[1], r[2], r[3]) for r in got] == \
           [(cw, off, cu, na) for cw, off, cu, na, _ in exp]
    for r, (_, _, _, _, ret) in zip(got, exp):
        assert abs(r[4] - ret) < 2e-6
    # week-0 retention is definitionally 1.0 for every cohort
    assert all(r[4] == 1.0 for r in got if r[1] == 0)


def test_federated_label_topk_matches_numpy():
    """Two-stage local-k/global-k merge pinned lossless: numpy computes the
    flat global top-5 over all labels AND the per-label top-3 merge — both
    must equal the SQL output on a store where every label contributes."""
    from oaim_sandbox_spark.queries_extended import federated_label_topk

    rng = np.random.default_rng(41)
    vecs = [(i, i % 3, [round(float(x), 4) for x in rng.normal(0, 1, 64)])
            for i in range(30)]
    con = duckdb.connect()
    _mk_embeddings(con, vecs)
    got = con.execute(federated_label_topk("duck")).fetchall()

    q = np.array(vecs[0][2])
    scored = []
    for i, lab, v in vecs[1:]:
        v = np.array(v)
        dist = _r6(1.0 - float(q @ v) / float(np.linalg.norm(q) * np.linalg.norm(v)))
        scored.append((dist, lab, i))
    # local top-3 per label, then global top-5 (distance, label, id order)
    local = []
    for lab in (0, 1, 2):
        mine = sorted((d, i) for d, l, i in scored if l == lab)[:3]
        local += [(d, lab, i) for d, i in mine]
    merged = sorted(local)[:5]
    flat = sorted(scored)[:5]
    assert merged == flat  # the cut is lossless with k_local >= k_global
    assert [(r[1], r[0]) for r in got] == [(i, lab) for _, lab, i in merged]
    for r, (d, _, _) in zip(got, merged):
        assert abs(r[2] - d) < 2e-6


def test_point_in_time_join_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import point_in_time_join

    rows, eid = [], 0
    # user 0 (uid % 9 == 0): purchases at t=100s (v=10) and t=300s (v=20);
    # clicks BEFORE first purchase (cold start), between (sees 10 — never
    # the later 20), exactly AT a boundary (100s -> sees 10; 300s -> 20)
    for ts, et, v in ((50, "click", 0.0), (100, "purchase", 10.0),
                      (100, "click", 0.0), (200, "click", 0.0),
                      (300, "purchase", 20.0), (300, "click", 0.0),
                      (400, "click", 0.0)):
        rows.append((eid, 0, et, ts * 1_000_000, v)); eid += 1
    # user 9: clicks, never purchases -> all cold start
    rows.append((eid, 9, "click", 1_000_000, 1.0)); eid += 1
    # user 2 (uid % 9 != 0): excluded from the click side
    rows.append((eid, 2, "click", 1_000_000, 1.0)); eid += 1
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(point_in_time_join("duck")).fetchall()

    exp = []
    for e, (ts, state, cold) in zip(
        [r for r in rows if r[2] == "click" and r[1] % 9 == 0],
        [(50, None, 1), (100, 10.0, 0), (200, 10.0, 0), (300, 20.0, 0),
         (400, 20.0, 0), (1, None, 1)],
    ):
        exp.append((e[0], e[1], ts * 1_000_000, state, cold))
    assert got == exp
    # the leakage cases pinned: pre-purchase click is NULL (never the
    # future 10), boundary click sees the state that became valid AT its ts
    assert got[0][3] is None and got[1][3] == 10.0 and got[3][3] == 20.0


def test_context_fit_stats_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import context_fit_stats

    rng = np.random.default_rng(43)
    docs = []
    for i in range(12):
        k = int(rng.choice([50, 3000, 10000, 40000]))
        docs.append((i % 2, ["w"] * k))
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(context_fit_stats("duck")).fetchall()

    by_src = defaultdict(list)
    for s, w in docs:
        by_src[f"src{s}"].append(len(w))
    exp = []
    for src in sorted(by_src):
        for ctx in (2048, 8192, 32768):
            vs = by_src[src]
            trunc = sum(max(0, v - ctx) for v in vs)
            exp.append((src, ctx, len(vs), sum(1 for v in vs if v <= ctx),
                        trunc, trunc / sum(vs)))
    assert [(r[0], r[1], r[2], r[3], r[4]) for r in got] == \
           [(s, c, n, f, t) for s, c, n, f, t, _ in exp]
    for r, (_, _, _, _, _, frac) in zip(got, exp):
        assert abs(r[5] - frac) < 2e-6
    # the curve moves: larger contexts truncate strictly less (fixture has
    # docs straddling every boundary)
    for src in sorted(by_src):
        tr = [r[4] for r in got if r[0] == src]
        assert tr[0] > tr[1] > tr[2] >= 0


def test_label_agreement_kappa_matches_direct_python():
    from oaim_sandbox_spark.operators.text_analysis import STOPWORDS
    from oaim_sandbox_spark.queries_extended import label_agreement_kappa

    all_stop = {w for ws in STOPWORDS.values() for w in ws}
    stop_rich = ["the", "a", "of", "to", "in"]
    docs = [
        (0, (stop_rich + ["filler"]) * 10),   # long + stoppy: both yes
        (0, ["短"] * 3),                       # short + no stopwords: both no
        (0, (["unique" + str(j) for j in range(60)])),  # long, not stoppy
        (1, stop_rich * 3),                    # short but stoppy
        (1, (stop_rich + ["pad"]) * 12),
    ]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(label_agreement_kappa("duck")).fetchall()

    per = defaultdict(list)
    for s, w in docs:
        text = " ".join(w)
        la = int(len(text) >= 200)
        toks = _toks(text.lower())
        stop = _r6(sum(t in all_stop for t in toks) / len(toks))
        lb = int(stop >= 0.10)
        per[f"src{s}"].append((la, lb))
    exp = []
    for src in sorted(per):
        rows = per[src]
        n = len(rows)
        pa = sum(a for a, _ in rows)
        pb = sum(b for _, b in rows)
        agree = sum(1 for a, b in rows if a == b)
        po = agree / n
        pe = (pa * pb + (n - pa) * (n - pb)) / (n * n)
        kappa = None if 1.0 - pe == 0 else (po - pe) / (1.0 - pe)
        exp.append((src, n, pa, pb, agree, kappa))
    assert [(r[0], r[1], r[2], r[3], r[4]) for r in got] == \
           [(s, n, pa, pb, ag) for s, n, pa, pb, ag, _ in exp]
    for r, (_, _, _, _, _, k) in zip(got, exp):
        if k is None:
            assert r[5] is None
        else:
            assert abs(r[5] - k) < 2e-6


def test_ks_length_by_source_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import ks_length_by_source

    rng = np.random.default_rng(47)
    docs = []
    for i in range(40):
        # src0 short-ish, src1 long-ish -> a real KS gap with known argmax
        base = 3 if i % 2 == 0 else 9
        docs.append((i % 2, ["w"] * int(base + rng.integers(0, 4))))
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(ks_length_by_source("duck")).fetchall()

    lens = defaultdict(list)
    for s, w in docs:
        lens[f"src{s}"].append(len(" ".join(w)))
    all_lens = [v for vs in lens.values() for v in vs]
    grid = sorted(set(all_lens))
    exp = []
    for src in sorted(lens):
        best = None
        for v in grid:
            fs = sum(1 for x in lens[src] if x <= v) / len(lens[src])
            fc = sum(1 for x in all_lens if x <= v) / len(all_lens)
            gap = abs(fs - fc)
            if best is None or gap > best[0] + 1e-12:
                best = (gap, v)
        exp.append((src, len(lens[src]), best[0], best[1]))
    assert [(r[0], r[1], r[3]) for r in got] == \
           [(s, n, v) for s, n, _, v in exp]
    for r, (_, _, gap, _) in zip(got, exp):
        assert abs(r[2] - gap) < 2e-6
    # the two planted distributions genuinely diverge
    assert all(r[2] > 0.3 for r in got)


def test_token_gini_by_source_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import token_gini_by_source

    docs = [
        (0, ["w"] * 5), (0, ["w"] * 5), (0, ["w"] * 5),   # uniform: gini low
        (1, ["w"] * 1), (1, ["w"] * 1), (1, ["w"] * 98),  # concentrated
    ]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(token_gini_by_source("duck")).fetchall()

    per = defaultdict(list)
    for s, w in docs:
        per[f"src{s}"].append(len(w))
    exp = []
    for src in sorted(per):
        vs = sorted(per[src])
        freq = Counter(vs)
        n, stot = len(vs), sum(vs)
        s_cum, acc = 0, 0
        for v in sorted(freq):
            f = freq[v]
            prev = s_cum
            s_cum += v * f
            acc += f * (prev + s_cum)
        gini = 1.0 - acc / (n * stot)
        exp.append((src, n, stot, gini))
    assert [(r[0], r[1], r[2]) for r in got] == [(s, n, t) for s, n, t, _ in exp]
    for r, (_, _, _, g) in zip(got, exp):
        assert abs(r[3] - g) < 2e-6
    assert got[0][3] < 0.05 < got[1][3]  # uniform vs concentrated separated


def test_key_skew_profile_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import key_skew_profile

    con = duckdb.connect()
    ev = [(i, 1 if i < 12 else i, "click", 1_000_000 * i, 1.0)
          for i in range(20)]  # user 1 owns 12/20 rows — hot key
    _mk_events(con, ev)
    li = [(k % 3, k % 5) for k in range(30)]
    con.execute("CREATE TABLE lineitem AS SELECT * FROM (VALUES "
                + ", ".join(f"({a}, {b})" for a, b in li)
                + ") AS v(l_orderkey, l_partkey)")
    orders = [(k % 4,) for k in range(16)]
    con.execute("CREATE TABLE orders AS SELECT * FROM (VALUES "
                + ", ".join(f"({a})" for a, in orders)
                + ") AS v(o_custkey)")
    got = con.execute(key_skew_profile("duck")).fetchall()

    keysets = {
        "events.user_id": [r[1] for r in ev],
        "lineitem.l_orderkey": [a for a, _ in li],
        "lineitem.l_partkey": [b for _, b in li],
        "orders.o_custkey": [a for a, in orders],
    }
    exp = []
    for col in sorted(keysets):
        c = Counter(keysets[col])
        rows = sum(c.values())
        top = sorted(c.values(), reverse=True)
        exp.append((col, rows, len(c), top[0] / rows,
                    sum(top[:10]) / rows,
                    sum(v * v for v in c.values()) / (rows * rows)))
    assert [(r[0], r[1], r[2]) for r in got] == [(c, n, k) for c, n, k, _, _, _ in exp]
    for r, (_, _, _, t1, t10, hf) in zip(got, exp):
        assert abs(r[3] - t1) < 2e-6 and abs(r[4] - t10) < 2e-6 \
            and abs(r[5] - hf) < 2e-6
    # the planted hot key reads 0.6 top1 share
    assert abs(got[0][3] - 0.6) < 1e-9


def test_dedup_threshold_sensitivity_matches_direct_python():
    """Full pipeline: 16-perm signatures -> 4-band LSH candidates ->
    est_jaccard >= t cuts at 0.5/0.7/0.9 -> first-wins greater-id drops
    + token mass saved, cumulative per threshold."""
    from oaim_sandbox_spark.queries_dedup import BANDS, NGRAM, NUM_PERM
    from oaim_sandbox_spark.queries_extended import dedup_threshold_sensitivity

    base = ["the", "quick", "brown", "fox", "jumps", "over", "a", "dog"]
    docs = [
        (0, base),
        (0, base),                          # exact dup (est 1.0)
        (1, base[:-1] + ["cat"]),           # near (est somewhere in (0,1))
        (1, ["other", "unrelated", "words", "entirely", "here", "now"]),
    ]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(dedup_threshold_sensitivity("duck")).fetchall()

    sigs, toks = {}, {}
    for i, (_, w) in enumerate(docs):
        hs = [_h64(g) % MOD for g in _word_ngrams(" ".join(w), NGRAM)]
        sigs[i] = [min((a * h + b) % MOD for h in hs)
                   for a, b in (_perm_ab(p) for p in range(NUM_PERM))]
        toks[i] = len(w)
    rows = NUM_PERM // BANDS
    cands = set()
    for bidx in range(BANDS):
        buckets = defaultdict(list)
        for i, sig in sigs.items():
            key = _h64(",".join(str(v) for v in sig[bidx * rows:(bidx + 1) * rows]))
            buckets[key].append(i)
        for ids in buckets.values():
            for x in ids:
                for y in ids:
                    if x < y:
                        cands.add((x, y))
    est = {(a, b): sum(u == v for u, v in zip(sigs[a], sigs[b])) / NUM_PERM
           for a, b in cands}
    exp = []
    for t in (0.5, 0.7, 0.9):
        surv = [(a, b) for (a, b), e in est.items() if e >= t]
        dropped = {max(a, b) for a, b in surv}
        exp.append((t, len(surv), len(dropped),
                    sum(toks[i] for i in dropped)))
    assert got == exp
    assert got[2][1] >= 1  # the exact dup survives even the 0.9 cut


def test_reachability_bfs_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import BFS_MAX_HOPS, reachability_bfs

    docs = [(i % 3, [f"w{i}", "text"]) for i in range(12)]  # ids 0..11 < 100
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(reachability_bfs("duck")).fetchall()

    nn = len(docs)
    edges = defaultdict(list)
    for i in range(nn):
        for k in (1, 2, 3):
            edges[i].append(_h64(f"{i}#{k}") % nn)
    dist = {0: 0}
    frontier = [0]
    for hop in range(1, BFS_MAX_HOPS + 1):
        nxt = []
        for u in frontier:
            for v in edges[u]:
                if v not in dist:
                    dist[v] = hop
                    nxt.append(v)
        frontier = nxt
    exp = sorted(dist.items(), key=lambda kv: (kv[1], kv[0]))
    assert got == exp
    assert max(d for _, d in exp) >= 2  # the walk actually went multi-hop


def test_quality_threshold_parity_matches_direct_python():
    from oaim_sandbox_spark.operators.text_analysis import STOPWORDS
    from oaim_sandbox_spark.queries_extended import quality_threshold_parity

    all_stop = {w for ws in STOPWORDS.values() for w in ws}
    rich = ["the", "a", "of", "to", "in", "quality", "content", "here"]
    docs = [
        (0, rich * 8), (0, rich * 4), (0, ["qx"] * 5),        # src0 high-ish
        # src1: three uniformly LOW docs whose scores straddle only the
        # LOCAL mean — the fairness gap by construction
        (1, ["zz"] * 4), (1, ["yy"] * 6), (1, ["yy"] * 8),
    ]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(quality_threshold_parity("duck")).fetchall()

    def score(text):
        toks = _toks(text)
        stop = _r6(sum(t in all_stop for t in _toks(text.lower())) / len(toks))
        digit = _r6(sum(c.isdigit() for c in text) / len(text))
        return _r6(0.4 * min(len(text) / 1000.0, 1.0)
                   + 0.4 * min(stop * 5.0, 1.0)
                   + 0.2 * (1.0 - min(digit * 10.0, 1.0)))

    per = defaultdict(list)
    for s, w in docs:
        per[f"src{s}"].append(score(" ".join(w)))
    allq = [q for qs in per.values() for q in qs]
    gthr = sum(allq) / len(allq)
    exp = []
    for src in sorted(per):
        qs = per[src]
        lthr = sum(qs) / len(qs)
        gp = sum(1 for q in qs if q >= gthr)
        lp = sum(1 for q in qs if q >= lthr)
        ag = sum(1 for q in qs if (q >= gthr) == (q >= lthr))
        exp.append((src, len(qs), lthr, gp, lp, ag))
    assert [(r[0], r[1], r[3], r[4], r[5]) for r in got] == \
           [(s, n, gp, lp, ag) for s, n, _, gp, lp, ag in exp]
    for r, (_, _, lthr, _, _, _) in zip(got, exp):
        assert abs(r[2] - lthr) < 2e-6
    # the fairness gap is real on this fixture: the low source passes more
    # under its local threshold than the global one
    src1 = [r for r in got if r[0] == "src1"][0]
    assert src1[4] > src1[3]


def test_near_dup_rate_by_source_matches_direct_python():
    """simhash pair graph rolled up to (source_a, source_b) with pair
    rates — reuses the full fingerprint/banding replica and adds the
    attribution joins."""
    from oaim_sandbox_spark.queries_dedup import (
        MAX_HAMMING, SIMHASH_BANDS, SIMHASH_BITS)
    from oaim_sandbox_spark.queries_extended import near_dup_rate_by_source

    base = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    docs = [
        (0, base),
        (0, base + ["extra"]),
        (1, base[:-1] + ["changed"]),
        (1, ["completely", "unrelated", "terms", "list", "now"]),
        (2, base + ["another"]),
    ]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(near_dup_rate_by_source("duck")).fetchall()

    def simhash(words):
        votes = [0] * SIMHASH_BITS
        for tk, w in Counter(words).items():
            h = _h64(tk)
            for j in range(SIMHASH_BITS):
                votes[j] += w if (h >> j) & 1 else -w
        return sum(1 << j for j in range(SIMHASH_BITS) if votes[j] > 0)

    fps = {i: simhash(w) for i, (_, w) in enumerate(docs)}
    src = {i: f"src{s}" for i, (s, _) in enumerate(docs)}
    n_docs = Counter(src.values())
    sb = SIMHASH_BITS // SIMHASH_BANDS
    pairs = []
    for a in fps:
        for b in fps:
            if a >= b:
                continue
            shares = any((fps[a] >> (k * sb)) % (1 << sb)
                         == (fps[b] >> (k * sb)) % (1 << sb)
                         for k in range(SIMHASH_BANDS))
            if shares and bin(fps[a] ^ fps[b]).count("1") <= MAX_HAMMING:
                pairs.append((min(src[a], src[b]), max(src[a], src[b])))
    attributed = Counter(pairs)
    exp = sorted(
        ((sa, sb_, n, int(sa == sb_), n / (n_docs[sa] * n_docs[sb_]))
         for (sa, sb_), n in attributed.items()),
        key=lambda t: (-t[2], t[0], t[1]))[:30]
    assert [(r[0], r[1], r[2], r[3]) for r in got] == \
           [(a, b, n, i) for a, b, n, i, _ in exp]
    for r, (_, _, _, _, rate) in zip(got, exp):
        assert abs(r[4] - rate) < 2e-6
    assert any(r[3] == 0 for r in got)  # a cross-source pair surfaced
