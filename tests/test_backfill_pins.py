"""Independent naive-Python pins BACK-FILLED for pre-r9 certified entries
(VERDICT r10 task #3): the DuckDB oracle certifies Spark-vs-DuckDB
agreement on the SAME SQL, so a wrong shared query certifies green — only
a direct recomputation catches it (the r10 sweepline/Gopher precedent).
These ten cover the highest-risk older statistics entries."""

import hashlib
import math
from collections import Counter

import duckdb

MOD = 1_000_000_007


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


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


def _mk_events(con, rows):
    """rows: (event_id, user_id, event_type, ts_us, value)."""
    vals = ", ".join(
        f"({eid}, make_timestamp({ts}), {uid}, '{et}', {val}, '{{}}')"
        for eid, uid, et, ts, val in rows
    )
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + vals + ") AS v(event_id, ts, user_id, event_type, value, props)"
    )


def test_ab_test_zscore_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import ab_test_zscore

    rows, eid = [], 0
    for uid in range(40):
        # some users convert (purchase >= 150), deterministically by uid
        for j in range(2):
            val = 200.0 if uid % 3 == 0 and j == 0 else 10.0
            et = "purchase" if j == 0 else "click"
            rows.append((eid, uid, et, 1_000_000 * eid, val)); eid += 1
    con = duckdb.connect()
    _mk_events(con, rows)
    (na, ca, nb, cb, ra, rb, z, verdict) = con.execute(ab_test_zscore("duck")).fetchone()
    arms = {}
    for uid in range(40):
        arm = "A" if (_h64(f"{uid}-ab") % MOD) % 2 == 0 else "B"
        conv = 1 if uid % 3 == 0 else 0
        n, c = arms.get(arm, (0, 0))
        arms[arm] = (n + 1, c + conv)
    (ena, eca), (enb, ecb) = arms["A"], arms["B"]
    assert (na, ca, nb, cb) == (ena, eca, enb, ecb)
    pa, pb, pp = eca / ena, ecb / enb, (eca + ecb) / (ena + enb)
    ez = (pa - pb) / math.sqrt(pp * (1 - pp) * (1 / ena + 1 / enb))
    assert abs(z - ez) < 2e-6
    assert verdict == ("significant" if abs(ez) >= 1.96 else "not_significant")


def test_cusum_changepoint_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import cusum_changepoint

    day_us = 86400 * 1_000_000
    # volumes shift upward on day 5: 3,3,3,3,3,9,9,9
    counts = [3, 3, 3, 3, 3, 9, 9, 9]
    rows, eid = [], 0
    for day, n in enumerate(counts):
        for _ in range(n):
            rows.append((eid, 1, "click", day * day_us + eid, 0.5)); eid += 1
    con = duckdb.connect()
    _mk_events(con, rows)
    (cp_day, peak, day_count) = con.execute(cusum_changepoint("duck")).fetchone()
    mu = sum(counts) / len(counts)
    s, best = 0.0, None
    for day, n in enumerate(counts):
        s += n - mu
        if best is None or abs(s) > abs(best[1]) + 1e-12:
            best = (day, s, n)
    assert (cp_day, day_count) == (best[0], best[2])
    assert abs(peak - best[1]) < 2e-6


def test_psi_value_drift_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import (
        PSI_BINS,
        PSI_HI,
        PSI_LO,
        psi_value_drift,
    )

    jan = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z epoch micros
    day_us = 86400 * 1_000_000
    rows, eid = [], 0
    for i in range(60):
        # ref window: low values; cur window: shifted upward
        ts = jan + (5 if i < 30 else 20) * day_us + eid
        val = 20.0 + (i % 5) if i < 30 else 120.0 + (i % 7)
        rows.append((eid, 1, "click", ts, val)); eid += 1
    con = duckdb.connect()
    _mk_events(con, rows)
    (et, psi, verdict) = con.execute(psi_value_drift("duck")).fetchone()
    width = (PSI_HI - PSI_LO) / PSI_BINS
    bins = {"ref": Counter(), "cur": Counter()}
    for i in range(60):
        w = "ref" if i < 30 else "cur"
        val = 20.0 + (i % 5) if i < 30 else 120.0 + (i % 7)
        b = min(max(int(math.floor((val - PSI_LO) / width)), 0), PSI_BINS - 1)
        bins[w][b] += 1
    tr, tc = sum(bins["ref"].values()), sum(bins["cur"].values())
    epsi = 0.0
    for b in range(PSI_BINS):
        pr = (bins["ref"][b] + 0.5) / (tr + 0.5 * PSI_BINS)
        pc = (bins["cur"][b] + 0.5) / (tc + 0.5 * PSI_BINS)
        epsi += (pc - pr) * math.log(pc / pr)
    assert et == "click"
    assert abs(psi - epsi) < 2e-6
    assert verdict == ("stable" if epsi < 0.1 else
                       "moderate" if epsi < 0.25 else "shifted")


def test_token_gini_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import token_gini_by_source

    docs = [(0, ["w"] * n) for n in (1, 1, 2, 3, 5, 8, 13, 40)] + \
           [(1, ["w"] * 4) for _ in range(5)]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = {r[0]: r[1:] for r in con.execute(token_gini_by_source("duck")).fetchall()}
    per = {}
    for s, words in docs:
        per.setdefault(f"src{s}", []).append(len(words))
    for src, vals in per.items():
        g = Counter(vals)
        n, stot = len(vals), sum(vals)
        s_cum, acc = 0, 0
        for v in sorted(g):
            prev = s_cum
            s_cum += v * g[v]
            acc += g[v] * (prev + s_cum)
        gini = 1.0 - acc / (n * stot)
        r = got[src]
        assert (r[0], r[1]) == (n, stot), (src, r)
        assert abs(r[2] - gini) < 2e-6, (src, r[2], gini)


def test_tokenizer_fertility_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import tokenizer_fertility

    docs = [(0, ["alpha", "be", "c"]), (0, ["dd", "ee"]), (1, ["ffff"])]
    langs = {0: "en", 1: "en", 2: "de"}
    con = duckdb.connect()
    _mk_docs(con, docs, langs)
    got = {r[0]: r[1:] for r in con.execute(tokenizer_fertility("duck")).fetchall()}
    per = {}
    for i, (s, words) in enumerate(docs):
        text = " ".join(words)
        lang = langs[i]
        d, t, c, tc = per.get(lang, (0, 0, 0, 0))
        per[lang] = (d + 1, t + len(words), c + len(text),
                     tc + sum(len(w) for w in words))
    for lang, (nd, toks, chars, tchars) in per.items():
        r = got[lang]
        assert (r[0], r[1], r[2]) == (nd, toks, chars), (lang, r)
        assert abs(r[3] - toks * 100.0 / chars) < 2e-6
        assert abs(r[4] - tchars / toks) < 2e-6


def test_zipf_alpha_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import zipf_alpha_by_lang

    # zipf-ish counts: token t_i appears ~ 60/i times
    words = []
    for i in range(1, 13):
        words.extend([f"t{i:02d}"] * (60 // i))
    docs = [(0, words[j::3]) for j in range(3)]
    con = duckdb.connect()
    _mk_docs(con, docs)
    (lang, n_terms, alpha, r2) = con.execute(zipf_alpha_by_lang("duck")).fetchone()
    c = Counter(w for _, ws in docs for w in ws)
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:500]
    pts = [(math.log(i + 1), math.log(cnt)) for i, (_, cnt) in enumerate(ranked)]
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    ealpha = -(n * sxy - sx * sy) / (n * sxx - sx * sx)
    er2 = ((n * sxy - sx * sy) ** 2) / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert (lang, n_terms) == ("en", n)
    assert abs(alpha - ealpha) < 2e-5
    assert abs(r2 - er2) < 2e-5
    assert alpha > 0.5  # the planted distribution IS zipf-ish


def test_kl_divergence_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import kl_divergence_by_source

    docs = [
        (0, ["a", "a", "a", "b", "c"]),
        (0, ["a", "b", "b", "d"]),
        (1, ["x", "x", "y", "a"]),
        (1, ["y", "y", "z", "z", "z"]),
    ]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = {r[0]: (r[1], r[2]) for r in
           con.execute(kl_divergence_by_source("duck")).fetchall()}
    per, corp = {}, Counter()
    for s, words in docs:
        per.setdefault(f"src{s}", Counter()).update(words)
        corp.update(words)
    vocab = len(corp)
    total = sum(corp.values())
    for src, cnts in per.items():
        tot = sum(cnts.values())
        kl = 0.0
        for w in corp:  # FULL corpus vocab, absent tokens smoothed
            p = (cnts[w] + 1.0) / (tot + vocab)
            q = (corp[w] + 1.0) / (total + vocab)
            kl += p * math.log(p / q)
        g_kl, g_n = got[src]
        assert g_n == len(cnts)
        assert abs(g_kl - kl) < 2e-5, (src, g_kl, kl)


def test_event_corr_matrix_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import event_corr_matrix

    hr_us = 3_600_000_000
    # co-moving click/view, anti-moving error
    vols = {"click": [5, 1, 4, 2, 6], "view": [4, 1, 5, 2, 5],
            "error": [1, 6, 2, 5, 1]}
    rows, eid = [], 0
    for et, per_hr in vols.items():
        for h, n in enumerate(per_hr):
            for _ in range(n):
                rows.append((eid, 1, et, h * hr_us + eid, 0.5)); eid += 1
    con = duckdb.connect()
    _mk_events(con, rows)
    got = {(r[0], r[1]): (r[2], r[3]) for r in
           con.execute(event_corr_matrix("duck")).fetchall()}

    def pearson(a, b):
        n = len(a)
        ma, mb = sum(a) / n, sum(b) / n
        cov = sum((x - ma) * (y - mb) for x, y in zip(a, b))
        va = math.sqrt(sum((x - ma) ** 2 for x in a))
        vb = math.sqrt(sum((y - mb) ** 2 for y in b))
        return cov / (va * vb)

    types = sorted(vols)
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            nh, corr = got[(a, b)]
            assert nh == 5
            assert abs(corr - pearson(vols[a], vols[b])) < 2e-6, (a, b)
    assert got[("click", "view")][1] > 0.9
    assert got[("click", "error")][1] < -0.9


def test_user_burstiness_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import user_burstiness

    rows, eid = [], 0
    # user 1 machine-like: constant 10s gaps; user 2 bursty
    for i in range(25):
        rows.append((eid, 1, "click", i * 10_000_000, 0.5)); eid += 1
    t = 0
    for i in range(25):
        t += (1_000_000 if i % 5 else 60_000_000)
        rows.append((eid, 2, "click", t, 0.5)); eid += 1
    con = duckdb.connect()
    _mk_events(con, rows)
    got = {r[0]: r[1:] for r in con.execute(user_burstiness("duck")).fetchall()}
    for uid in (1, 2):
        ts = sorted(ts for _, u, _, ts, _ in rows if u == uid)
        gaps = [(b - a) / 1e6 for a, b in zip(ts, ts[1:])]
        mu = sum(gaps) / len(gaps)
        sd = math.sqrt(max(sum(g * g for g in gaps) / len(gaps) - mu * mu, 0.0))
        r = got[uid]
        assert r[0] == len(gaps)
        assert abs(r[1] - mu) < 2e-5 and abs(r[3] - sd / mu) < 2e-5
        assert r[4] == ("machine-like" if sd / mu < 0.3 else "bursty")
    assert got[1][4] == "machine-like" and got[2][4] == "bursty"


def test_minhash_estimate_quality_matches_direct_python():
    """Full python replication of the minhash/banding/quartile pipeline:
    md5 shingle hashes, the 16 fixed permutations, 4-row band hashes, LSH
    candidate pairs, integer-millionth est/exact quantization, quartile
    rollup — byte-for-byte the algebra the SQL template encodes."""
    from oaim_sandbox_spark.functions.portable import _perm_constants
    from oaim_sandbox_spark.queries_dedup import BANDS, NGRAM, NUM_PERM
    from oaim_sandbox_spark.queries_dedup import minhash_estimate_quality

    base = [f"w{i}" for i in range(12)]
    docs = [
        (0, base),
        (0, base[:11] + ["zz"]),           # near-dup of doc 0
        (0, base[:8] + ["a", "b", "c", "d"]),
        (1, ["p", "q", "r", "s", "t", "u", "v", "w", "x", "y"]),
        (1, ["p", "q", "r", "s", "t", "u", "v", "w", "x", "yy"]),
        (1, [f"solo{i}" for i in range(10)]),
    ]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = {r[0]: r[1:] for r in
           con.execute(minhash_estimate_quality("duck")).fetchall()}

    perms = [_perm_constants(i) for i in range(NUM_PERM)]
    rows_per_band = NUM_PERM // BANDS
    sigs, shs = {}, {}
    for did, (_, words) in enumerate(docs):
        grams = ([" ".join(words[i:i + NGRAM]) for i in range(len(words) - NGRAM + 1)]
                 if len(words) >= NGRAM else [" ".join(words)])
        hs = [_h64(g) % MOD for g in grams]
        shs[did] = set(hs)
        sigs[did] = [min((a * h + b) % MOD for h in hs) for a, b in perms]
    pairs = set()
    for b in range(BANDS):
        buckets = {}
        for did, sig in sigs.items():
            key = (b, _h64(",".join(str(x) for x in
                                    sig[b * rows_per_band:(b + 1) * rows_per_band])))
            buckets.setdefault(key, []).append(did)
        for ds in buckets.values():
            for i, a in enumerate(ds):
                for c in ds[i + 1:]:
                    pairs.add((min(a, c), max(a, c)))
    rollup = {}
    for a, b in sorted(pairs):
        eq = sum(1 for i in range(NUM_PERM) if sigs[a][i] == sigs[b][i])
        est_q = round(eq / NUM_PERM * 1e6)
        inter = len(shs[a] & shs[b])
        exact_q = round(inter / (len(shs[a]) + len(shs[b]) - inter) * 1e6)
        quart = min(est_q // 250000, 3)
        rollup.setdefault(quart, []).append((est_q, exact_q))
    assert pairs, "fixture must produce LSH candidate pairs"
    assert set(got) == set(rollup)
    for quart, es in rollup.items():
        n = len(es)
        mean_est = round(sum(e for e, _ in es) / n / 1e6, 6)
        mean_exact = round(sum(x for _, x in es) / n / 1e6, 6)
        mae = round(sum(abs(e - x) for e, x in es) / n / 1e6, 6)
        r = got[quart]
        assert r[0] == n, (quart, r)
        assert abs(r[1] - mean_est) < 2e-6
        assert abs(r[2] - mean_exact) < 2e-6
        assert abs(r[3] - mae) < 2e-6


def test_zipf_degenerate_languages_yield_null():
    """r11 regression pin (the heaps-pin fragility class): with
    grid-rounded exact sums the moment determinant is no longer exactly
    zero on zero-variance columns, so the degenerate guards are the exact
    MIN=MAX tests — one distinct token => NULL alpha AND r2; all counts
    equal (y-variance zero, x fine) => alpha computed, r2 NULL."""
    from oaim_sandbox_spark.queries_extended import zipf_alpha_by_lang

    docs = [(0, ["only"] * 7), (1, ["a", "b", "c"])]
    langs = {0: "xx", 1: "yy"}
    con = duckdb.connect()
    _mk_docs(con, docs, langs)
    got = {r[0]: (r[1], r[2], r[3]) for r in
           con.execute(zipf_alpha_by_lang("duck")).fetchall()}
    assert got["xx"] == (1, None, None)          # single point: both NULL
    n, alpha, r2 = got["yy"]                     # equal counts: y constant
    assert n == 3 and alpha == 0.0 and r2 is None


def test_char_entropy_matches_direct_python():
    from oaim_sandbox_spark.queries_training import char_entropy_q

    # only doc_id % 20 == 0 is scored; include a skipped doc to pin that
    docs = [(0, ["aab", "cc"]), (1, ["zz"])]  # doc 0 scored, doc 1..19 not
    con = duckdb.connect()
    _mk_docs(con, docs)
    rows = con.execute(char_entropy_q("duck")).fetchall()
    assert [r[0] for r in rows] == [0]
    text = "aab cc"
    c = Counter(text)  # every char incl. the space
    n = len(text)
    ent = -sum((v / n) * math.log2(v / n) for v in c.values())
    assert rows[0][2] == len(c)
    assert abs(rows[0][1] - ent) < 2e-6


def test_unigram_logprob_matches_direct_python():
    from oaim_sandbox_spark.queries_training import unigram_logprob_quality

    # only doc_id % 4 == 0 scored; the corpus model is built from the
    # SCORED subset's tokens (the template's tok CTE filters first)
    docs = [(0, ["a", "a", "b"]), (0, ["x"]), (0, ["q"]), (0, ["w"]),
            (0, ["a", "b", "c"])]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = {r[0]: (r[1], r[2], r[3]) for r in
           con.execute(unigram_logprob_quality("duck")).fetchall()}
    scored = {i: ws for i, (_, ws) in enumerate(docs) if i % 4 == 0}
    freq = Counter(w for ws in scored.values() for w in ws)
    t = sum(freq.values())
    for did, ws in scored.items():
        lp = sum(math.log(freq[w] / t) for w in ws) / len(ws)
        g_lp, g_n, g_v = got[did]
        assert g_n == len(ws)
        assert abs(g_lp - lp) < 2e-6, (did, g_lp, lp)
        assert g_v == ("keep" if lp >= -7.5 else "filter")
    assert set(got) == set(scored)


def test_dsir_importance_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import dsir_importance_weights

    docs = [(0, ["cat", "dog", "cat"]), (1, ["dog", "fish"]),
            (0, ["bird", "cat"])]
    langs = {0: "en", 1: "de", 2: "de"}
    con = duckdb.connect()
    _mk_docs(con, docs, langs)
    got = {r[0]: (r[1], r[2], r[3]) for r in
           con.execute(dsir_importance_weights("duck")).fetchall()}
    toks = {i: ws for i, (_, ws) in enumerate(docs)}
    cs = Counter(w for ws in toks.values() for w in ws)
    ct = Counter(w for i, ws in toks.items() if langs[i] == "en" for w in ws)
    ns, nt, vsz = sum(cs.values()), sum(ct.values()), len(cs)
    for did, ws in toks.items():
        lr = sum(math.log(((ct[w] + 1) / (nt + vsz)) / ((cs[w] + 1) / (ns + vsz)))
                 for w in ws)
        g_n, g_avg, g_v = got[did]
        assert g_n == len(ws)
        assert abs(g_avg - lr / len(ws)) < 2e-6, (did, g_avg, lr / len(ws))
        assert g_v == ("target-like" if lr > 0 else "generic")


def _shingle_hashes_py(words, ngram):
    grams = ([" ".join(words[i:i + ngram]) for i in range(len(words) - ngram + 1)]
             if len(words) >= ngram else [" ".join(words)])
    return [_h64(g) % MOD for g in grams]


def test_winnowing_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import (
        WINNOW_NGRAM,
        WINNOW_W,
        winnowing_fingerprints,
    )

    base = [f"w{i}" for i in range(9)]
    docs = [(0, base), (0, base[2:] + ["zz", "qq"]), (1, ["a", "b", "c", "d"])]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = {r[0]: r[1:] for r in
           con.execute(winnowing_fingerprints("duck")).fetchall()}
    fps = {}
    for did, (_, ws) in enumerate(docs):
        hs = _shingle_hashes_py(ws, WINNOW_NGRAM)
        n_win = max(1, len(hs) - (WINNOW_W - 1))
        sel = [min(hs[i:i + WINNOW_W]) for i in range(n_win)]
        # list_distinct preserves first-seen order; set suffices for counts
        fps[did] = (len(hs), list(dict.fromkeys(sel)))
    all_fp = Counter(f for _, (_, fp) in fps.items() for f in set(fp))
    for did, (n_grams, fp) in fps.items():
        shared = sum(1 for f in fp if all_fp[f] > 1)
        r = got[did]
        assert (r[0], r[1]) == (n_grams, len(fp)), (did, r)
        assert abs(r[2] - len(fp) / n_grams) < 2e-6
        assert r[3] == shared, (did, r[3], shared)


def test_shingle_containment_matches_direct_python():
    from oaim_sandbox_spark.queries_training import (
        CONTAINMENT_MIN,
        DECONTAM_NGRAM,
        shingle_containment_decontam,
    )

    leak = [f"t{i}" for i in range(8)]
    docs = {
        3: leak,                     # test doc (doc_id % 10 == 3)
        0: leak[:6] + ["x", "y"],    # train, shares a prefix run
        1: [f"u{i}" for i in range(8)],  # train, disjoint
        13: [f"v{i}" for i in range(7)],  # second test doc, disjoint
    }
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, 'src0', '{' '.join(ws)}', 'en', {len(' '.join(ws))})"
        for i, ws in sorted(docs.items())
    )
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES " + vals +
                ") AS v(doc_id, source, text, lang, n_chars)")
    got = {(r[0], r[1]): r[2] for r in
           con.execute(shingle_containment_decontam("duck")).fetchall()}
    sh = {i: set(_shingle_hashes_py(ws, DECONTAM_NGRAM)) for i, ws in docs.items()}
    expect = {}
    for t in (3, 13):
        for tr in (0, 1):
            cont = len(sh[t] & sh[tr]) / len(sh[t])
            if cont >= CONTAINMENT_MIN:
                expect[(t, tr)] = cont
    assert set(got) == set(expect), (got, expect)
    for k, v in expect.items():
        assert abs(got[k] - v) < 2e-6
    # the planted prefix leak must actually fire
    assert (3, 0) in got
