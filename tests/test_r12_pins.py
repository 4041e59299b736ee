"""Independent naive-Python/numpy pins for the 10 NEW round-12 entries —
every new oracle entry ships with a direct recomputation on hand-built
data (the r9-r11 discipline: the shared-SQL oracle cannot catch a wrong
query both engines run identically; the pin can). Boundary cases are
planted deliberately (DECIMAL cent boundary, debounce == 5 s, rare-count
== 2, top-N vocabulary tie, Benford round-to-one-digit carry)."""

import hashlib
import math
from collections import Counter, defaultdict
from decimal import Decimal

import duckdb
import numpy as np

MOD = 1_000_000_007


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _r6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _toks(text: str) -> list[str]:
    return [t for t in text.split(" ") if t]


def _word_ngrams(text: str, n: int) -> list[str]:
    t = _toks(text)
    if len(t) >= n:
        return [" ".join(t[j:j + n]) for j in range(len(t) - n + 1)]
    return [" ".join(t)]


def _mock_embed(text: str, dim: int = 64) -> np.ndarray:
    return np.array([(_h64(f"{text}:{i}") % 2000001) / 1e6 - 1.0
                     for i in range(dim)])


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


def test_order_total_reconciliation_matches_decimal_python():
    from oaim_sandbox_spark.queries_extended import order_total_reconciliation

    con = duckdb.connect()
    # (orderkey, totalprice) + lineitems (okey, ext, disc, tax)
    lines = [
        (1, "100.00", "0.00", "0.00"),   # order 1 recomputed = 100.00
        (2, "100.00", "0.10", "0.10"),   # order 2 recomputed = 99.00
        (2, "50.00", "0.00", "0.00"),    # order 2 total recomputed 149.00
        (3, "200.00", "0.05", "0.00"),   # order 3 recomputed = 190.00
        (4, "10.00", "0.00", "0.00"),    # order 4 recomputed = 10.00
    ]
    orders = [
        (1, "100.00"),   # exact
        (2, "149.01"),   # within_cent (diff 0.01 — the boundary, inclusive)
        (3, "191.50"),   # minor (rel ~0.0078 <= 0.01)
        (4, "14.00"),    # major (rel 0.2857...)
    ]
    con.execute("CREATE TABLE orders AS SELECT * FROM (VALUES "
                + ", ".join(f"({k}, {t})" for k, t in orders)
                + ") AS v(o_orderkey, o_totalprice)")
    con.execute("CREATE TABLE lineitem AS SELECT * FROM (VALUES "
                + ", ".join(f"({k}, {e}, {d}, {t})" for k, e, d, t in lines)
                + ") AS v(l_orderkey, l_extendedprice, l_discount, l_tax)")
    got = con.execute(order_total_reconciliation("duck")).fetchall()

    recomputed = defaultdict(Decimal)
    for k, e, dsc, tx in lines:
        recomputed[k] += Decimal(e) * (1 - Decimal(dsc)) * (1 + Decimal(tx))
    buckets = defaultdict(list)
    for k, t in orders:
        diff = Decimal(t) - recomputed[k]
        rel = float(diff) / float(Decimal(t))
        if diff == 0:
            b = "exact"
        elif abs(diff) <= Decimal("0.01"):
            b = "within_cent"
        elif abs(rel) <= 0.01:
            b = "minor"
        else:
            b = "major"
        buckets[b].append(rel)
    exp = [(b, len(rels), sum(rels) / len(rels), min(rels), max(rels))
           for b, rels in sorted(buckets.items())]
    assert [(r[0], r[1]) for r in got] == [(b, n) for b, n, _, _, _ in exp]
    for r, (_, _, mean, lo, hi) in zip(got, exp):
        assert abs(r[2] - mean) < 2e-6 and abs(r[3] - lo) < 2e-6 \
            and abs(r[4] - hi) < 2e-6
    assert {r[0] for r in got} == {"exact", "within_cent", "minor", "major"}


def test_filter_venn_attribution_matches_direct_python():
    from oaim_sandbox_spark.operators.text_analysis import STOPWORDS
    from oaim_sandbox_spark.queries_extended import filter_venn_attribution

    all_stop = {w for ws in STOPWORDS.values() for w in ws}
    long_doc = ["the", "quick", "brown", "fox", "jumps", "over", "a",
                "lazy", "dog", "with", "plenty", "of", "meaningful",
                "content", "to", "read"] * 2
    docs = [
        (0, ["tiny"]),                     # short + few_tokens + low_score
        (1, ["n12345678"] * 13),           # digit + repetitive (+ low_score)
        (2, [f"qz{c}x" for c in "abcdefghijklmnopqrst"]),  # low_score only
        (2, long_doc),                     # keep (bitmask 0)
        (0, ["repeat"] * 16),              # repetitive (+ low_score)
    ]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(filter_venn_attribution("duck")).fetchall()

    agg = Counter()
    labels = {}
    for _, (_, w) in enumerate(docs):
        text = " ".join(w)
        toks = _toks(text)
        n_chars, n_tok = len(text), len(toks)
        digit = _r6(sum(c.isdigit() for c in text) / n_chars)
        stop = _r6(sum(t in all_stop for t in _toks(text.lower())) / n_tok)
        score = _r6(0.4 * min(n_chars / 1000.0, 1.0)
                    + 0.4 * min(stop * 5.0, 1.0)
                    + 0.2 * (1.0 - min(digit * 10.0, 1.0)))
        f = (int(n_chars < 80), int(n_tok < 12), int(digit > 0.2),
             int(len(set(toks)) / n_tok < 0.3), int(score < 0.35))
        bm = 16 * f[0] + 8 * f[1] + 4 * f[2] + 2 * f[3] + f[4]
        agg[bm] += 1
        names = ["short", "few_tokens", "digit_heavy", "repetitive", "low_score"]
        labels[bm] = "keep" if bm == 0 else "+".join(
            n for n, fi in zip(names, f) if fi)
    exp = sorted((bm, labels[bm], n) for bm, n in agg.items())
    assert got == exp
    assert any(r[0] == 0 for r in got)  # keep bucket exercised
    assert any(bin(r[0]).count("1") >= 2 for r in got)  # co-firing bucket


def test_adjacent_dup_streaks_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import adjacent_dup_streaks

    tmpl = ["the", "same", "template", "page", "again", "and", "again"]
    rows = []
    # src0 ids 0,2,4: a 3-long template streak (docs 2,4 similar to their
    # predecessors), then two unrelated docs
    rows.append((0, 0, tmpl + ["v0"]))
    rows.append((2, 0, tmpl + ["v1"]))
    rows.append((4, 0, tmpl + ["v2"]))
    rows.append((6, 0, ["totally", "different", "content", "now", "here"]))
    rows.append((8, 0, ["another", "unrelated", "document", "entirely", "yes"]))
    # src1: two dissimilar docs -> one low-jaccard pair, no streak
    rows.append((1, 1, ["alpha", "beta", "gamma", "delta", "epsilon"]))
    rows.append((3, 1, ["zeta", "eta", "theta", "iota", "kappa"]))
    con = duckdb.connect()
    _mk_docs_ids(con, rows)
    got = con.execute(adjacent_dup_streaks("duck")).fetchall()

    by_src = defaultdict(list)
    for i, s, w in rows:
        by_src[f"src{s}"].append((i, set(
            _h64(g) % MOD for g in _word_ngrams(" ".join(w), 3))))
    exp = []
    for src in sorted(by_src):
        docs = sorted(by_src[src])
        js = []
        for (_, prev), (_, cur) in zip(docs, docs[1:]):
            inter = len(cur & prev)
            js.append(inter / (len(cur) + len(prev) - inter))
        his = [j >= 0.2 for j in js]
        streak = best = 0
        for h in his:
            streak = streak + 1 if h else 0
            best = max(best, streak)
        exp.append((src, len(js), sum(js) / len(js), sum(his), best))
    assert [(r[0], r[1], r[3], r[4]) for r in got] == \
           [(s, n, nh, mx) for s, n, _, nh, mx in exp]
    for r, (_, _, mean, _, _) in zip(got, exp):
        assert abs(r[2] - mean) < 2e-6
    assert got[0][4] == 2  # the planted streak: pairs (0,2) and (2,4)


def test_oov_rate_by_source_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import (
        VOCAB_TOP_N, oov_rate_by_source)

    # 130 distinct tokens: t000..t129 with count (130 - j) each, so the
    # top-100 cut falls at count 30 with NO tie straddle; plus a planted
    # tie AT the boundary: u1/u2 both count 30 (tok ASC breaks it)
    docs, src = [], 0
    bag = []
    for j in range(130):
        bag += [f"t{j:03d}"] * (130 - j)
    bag += ["u1"] * 30 + ["u2"] * 30
    rng = np.random.default_rng(2)
    rng.shuffle(bag)
    chunk = 40
    for k in range(0, len(bag), chunk):
        docs.append((src % 3, bag[k:k + chunk]))
        src += 1
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(oov_rate_by_source("duck")).fetchall()

    counts = Counter(t for _, w in docs for t in w)
    vocab = set(t for t, _ in sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_TOP_N])
    exp = []
    per_src = defaultdict(list)
    for i, (s, w) in enumerate(docs):
        per_src[f"src{s}"] += w
    for s in sorted(per_src):
        toks = per_src[s]
        oov = [t for t in toks if t not in vocab]
        exp.append((s, len(toks), len(oov), len(set(oov)),
                    len(oov) / len(toks)))
    assert [(r[0], r[1], r[2], r[3]) for r in got] == \
           [(s, n, no, nt) for s, n, no, nt, _ in exp]
    for r, (_, _, _, _, rate) in zip(got, exp):
        assert abs(r[4] - rate) < 2e-6
    assert any(r[2] > 0 for r in got)  # OOV mass actually exists


def test_benford_first_digit_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import benford_first_digit

    vals = {
        "click": [1.0, 12.5, 190.0, 0.01, 0.9999995,  # last rounds to 1e6 -> digit 1
                  33.3, 3.14, 250.0, 2.0, 88.8],
        "view": [5.5, 55.0, 0.05, 505.0],
    }
    rows, eid = [], 0
    for et, vs in vals.items():
        for v in vs:
            rows.append((eid, eid % 3, et, 1_000_000 * eid, v))
            eid += 1
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(benford_first_digit("duck")).fetchall()

    benford = {d: math.log10(1 + 1 / d) for d in range(1, 10)}
    exp = []
    for et in sorted(vals):
        digs = [int(str(int(math.floor(v * 1e6 + 0.5)))[0]) for v in vals[et]
                if v > 0]
        n = len(digs)
        obs = Counter(digs)
        chi2 = sum((obs.get(d, 0) - n * benford[d]) ** 2 / (n * benford[d])
                   for d in range(1, 10))
        for d in range(1, 10):
            e = n * benford[d]
            exp.append((et, d, obs.get(d, 0), e,
                        (obs.get(d, 0) - e) ** 2 / e, chi2))
    assert [(r[0], r[1], r[2]) for r in got] == \
           [(et, d, o) for et, d, o, _, _, _ in exp]
    for r, (_, _, _, e, term, chi2) in zip(got, exp):
        assert abs(r[3] - e) < 2e-6
        assert abs(r[4] - term) < 2e-6
        assert abs(r[5] - chi2) < 2e-6
    # digit-1 clicks: 1.0, 12.5, 190.0, 0.01 (n6=10000), and the carry
    # case 0.9999995 (*1e6 + 0.5 floors to 1_000_000 -> digit 1)
    assert next(r[2] for r in got if r[0] == "click" and r[1] == 1) == 5


def test_simpson_sign_flip_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import simpson_sign_flip

    # classic construction: within each type value FALLS with hour
    # (negative group corr), but the high-hour type has much larger
    # values, so pooled correlation is POSITIVE -> sign_flip = 1
    rows, eid = [], 0
    hour_us = 3_600_000_000
    for h, v in [(1, 10.0), (2, 9.0), (3, 8.0), (4, 7.0)]:
        rows.append((eid, 1, "low", h * hour_us + eid, v)); eid += 1
    for h, v in [(18, 100.0), (19, 99.0), (20, 98.0), (21, 97.0)]:
        rows.append((eid, 2, "high", h * hour_us + eid, v)); eid += 1
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(simpson_sign_flip("duck")).fetchall()

    def corr(pts):
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        if x.min() == x.max() or y.min() == y.max():
            return None
        return float(np.corrcoef(x, y)[0, 1])

    pools = defaultdict(list)
    for eid, _, et, ts, v in rows:
        pools[et].append(((ts % 86_400_000_000) // hour_us, v))
    allpts = [p for pts in pools.values() for p in pts]
    pooled = corr(allpts)
    assert pooled > 0
    assert [r[0] for r in got] == sorted(pools)
    for r in got:
        g = corr(pools[r[0]])
        assert abs(r[2] - g) < 2e-6 and abs(r[3] - pooled) < 2e-6
        assert r[4] == int(g * pooled < 0)
    assert all(r[4] == 1 for r in got)  # both groups flip vs pooled


def test_interarrival_exp_fit_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import interarrival_exp_fit

    rows, eid = [], 0
    gaps = {"click": [1.0, 2.0, 4.0, 8.0, 0.5, 0.25],
            "view": [10.0, 10.0, 10.0]}  # all-equal dt -> gaps NULL? no: dlo=dhi -> NULL
    for et, gs in gaps.items():
        t = 0.0
        rows.append((eid, 1, et, int(t * 1e6), 1.0)); eid += 1
        for g in gs:
            t += g
            rows.append((eid, 1, et, int(t * 1e6), 1.0)); eid += 1
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(interarrival_exp_fit("duck")).fetchall()

    assert [r[0] for r in got] == sorted(gaps)
    for r in got:
        dts = np.array(gaps[r[0]], dtype=float)
        mean = dts.mean()
        p50, p90 = np.percentile(dts, [50, 90], method="linear")
        assert r[1] == len(dts)
        assert abs(r[2] - mean) < 2e-3  # exact_avg quantizes at 1e-3
        assert abs(r[3] - p50) < 2e-6 and abs(r[4] - p90) < 2e-6
        if r[0] == "view":
            assert r[5] is None and r[6] is None  # MIN=MAX degenerate guard
        else:
            m50, m90 = mean * math.log(2), mean * math.log(10)
            assert abs(r[5] - (p50 - m50) / m50) < 5e-3
            assert abs(r[6] - (p90 - m90) / m90) < 5e-3


def test_event_debounce_rate_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import event_debounce_rate

    rows = [
        # user 1 clicks: gaps 3s (debounced), 5s EXACTLY (debounced —
        # boundary is inclusive), 7s (not)
        (0, 1, "click", 0, 1.0),
        (1, 1, "click", 3_000_000, 1.0),
        (2, 1, "click", 8_000_000, 1.0),
        (3, 1, "click", 15_000_000, 1.0),
        # user 2 clicks: one pair, 2s (debounced)
        (4, 2, "click", 0, 1.0),
        (5, 2, "click", 2_000_000, 1.0),
        # views: single event, no pair
        (6, 1, "view", 0, 1.0),
    ]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(event_debounce_rate("duck")).fetchall()
    assert got == [
        ("click", 6, 4, 3, 0.75),
        ("view", 1, 0, 0, None),
    ]


def test_ndcg_graded_retrieval_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import (
        NDCG_QUERY_STRIDE, ndcg_graded_retrieval)

    # doc 0 is the only query (ids kept below one stride); mixed
    # sources/langs give gains {2, 1, 0}
    langs = {0: "en", 1: "en", 2: "de", 3: "en", 4: "de", 5: "en",
             6: "de", 7: "en"}
    docs = [
        (0, ["query", "document", "about", "spark"]),
        (0, ["same", "source", "neighbor", "one"]),      # gain 2
        (0, ["same", "source", "neighbor", "two"]),      # gain 2
        (1, ["other", "source", "same", "lang"]),        # gain 1
        (1, ["different", "lang", "and", "source"]),     # gain 0 (de)
        (2, ["more", "english", "text", "here"]),        # gain 1
        (2, ["noch", "ein", "deutsches", "dokument"]),   # gain 0
        (1, ["final", "english", "filler", "doc"]),      # gain 1
    ]
    assert len(docs) <= NDCG_QUERY_STRIDE  # only doc 0 queries
    con = duckdb.connect()
    _mk_docs(con, docs, langs=langs)
    got = con.execute(ndcg_graded_retrieval("duck")).fetchall()
    assert len(got) == 1 and got[0][0] == 0

    qv = _mock_embed(" ".join(docs[0][1]))
    scored = []
    for i, (s, w) in enumerate(docs):
        if i == 0:
            continue
        v = _mock_embed(" ".join(w))
        dist = _r6(1.0 - float(qv @ v) /
                   float(np.linalg.norm(qv) * np.linalg.norm(v)))
        gain = 2 if s == docs[0][0] else (1 if langs[i] == langs[0] else 0)
        scored.append((dist, i, gain))
    scored.sort()
    l2 = [1.0, math.log2(3), 2.0, math.log2(5), math.log2(6)]
    dcg = sum(g / l2[p] for p, (_, _, g) in enumerate(scored[:5]))
    n2 = sum(1 for _, _, g in scored if g == 2)
    n1 = sum(1 for _, _, g in scored if g == 1)
    ideal = [2] * n2 + [1] * n1 + [0] * 5
    idcg = sum(ideal[p] / l2[p] for p in range(5))
    r = got[0]
    assert (r[1], r[2]) == (n2, n1)
    assert abs(r[3] - dcg) < 2e-6
    assert abs(r[4] - idcg) < 2e-6
    assert abs(r[5] - dcg / idcg) < 2e-6


def test_rare_token_share_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import rare_token_share

    docs = [
        (0, ["common"] * 5 + ["edge2", "edge2"]),        # edge2 count==2: rare
        (0, ["common", "common", "edge3", "edge3", "edge3"]),  # edge3==3: not
        (1, ["zxqj1", "wvkm2", "yhfp3", "common"]),      # 3/4 rare -> flag
        (1, ["common"] * 4),
    ]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(rare_token_share("duck")).fetchall()

    freq = Counter(t for _, w in docs for t in w)
    exp = []
    for i, (_, w) in enumerate(docs):
        rare = sum(1 for t in w if freq[t] <= 2)
        share = rare / len(w)
        exp.append((i, len(w), rare, share, int(share > 0.3)))
    assert [(r[0], r[1], r[2], r[4]) for r in got] == \
           [(i, n, rr, f) for i, n, rr, _, f in exp]
    for r, (_, _, _, share, _) in zip(got, exp):
        assert abs(r[3] - share) < 2e-6
    assert got[2][4] == 1 and got[3][4] == 0  # flag fires and abstains


# --- wave 2 pins ---------------------------------------------------------


def test_l_diversity_audit_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import l_diversity_audit

    day_us = 86400 * 1_000_000
    rows, eid = [], 0
    # user 1, day 0 (dow 0): clicks only -> its (bucket 1, dow 0) class l=1
    for _ in range(4):
        rows.append((eid, 1, "click", 0 * day_us + eid, 1.0)); eid += 1
    # users 2 & 52 share bucket 2 (52 % 50 == 2), day 1: click+view -> l=2
    for uid in (2, 52):
        rows.append((eid, uid, "click", 1 * day_us + eid, 1.0)); eid += 1
        rows.append((eid, uid, "view", 1 * day_us + eid, 1.0)); eid += 1
    # user 3, day 2: three types -> l=3
    for et in ("click", "view", "error"):
        rows.append((eid, 3, et, 2 * day_us + eid, 1.0)); eid += 1
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(l_diversity_audit("duck")).fetchall()

    groups = defaultdict(set)
    counts = Counter()
    for _, uid, et, ts, _ in rows:
        k = (uid % 50, (ts // day_us) % 7)
        groups[k].add(et)
        counts[k] += 1
    hist = defaultdict(lambda: [0, 0])
    for k, ets in groups.items():
        hist[len(ets)][0] += 1
        hist[len(ets)][1] += counts[k]
    tot = sum(counts.values())
    exp = [(l, g, n, n / tot, int(l < 2)) for l, (g, n) in sorted(hist.items())]
    assert [(r[0], r[1], r[2], r[4]) for r in got] == \
           [(l, g, n, f) for l, g, n, _, f in exp]
    for r, (_, _, _, share, _) in zip(got, exp):
        assert abs(r[3] - share) < 2e-6
    assert got[0][0] == 1 and got[0][4] == 1  # the leaky class surfaced


def test_conversion_survival_curve_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import (
        SURVIVAL_HORIZONS, conversion_survival_curve)

    day_us = 86400 * 1_000_000
    rows, eid = [], 0
    # corpus spans day 0 .. day 20 (user 9's last event pins tmax)
    # user 1: first event day 0, purchase day 2 -> converted at h>=3
    rows.append((eid, 1, "signup", 0, 1.0)); eid += 1
    rows.append((eid, 1, "purchase", 2 * day_us, 1.0)); eid += 1
    # user 2: first event day 0, never converts, fully observed
    rows.append((eid, 2, "click", 0, 1.0)); eid += 1
    # user 3: first event day 19 (window 1 day), purchase 12h later ->
    # at-risk ONLY for h=1 (censored beyond), converted within 1
    rows.append((eid, 3, "signup", 19 * day_us, 1.0)); eid += 1
    rows.append((eid, 3, "purchase", 19 * day_us + day_us // 2, 1.0)); eid += 1
    # user 9: the observation-end anchor
    rows.append((eid, 9, "view", 20 * day_us, 1.0)); eid += 1
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(conversion_survival_curve("duck")).fetchall()

    users = defaultdict(lambda: [None, None])  # uid -> [t0, tp]
    tmax = max(ts for _, _, _, ts, _ in rows)
    for _, uid, et, ts, _ in rows:
        u = users[uid]
        u[0] = ts if u[0] is None else min(u[0], ts)
        if et == "purchase":
            u[1] = ts if u[1] is None else min(u[1], ts)
    exp = []
    for h in SURVIVAL_HORIZONS:
        at_risk = [u for u in users.values() if tmax - u[0] >= h * day_us]
        conv = [u for u in at_risk
                if u[1] is not None and u[1] - u[0] <= h * day_us]
        exp.append((h, len(at_risk), len(conv),
                    None if not at_risk else len(conv) / len(at_risk)))
    assert [(r[0], r[1], r[2]) for r in got] == \
           [(h, ar, c) for h, ar, c, _ in exp]
    for r, (_, _, _, rate) in zip(got, exp):
        assert (r[3] is None) == (rate is None)
        if rate is not None:
            assert abs(r[3] - rate) < 2e-6
    # censoring pinned: user 3 counts at h=1 (converted) but leaves the
    # at-risk set for h>=3; user 9 (window 0) is never at risk
    assert got[0][1] == 3 and got[1][1] == 2


def test_daily_volume_anomalies_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import daily_volume_anomalies

    day_us = 86400 * 1_000_000
    # dow 0 across 4 weeks: 10, 10, 10, 40 (the last is the anomaly);
    # dow 1 across 2 weeks: 5, 5 (identical -> MIN=MAX guard, z NULL)
    plan = {0: 10, 7: 10, 14: 10, 21: 40, 1: 5, 8: 5}
    rows, eid = [], 0
    for day, n in plan.items():
        for _ in range(n):
            rows.append((eid, 1, "click", day * day_us + eid, 1.0)); eid += 1
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(daily_volume_anomalies("duck")).fetchall()

    by_dow = defaultdict(list)
    for day, n in plan.items():
        by_dow[day % 7].append(n)
    exp = []
    for day in sorted(plan):
        ns = by_dow[day % 7]
        mu = sum(ns) / len(ns)
        var = sum(x * x for x in ns) / len(ns) - mu * mu
        if min(ns) == max(ns):
            z, flag = None, 0
        else:
            z = (plan[day] - mu) / math.sqrt(var)
            flag = int(abs(z) > 3.0)
        exp.append((day, day % 7, plan[day], z, flag))
    assert [(r[0], r[1], r[2], r[4]) for r in got] == \
           [(d, dw, n, f) for d, dw, n, _, f in exp]
    for r, (_, _, _, z, _) in zip(got, exp):
        assert (r[3] is None) == (z is None)
        if z is not None:
            assert abs(r[3] - z) < 2e-6
    assert [r[3] for r in got if r[1] == 1] == [None, None]  # guard fires


def test_dedup_weighted_mass_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import dedup_weighted_mass

    docs = [
        (0, ["mirror", "copy", "of", "page"]),      # cluster of 3 (2 in src0)
        (0, ["mirror", "copy", "of", "page"]),
        (1, ["mirror", "copy", "of", "page"]),
        (0, ["unique", "content", "one"]),
        (1, ["unique", "content", "two", "words"]),
    ]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = con.execute(dedup_weighted_mass("duck")).fetchall()

    def norm(text):
        return " ".join(text.lower().split())

    csize = Counter(norm(" ".join(w)) for _, w in docs)
    per_src = defaultdict(lambda: [0, 0, 0.0])
    for s, w in docs:
        key = f"src{s}"
        t = len(w)
        per_src[key][0] += 1
        per_src[key][1] += t
        per_src[key][2] += t / csize[norm(" ".join(w))]
    exp = [(k, n, raw, wt, wt / raw) for k, (n, raw, wt) in sorted(per_src.items())]
    assert [(r[0], r[1], r[2]) for r in got] == [(k, n, raw) for k, n, raw, _, _ in exp]
    for r, (_, _, _, wt, ratio) in zip(got, exp):
        assert abs(r[3] - wt) < 1e-3  # exact_sum quantizes at 1e-4
        assert abs(r[4] - ratio) < 1e-3
    # the mirror cluster actually discounts: src0 ratio strictly below 1
    assert got[0][4] < 1.0


def test_type_mix_drift_daily_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import type_mix_drift_daily

    day_us = 86400 * 1_000_000
    rows, eid = [], 0
    # days 0/1: 5 click + 5 view; day 2: 6/4 (mild); day 3: 3 errors only —
    # small enough not to drag the GLOBAL mixture past the 0.2 threshold
    # for the normal days, extreme enough to flag itself
    for day, mix in ((0, {"click": 5, "view": 5}), (1, {"click": 5, "view": 5}),
                     (2, {"click": 6, "view": 4}), (3, {"error": 3})):
        for et, n in mix.items():
            for _ in range(n):
                rows.append((eid, 1, et, day * day_us + eid, 1.0)); eid += 1
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(type_mix_drift_daily("duck")).fetchall()

    daily = defaultdict(Counter)
    for _, _, et, ts, _ in rows:
        daily[ts // day_us][et] += 1
    glob = Counter()
    for c in daily.values():
        glob.update(c)
    tot = sum(glob.values())
    exp = []
    for day in sorted(daily):
        n_day = sum(daily[day].values())
        tv = 0.5 * sum(abs(daily[day].get(et, 0) / n_day - g / tot)
                       for et, g in glob.items())
        exp.append((day, n_day, tv, int(tv > 0.2)))
    assert [(r[0], r[1], r[3]) for r in got] == \
           [(d, n, f) for d, n, _, f in exp]
    for r, (_, _, tv, _) in zip(got, exp):
        assert abs(r[2] - tv) < 2e-6
    assert [r[3] for r in got] == [0, 0, 0, 1]  # only the all-error day fires
