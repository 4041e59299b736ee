"""Independent naive-Python pins BACK-FILLED for certified entries, round 13
(VERDICT r12 task #3 continuation): the DuckDB oracle certifies
Spark-vs-DuckDB agreement on the SAME SQL, so a wrong shared query
certifies green — only a direct recomputation catches it. These cover the
math-heavy graph / LM / retrieval-eval / ANOVA / calibration entries the
r12 verdict named plus the remaining unpinned moment-sum entries."""

import hashlib
import math
from collections import Counter, defaultdict
from itertools import combinations

import duckdb
import numpy as np

MOD = 1_000_000_007


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _r6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _seqdot(a, b):
    """Left-to-right fold — the exact float semantics of P.dot."""
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def _cos_dist(a, b):
    na = math.sqrt(_seqdot(a, a))
    nb = math.sqrt(_seqdot(b, b))
    d = na * nb
    return 1.0 - (_seqdot(a, b) / d if d != 0 else 0.0)


def _mk_docs_src(con, rows, langs=None):
    """rows: (doc_id, source_name, text)."""
    vals = ", ".join(
        f"({i}, '{s}', '{t}', '{(langs or {}).get(i, 'en')}', {len(t)})"
        for i, s, t in rows
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
    """vecs: (vec_id, label, list[float]) — stored FLOAT[] like the parquet."""
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({vid}, [{', '.join(repr(x) for x in v)}]::FLOAT[], {lbl})"
            for vid, lbl, v in vecs)
        + ") AS v(vec_id, embedding, label)"
    )


def _hash_graph(n):
    """The deterministic link graph pagerank_3iter/triangle_count build:
    each doc links to hash64(id#k) % n for k in 1..3 (self-loops and
    duplicate edges kept, exactly as the SQL keeps them)."""
    return [(v, _h64(f"{v}#{k}") % n) for v in range(n) for k in (1, 2, 3)]


def test_pagerank_3iter_matches_direct_python():
    from oaim_sandbox_spark.queries_textstats import pagerank_3iter

    n = 10
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i})" for i in range(n))
                + ") AS v(doc_id)")
    got = con.execute(pagerank_3iter("duck")).fetchall()

    edges = _hash_graph(n)
    deg = Counter(src for src, _ in edges)  # always 3 (self-loops included)
    r = {v: 1.0 / n for v in range(n)}
    for _ in range(3):
        acc = defaultdict(float)
        for src, dst in edges:
            acc[dst] += r[src] / deg[src]
        r = {v: 0.15 / n + 0.85 * acc.get(v, 0.0) for v in range(n)}
    exp = sorted(((v, r[v]) for v in r), key=lambda t: (-round(t[1], 9), t[0]))[:20]
    assert [g[0] for g in got] == [v for v, _ in exp]
    for g, (_, rank) in zip(got, exp):
        assert abs(g[1] - rank) < 1e-9
    assert abs(sum(r.values()) - 1.0) < 1e-9  # rank mass conserved


def test_triangle_count_matches_direct_python():
    from oaim_sandbox_spark.queries_textstats import triangle_count

    n = 10  # the hash graph at n=10 closes 14 triangles (probed)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i})" for i in range(n))
                + ") AS v(doc_id)")
    got = con.execute(triangle_count("duck")).fetchall()

    und = {(min(a, b), max(a, b)) for a, b in _hash_graph(n) if a != b}
    tris = [(a, b, c) for (a, b) in und for c in range(n)
            if b < c and (b, c) in und and (a, c) in und]
    member = Counter(v for t in tris for v in t)
    exp = sorted(((v, k, len(tris)) for v, k in member.items()),
                 key=lambda t: (-t[1], t[0]))[:10]
    assert [tuple(r) for r in got] == exp
    assert len(tris) > 0  # the fixture actually exercises closure


def test_source_vocab_overlap_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import source_vocab_overlap

    rows = [
        (0, "srcA", "alpha beta gamma"),
        (1, "srcA", "beta delta"),
        (2, "srcB", "beta gamma zeta"),
        (3, "srcC", "omega"),  # disjoint from A/B -> pair rows absent
    ]
    con = duckdb.connect()
    _mk_docs_src(con, rows)
    got = con.execute(source_vocab_overlap("duck")).fetchall()

    vocab = defaultdict(set)
    for _, s, t in rows:
        vocab[s] |= set(t.split())
    exp = []
    for a, b in combinations(sorted(vocab), 2):
        ni = len(vocab[a] & vocab[b])
        if ni:  # the inner join drops zero-overlap pairs
            exp.append((a, b, ni, _r6(ni / len(vocab[a] | vocab[b]))))
    assert [tuple(r) for r in got] == exp
    assert ("srcA", "srcB", 2, _r6(2 / 5)) in exp
    assert all(r[0] != "srcC" and r[1] != "srcC" for r in got)


def test_ngram_jaccard_pairs_matches_direct_python():
    from oaim_sandbox_spark.queries_dedup import NGRAM, ngram_jaccard_pairs_q

    assert NGRAM == 3
    base = "one two three four five six seven eight"
    rows = [
        (0, "srcA", base),                      # 6 trigrams
        (1, "srcA", base + " nine"),            # shares all 6 of doc 0's
        (2, "srcA", "x y z w v u"),             # disjoint -> no pair row
        (3, "srcB", base),                      # other source: blocked out
        (4, "srcA", "one two three q r s t u"), # 1 shared trigram -> j=1/11 > 0.03
    ]
    con = duckdb.connect()
    _mk_docs_src(con, rows)
    got = con.execute(ngram_jaccard_pairs_q("duck")).fetchall()

    def tri(t):
        w = t.split()
        return {" ".join(w[j:j + 3]) for j in range(len(w) - 2)}

    exp = []
    by_src = defaultdict(list)
    for i, s, t in rows:
        by_src[s].append((i, tri(t)))
    for s, ds in by_src.items():
        for (ia, sa), (ib, sb) in combinations(ds, 2):
            inter = len(sa & sb)
            if inter and inter / len(sa | sb) >= 0.03:
                exp.append((ia, ib, _r6(inter / len(sa | sb))))
    exp.sort()
    assert [tuple(r) for r in got] == exp
    assert (0, 1, _r6(6 / 7)) in exp and (0, 4, _r6(1 / 11)) in exp
    assert not any(3 in (a, b) for a, b, _ in exp)  # source blocking held


def test_bigram_logprob_quality_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import (
        BIGRAM_LAMBDA,
        bigram_logprob_quality,
    )

    rows = [  # only doc_id % 4 == 0 participates
        (0, "srcA", ("a b " * 150).strip()),  # makes 'a' frequent
        (4, "srcA", "the cat ran"),
        # 'a zz' occurs once while c(a)=301 -> ln(.7/301 + .3/N) < -5 -> filter
        (8, "srcA", "a zz"),
        (3, "srcA", "the cat sat"),     # id % 4 != 0: EXCLUDED from counts
    ]
    con = duckdb.connect()
    _mk_docs_src(con, rows)
    got = con.execute(bigram_logprob_quality("duck")).fetchall()

    inc = [(i, t) for i, _, t in rows if i % 4 == 0]
    uc = Counter(w for _, t in inc for w in t.split())
    bc = Counter(f"{a} {b}" for _, t in inc
                 for a, b in zip(t.split(), t.split()[1:]))
    n_total = sum(uc.values())
    lam = BIGRAM_LAMBDA
    exp = []
    for i, t in inc:
        w = t.split()
        lps = [math.log(lam * (bc[f"{a} {b}"] / uc[a])
                        + (1 - lam) * (uc[b] / n_total))
               for a, b in zip(w, w[1:])]
        lp = sum(lps) / len(lps)
        exp.append((i, _r6(lp), len(lps), "keep" if lp >= -5.0 else "filter"))
    assert [(r[0], r[2], r[3]) for r in got] == [(i, n, v) for i, _, n, v in exp]
    for r, (_, lp, _, _) in zip(got, exp):
        assert abs(r[1] - lp) < 2e-6
    assert {r[3] for r in got} == {"keep", "filter"}  # both verdicts exercised


def test_funnel_conversion_matches_direct_python():
    from oaim_sandbox_spark.queries_textstats import funnel_conversion

    rows = [  # (eid, uid, type, ts_us, value)
        # user 1: full ordered funnel
        (1, 1, "view", 1_000_000, 0), (2, 1, "click", 2_000_000, 0),
        (3, 1, "purchase", 3_000_000, 0),
        # user 2: view then purchase, NO click -> stops at view stage
        (4, 2, "view", 1_000_000, 0), (5, 2, "purchase", 9_000_000, 0),
        # user 3: click BEFORE first view -> click stage requires ts > t_view
        (6, 3, "click", 1_000_000, 0), (7, 3, "view", 2_000_000, 0),
        # user 4: view, click, purchase BEFORE click -> no conversion
        (8, 4, "view", 1_000_000, 0), (9, 4, "purchase", 2_000_000, 0),
        (10, 4, "click", 3_000_000, 0),
        # user 5: purchase only -> not even in the view stage
        (11, 5, "purchase", 1_000_000, 0),
    ]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(funnel_conversion("duck")).fetchall()
    # views: users 1,2,3,4; clicks-after-view: 1,4; purchases-after-click: 1
    assert got == [(4, 2, 1, _r6(1 / 4))]


def test_hourly_autocorr_by_type_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import hourly_autocorr_by_type

    HOUR = 3_600_000_000
    plan = {  # type -> hour index -> count (gap hours zero-filled)
        "click": {0: 3, 1: 2, 3: 5, 4: 1},   # hour 2 missing -> spine fills 0
        "view": {10: 1, 12: 1},              # sparse type, gap at 11
    }
    rows, eid = [], 0
    for et, hs in plan.items():
        for h, c in hs.items():
            for j in range(c):
                eid += 1
                rows.append((eid, 1, et, h * HOUR + j * 1000, 1.0))
    con = duckdb.connect()
    _mk_events(con, rows)
    got = {r[0]: r for r in con.execute(hourly_autocorr_by_type("duck")).fetchall()}

    for et, hs in plan.items():
        lo, hi = min(hs), max(hs)
        series = [hs.get(h, 0) for h in range(lo, hi + 1)]
        x, y = np.array(series[:-1], float), np.array(series[1:], float)
        n = len(x)
        num = n * (x * y).sum() - x.sum() * y.sum()
        den = math.sqrt((n * (x * x).sum() - x.sum() ** 2)
                        * (n * (y * y).sum() - y.sum() ** 2))
        r = got[et]
        assert r[1] == n
        assert abs(r[2] - _r6((x.sum() + y.sum()) / (2 * n))) < 2e-6
        if den == 0:
            assert r[3] is None
        else:
            assert abs(r[3] - num / den) < 1e-5, (et, r[3], num / den)
    # the zero-filled gap must be IN the series: without it, click's
    # lag-1 pairs would be 2 not 4
    assert got["click"][1] == 4


def test_source_crossentropy_matrix_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import source_crossentropy_matrix

    rows = [
        (0, "srcA", "a a b c"),
        (1, "srcB", "a b b d d"),
    ]
    con = duckdb.connect()
    _mk_docs_src(con, rows)
    got = {(r[0], r[1]): r for r in
           con.execute(source_crossentropy_matrix("duck")).fetchall()}

    cnt = {s: Counter(t.split()) for _, s, t in rows}
    vocab = len(set().union(*[set(c) for c in cnt.values()]))
    tot = {s: sum(c.values()) for s, c in cnt.items()}
    for a in cnt:
        h_a = -sum((c / tot[a]) * math.log(c / tot[a]) for c in cnt[a].values())
        for b in cnt:
            shared = set(cnt[a]) & set(cnt[b])
            om = sum(cnt[a][w] / tot[a] for w in shared)
            hp = -sum((cnt[a][w] / tot[a])
                      * math.log((cnt[b][w] + 1.0) / (tot[b] + vocab))
                      for w in shared)
            ce = hp + (1.0 - om) * math.log(tot[b] + vocab)
            r = got[(a, b)]
            assert abs(r[2] - om) < 1e-5
            assert abs(r[3] - ce) < 1e-5
            assert abs(r[4] - (ce - h_a)) < 1e-5
    # self-KL is the smallest in each row (a's own model predicts it best)
    assert got[("srcA", "srcA")][4] < got[("srcA", "srcB")][4]


def test_norm_anova_by_label_matches_scipy_formula():
    from oaim_sandbox_spark.queries_extended import norm_anova_by_label

    dim = 64
    vec = lambda a: [a] + [0.0] * (dim - 1)  # noqa: E731  norm == a exactly-ish
    groups = {0: [1.0, 1.25, 1.5], 1: [2.0, 2.5], 2: [1.0, 1.75, 2.25]}
    vecs, vid = [], 0
    for lbl, norms in groups.items():
        for a in norms:
            vecs.append((vid, lbl, vec(a)))
            vid += 1
    con = duckdb.connect()
    _mk_embeddings(con, vecs)
    got = {r[0]: r for r in con.execute(norm_anova_by_label("duck")).fetchall()}

    allv = [a for ns in groups.values() for a in ns]
    nn, k = len(allv), len(groups)
    gmean = sum(allv) / nn
    ssb = sum(len(ns) * (sum(ns) / len(ns) - gmean) ** 2 for ns in groups.values())
    ssw = sum((a - sum(ns) / len(ns)) ** 2 for ns in groups.values() for a in ns)
    f = (ssb / (k - 1)) / (ssw / (nn - k))
    mn = min(allv)
    for lbl, ns in groups.items():
        r = got[lbl]
        assert r[1] == len(ns)
        assert abs(r[2] - (sum(ns) / len(ns) - mn) * 1e6) < 1e-3
        sd = math.sqrt(sum((a - sum(ns) / len(ns)) ** 2 for a in ns) / (len(ns) - 1))
        assert abs(r[3] - sd * 1e6) < 1e-3
        assert abs(r[4] - f) < 1e-4 * max(1.0, f)


def test_classifier_calibration_ece_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import (
        CLASSIFIER_BIAS,
        CLASSIFIER_WEIGHTS,
        ECE_BINS,
        classifier_calibration_ece,
    )

    w = dict(CLASSIFIER_WEIGHTS)
    rows = [  # tokens chosen to hit several z bins; mixed langs
        (0, "s", "vector vector hash"),          # z = -.25+2.5+.75 = 3.25
        (1, "s", "slow slow big big customer"),  # strongly negative
        (2, "s", "plain words only"),            # OOV -> z = bias
        (3, "s", "vector stream query"),
        (4, "s", "slow spark"),
    ]
    langs = {0: "en", 1: "fr", 2: "en", 3: "fr", 4: "en"}
    con = duckdb.connect()
    _mk_docs_src(con, rows, langs)
    got = con.execute(classifier_calibration_ece("duck")).fetchall()

    bins = defaultdict(list)
    for i, _, t in rows:
        z = CLASSIFIER_BIAS + sum(w.get(tok, 0.0) for tok in t.split())
        b = min(ECE_BINS - 1, max(0, math.floor((z + 8.0) / 2.0)))
        bins[b].append((1.0 / (1.0 + math.exp(-z)), 1.0 if langs[i] == "en" else 0.0))
    nn = sum(len(v) for v in bins.values())
    exp = []
    ece = 0.0
    for b, v in sorted(bins.items()):
        conf = sum(s for s, _ in v) / len(v)
        acc = sum(y for _, y in v) / len(v)
        exp.append((b, len(v), _r6(conf), _r6(acc), _r6(abs(acc - conf))))
        ece += (len(v) / nn) * abs(acc - conf)
    exp.insert(0, (-1, nn, None, None, _r6(ece)))
    assert [(r[0], r[1]) for r in got] == [(b, n) for b, n, _, _, _ in exp]
    for r, (_, _, conf, acc, gap) in zip(got, exp):
        for have, want in ((r[2], conf), (r[3], acc), (r[4], gap)):
            assert (have is None) == (want is None)
            if want is not None:
                assert abs(have - want) < 2e-6
    assert len({r[0] for r in got}) >= 4  # several bins + the ECE row


def test_retrieval_eval_metrics_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import retrieval_eval_metrics

    rng = np.random.default_rng(11)
    n = 60  # only vec_id 0 is a query (ids < 97); qrels ~ n/25
    vecs = [(i, 0, [float(x) for x in rng.normal(size=8)]) for i in range(n)]
    con = duckdb.connect()
    _mk_embeddings(con, vecs)
    got = con.execute(retrieval_eval_metrics("duck")).fetchall()

    f32 = {i: [float(np.float32(x)) for x in v] for i, _, v in vecs}
    rel = [i for i in range(1, n)
           if (_h64(f"0\x1f{i}") % MOD) % 25 == 0]
    assert rel, "fixture must plant at least one relevant doc"
    ranked = sorted((i for i in range(1, n)),
                    key=lambda i: (_cos_dist(f32[i], f32[0]), i))[:10]
    hits = [(r + 1) for r, i in enumerate(ranked) if i in rel]
    dcg = sum(1.0 / math.log2(rk + 1) for rk in hits)
    idcg = sum(1.0 / math.log2(i + 1) for i in range(1, min(len(rel), 10) + 1))
    exp = (0, len(rel), len(hits), _r6(len(hits) / len(rel)),
           _r6(1.0 / hits[0]) if hits else 0.0, _r6(dcg / idcg))
    assert len(got) == 1
    r = got[0]
    assert (r[0], r[1], r[2]) == exp[:3]
    assert abs(r[3] - exp[3]) < 2e-6 and abs(r[4] - exp[4]) < 2e-6 \
        and abs(r[5] - exp[5]) < 2e-6


def test_quality_length_confound_matches_direct_python():
    from oaim_sandbox_spark.operators.text_analysis import STOPWORDS
    from oaim_sandbox_spark.queries_extended import quality_length_confound

    all_stop = {w for ws in STOPWORDS.values() for w in ws}
    rows = [
        (0, "srcA", "the of and to in plenty of meaningful content here"),
        (1, "srcA", "short the of"),
        (2, "srcA", " ".join(["the", "content", "of", "quality"] * 10)),
        (3, "srcA", "zz qq ww"),
        # srcB: identical quality scores -> zero y-variance -> NULL corr
        (4, "srcB", "same text here ok"),
        (5, "srcB", "same text here ok"),
    ]
    con = duckdb.connect()
    _mk_docs_src(con, rows)
    got = {r[0]: r for r in con.execute(quality_length_confound("duck")).fetchall()}

    def qscore(t):
        toks = t.split()
        stop = _r6(sum(w in all_stop for w in [x for x in t.lower().split() if x]) / len(toks))
        digit = _r6(sum(c.isdigit() for c in t) / len(t))
        return _r6(0.4 * min(len(t) / 1000.0, 1.0) + 0.4 * min(stop * 5.0, 1.0)
                   + 0.2 * (1.0 - min(digit * 10.0, 1.0)))

    for src in ("srcA", "srcB"):
        pts = [(math.log(len(t)), qscore(t)) for _, s, t in rows if s == src]
        x = np.array([p[0] for p in pts])
        y = np.array([p[1] for p in pts])
        mx, my = x.mean(), y.mean()
        cov = (x * y).mean() - mx * my
        varx = (x * x).mean() - mx * mx
        sds = math.sqrt(varx * ((y * y).mean() - my * my))
        agree = np.mean((y >= my) == (x >= mx))
        r = got[src]
        assert r[1] == len(pts)
        if sds == 0:
            assert r[2] is None
        else:
            assert abs(r[2] - cov / sds) < 1e-5
        if varx == 0:
            assert r[3] is None
        else:
            assert abs(r[3] - cov / varx) < 1e-4
        assert abs(r[4] - agree) < 2e-6
    # identical srcB docs: zero variance on BOTH axes -> NULL corr AND
    # slope (nullif guards), never junk
    assert got["srcB"][2] is None and got["srcB"][3] is None


def test_mmr_exact_matches_greedy_python():
    from oaim_sandbox_spark.queries_registry import (
        MMR_FETCH_K,
        MMR_K,
        MMR_LAMBDA,
        mmr_exact_oracle,
    )

    rng = np.random.default_rng(3)
    n = 30
    vecs = [(i, 0, [float(x) for x in rng.normal(size=8)]) for i in range(n)]
    con = duckdb.connect()
    _mk_embeddings(con, vecs)
    got = con.execute(mmr_exact_oracle("duck")).fetchall()

    f32 = {i: [float(np.float32(x)) for x in v] for i, _, v in vecs}
    q = f32[0]
    nq = math.sqrt(_seqdot(q, q))
    simq = {i: _seqdot(f32[i], q) / (math.sqrt(_seqdot(f32[i], f32[i])) * nq)
            for i in range(1, n)}
    cand = sorted(simq, key=lambda i: (_r6(1.0 - simq[i]), i))[:MMR_FETCH_K]
    pair = {(a, b): _seqdot(f32[a], f32[b])
            / (math.sqrt(_seqdot(f32[a], f32[a])) * math.sqrt(_seqdot(f32[b], f32[b])))
            for a in cand for b in cand if a != b}
    chosen = [max(cand, key=lambda i: (simq[i], -i))]
    while len(chosen) < MMR_K:
        rest = [c for c in cand if c not in chosen]
        scores = {c: MMR_LAMBDA * simq[c]
                  - (1 - MMR_LAMBDA) * max(pair[(c, s)] for s in chosen)
                  for c in rest}
        nxt = min(rest, key=lambda c: (-scores[c], c))
        chosen.append(nxt)
    assert [tuple(r) for r in got] == [(v, k + 1) for k, v in enumerate(chosen)]
