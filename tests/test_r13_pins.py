"""Independent naive-Python/numpy pins for the 10 NEW round-13 entries —
every new oracle entry ships with a direct recomputation on hand-built
data (the r9-r12 discipline: the shared-SQL oracle cannot catch a wrong
query both engines run identically; the pin can). Boundary cases planted
deliberately: min-support cut at exactly 3, a customer sitting exactly
ON a quartile cut, a zero-variance brand, Lorenz cuts landing INSIDE a
count-value bucket, a year-boundary cohort offset, orthogonal/opposite/
identical vector groups, an open wedge vs a closed triangle."""

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np


def _r6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


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


def test_basket_lift_pairs_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import basket_lift_pairs

    # baskets by brand: the {A,B} pair co-occurs 3x (== the min-support
    # boundary, kept), {A,C}/{B,C} once/twice (cut). Order 1 carries TWO
    # parts of brand A — the DISTINCT must collapse them to one incidence.
    baskets = {1: ["A", "A", "B", "C"], 2: ["A", "B"], 3: ["A", "B"],
               4: ["B", "C"], 5: ["A"]}
    parts, lines, pk = [], [], 0
    for okey, brands in baskets.items():
        for b in brands:
            pk += 1
            parts.append((pk, b))
            lines.append((okey, pk))
    con = duckdb.connect()
    con.execute("CREATE TABLE part AS SELECT * FROM (VALUES "
                + ", ".join(f"({k}, 'Brand#{b}')" for k, b in parts)
                + ") AS v(p_partkey, p_brand)")
    con.execute("CREATE TABLE lineitem AS SELECT * FROM (VALUES "
                + ", ".join(f"({o}, {p})" for o, p in lines)
                + ") AS v(l_orderkey, l_partkey)")
    got = con.execute(basket_lift_pairs("duck")).fetchall()

    sets = {o: set(f"Brand#{b}" for b in bs) for o, bs in baskets.items()}
    n_orders = len(sets)
    brand_n = Counter(b for s in sets.values() for b in s)
    pair_n = Counter()
    for s in sets.values():
        for a in s:
            for b in s:
                if a < b:
                    pair_n[(a, b)] += 1
    exp = []
    for (a, b), nab in pair_n.items():
        if nab >= 3:
            exp.append((a, b, nab, brand_n[a], brand_n[b],
                        _r6(nab / n_orders), _r6(nab / brand_n[a]),
                        _r6(nab * n_orders / (brand_n[a] * brand_n[b]))))
    exp.sort(key=lambda r: (-r[7], r[0], r[1]))
    assert [tuple(r) for r in got] == exp
    assert got[0][0] == "Brand#A" and got[0][2] == 3  # the boundary pair survived
    assert len(got) == 1  # sub-support pairs cut


def test_rfm_segments_matches_numpy_percentiles():
    from oaim_sandbox_spark.queries_extended import rfm_segments

    # 8 customers; recency/frequency/monetary crafted so at least one
    # customer sits EXACTLY on a quartile cut (<=/>= inclusivity pinned)
    orders = []  # (okey, ckey, day_idx, totalprice)
    plan = {
        1: ([10, 20], "100.00"), 2: ([20], "250.50"), 3: ([5, 6, 7], "99.99"),
        4: ([25], "10.00"), 5: ([1], "500.00"), 6: ([18, 19], "75.25"),
        7: ([25], "250.50"), 8: ([2, 9, 24], "33.33"),
    }
    ok = 0
    for ckey, (days, price) in plan.items():
        for dd in days:
            ok += 1
            orders.append((ok, ckey, dd, price))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({o}, {c}, make_timestamp({d * 86400 * 1_000_000}), {p})"
            for o, c, d, p in orders)
        + ") AS v(o_orderkey, o_custkey, o_orderdate, o_totalprice)"
    )
    got = con.execute(rfm_segments("duck")).fetchall()

    feats = {}
    for ckey, (days, price) in plan.items():
        cents = round(float(price) * 100) * len(days)
        feats[ckey] = (max(days), len(days), cents)
    maxd = max(f[0] for f in feats.values())
    r_days = {c: maxd - f[0] for c, f in feats.items()}
    fs = {c: f[1] for c, f in feats.items()}
    ms = {c: f[2] for c, f in feats.items()}
    rc = np.percentile(sorted(r_days.values()), [25, 50, 75])
    fc = np.percentile(sorted(fs.values()), [25, 50, 75])
    mc = np.percentile(sorted(ms.values()), [25, 50, 75])
    cells = defaultdict(lambda: [0, 0, 0])
    for c in feats:
        r_s = 4 if r_days[c] <= rc[0] else 3 if r_days[c] <= rc[1] \
            else 2 if r_days[c] <= rc[2] else 1
        f_s = 4 if fs[c] >= fc[2] else 3 if fs[c] >= fc[1] \
            else 2 if fs[c] >= fc[0] else 1
        m_s = 4 if ms[c] >= mc[2] else 3 if ms[c] >= mc[1] \
            else 2 if ms[c] >= mc[0] else 1
        cell = cells[(r_s, f_s, m_s)]
        cell[0] += 1
        cell[1] += fs[c]
        cell[2] += ms[c]
    exp = [(r, f, m, n, _r6(fsum / n), _r6(msum / (n * 100)))
           for (r, f, m), (n, fsum, msum) in sorted(cells.items())]
    assert [tuple(r) for r in got] == exp
    # at least one feature value sits exactly on a cut (the boundary the
    # fixture plants: duplicated day-25 recency / duplicated 250.50 spend)
    assert any(v in rc for v in r_days.values()) or any(v in mc for v in ms.values())


def test_discount_lift_by_brand_matches_numpy():
    from oaim_sandbox_spark.queries_extended import discount_lift_by_brand

    # brand L: perfectly linear qty = 10 + 1000*discount -> slope 1000,
    # corr 1; brand N: noisy; brand Z: zero discount variance -> NULLs
    pts = {
        "L": [(0.00, 10), (0.01, 20), (0.02, 30), (0.03, 40)],
        "N": [(0.00, 7), (0.05, 30), (0.10, 11), (0.02, 44)],
        "Z": [(0.04, 5), (0.04, 9), (0.04, 13)],
    }
    rows, pk = [], 0
    lines = []
    for b, ps in pts.items():
        for disc, qty in ps:
            pk += 1
            rows.append((pk, b))
            lines.append((pk, disc, qty))
    con = duckdb.connect()
    con.execute("CREATE TABLE part AS SELECT * FROM (VALUES "
                + ", ".join(f"({k}, 'Brand#{b}')" for k, b in rows)
                + ") AS v(p_partkey, p_brand)")
    con.execute("CREATE TABLE lineitem AS SELECT * FROM (VALUES "
                + ", ".join(f"({k}, CAST({d} AS DOUBLE), CAST({q} AS DOUBLE))"
                            for k, d, q in lines)
                + ") AS v(l_partkey, l_discount, l_quantity)")
    got = {r[0]: r for r in con.execute(discount_lift_by_brand("duck")).fetchall()}

    for b, ps in pts.items():
        x = np.array([p[0] for p in ps])
        y = np.array([p[1] for p in ps], dtype=float)
        r = got[f"Brand#{b}"]
        assert r[1] == len(ps)
        assert abs(r[2] - _r6(x.mean())) < 2e-6
        assert abs(r[3] - _r6(y.mean())) < 2e-6
        if x.min() == x.max():
            assert r[4] is None and r[5] is None
        else:
            slope = np.polyfit(x, y, 1)[0]
            corr = np.corrcoef(x, y)[0, 1]
            assert abs(r[4] - slope) < 1e-4, (b, r[4], slope)
            assert abs(r[5] - corr) < 1e-5, (b, r[5], corr)
    assert abs(got["Brand#L"][4] - 1000.0) < 1e-4 and abs(got["Brand#L"][5] - 1.0) < 1e-6


def test_supplier_share_hhi_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import supplier_share_hhi

    # nation X: suppliers with revenue 100 and 300 (after discount) ->
    # shares 0.25/0.75, HHI 0.625; nation Y: monopoly -> HHI 1.0
    lines = [  # (suppkey, ext, disc)
        (1, "50.00", "0.00"), (1, "50.00", "0.00"),      # supp 1: 100
        (2, "400.00", "0.25"),                           # supp 2: 300
        (3, "123.45", "0.00"),                           # supp 3 (Y): all of Y
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE lineitem AS SELECT * FROM (VALUES "
                + ", ".join(f"({s}, {e}, {d})" for s, e, d in lines)
                + ") AS v(l_suppkey, l_extendedprice, l_discount)")
    con.execute("CREATE TABLE supplier AS SELECT * FROM (VALUES "
                "(1, 0), (2, 0), (3, 1)) AS v(s_suppkey, s_nationkey)")
    con.execute("CREATE TABLE nation AS SELECT * FROM (VALUES "
                "(0, 'X'), (1, 'Y')) AS v(n_nationkey, n_name)")
    got = con.execute(supplier_share_hhi("duck")).fetchall()
    assert got == [("X", 2, 0.625, 0.75), ("Y", 1, 1.0, 1.0)]


def test_cohort_ltv_curve_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import cohort_ltv_curve

    # customer 1: first order Dec 1997, next Jan 1998 -> the year-boundary
    # offset must be 1, not -11; customer 2 shares the cohort, orders once
    orders = [  # (okey, ckey, 'YYYY-MM-DD', price)
        (1, 1, "1997-12-05", "100.00"),
        (2, 1, "1998-01-20", "50.00"),
        (3, 2, "1997-12-28", "30.00"),
        (4, 3, "1998-02-02", "80.00"),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE orders AS SELECT * FROM (VALUES "
                + ", ".join(f"({o}, {c}, TIMESTAMP '{dt} 00:00:00', {p})"
                            for o, c, dt, p in orders)
                + ") AS v(o_orderkey, o_custkey, o_orderdate, o_totalprice)")
    got = con.execute(cohort_ltv_curve("duck")).fetchall()

    mi = lambda dt: int(dt[:4]) * 12 + int(dt[5:7])  # noqa: E731
    firsts, cents = {}, defaultdict(lambda: [0, set()])
    for _, c, dt, p in orders:
        firsts[c] = min(firsts.get(c, 10**9), mi(dt))
    csize = Counter(firsts.values())
    for _, c, dt, p in orders:
        key = (firsts[c], mi(dt) - firsts[c])
        cents[key][0] += round(float(p) * 100)
        cents[key][1].add(c)
    cum = defaultdict(int)
    exp = []
    for (m0, off), (cts, active) in sorted(cents.items()):
        cum[m0] += cts
        exp.append((m0, off, csize[m0], len(active),
                    _r6(cts / 100), _r6(cum[m0] / (csize[m0] * 100))))
    assert [tuple(r) for r in got] == exp
    dec97 = 1997 * 12 + 12
    jan_row = [r for r in got if r[0] == dec97 and r[1] == 1]
    assert jan_row and jan_row[0][5] == _r6(180.0 / 2 / 100 * 100)  # cum 130+50 over 2 custs


def test_label_cohesion_pairwise_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import label_cohesion_pairwise

    dim = 64
    e = lambda i: [1.0 if j == i else 0.0 for j in range(dim)]  # noqa: E731
    neg = lambda v: [-x for x in v]  # noqa: E731
    rng = np.random.default_rng(7)
    rnd = [list(map(float, rng.normal(size=dim))) for _ in range(4)]
    vecs = [
        (0, 0, e(0)), (1, 0, e(0)),                  # identical -> 1.0
        (2, 1, e(1)), (3, 1, e(2)),                  # orthogonal -> 0.0
        (4, 2, e(3)), (5, 2, neg(e(3))),             # opposite -> -1.0
        (6, 3, [0.0] * dim),                          # zero vector: excluded
        (7, 3, e(5)),                                 # -> label 3 has n=1 -> NULL
        (8, 4, rnd[0]), (9, 4, rnd[1]), (10, 4, rnd[2]), (11, 4, rnd[3]),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings AS SELECT * FROM (VALUES "
                + ", ".join(f"({vid}, [{', '.join(repr(x) for x in v)}]::FLOAT[], {lbl})"
                            for vid, lbl, v in vecs)
                + ") AS v(vec_id, embedding, label)")
    got = {r[0]: r for r in con.execute(label_cohesion_pairwise("duck")).fetchall()}

    assert got[0][1] == 2 and abs(got[0][3] - 1.0) < 1e-6
    assert got[1][1] == 2 and abs(got[1][3] - 0.0) < 1e-6
    assert got[2][1] == 2 and abs(got[2][3] + 1.0) < 1e-6
    assert got[3][1] == 1 and got[3][3] is None  # zero vec dropped, n=1 -> NULL
    # random label: direct pairwise mean over float32-roundtripped unit vecs
    us = [np.array(np.array(v, dtype=np.float32), dtype=float) for v in rnd]
    us = [u / np.linalg.norm(u) for u in us]
    pair = [float(a @ b) for i, a in enumerate(us) for j, b in enumerate(us) if i != j]
    assert got[4][1] == 4 and abs(got[4][3] - np.mean(pair)) < 1e-5
    cn = np.linalg.norm(np.mean(us, axis=0))
    assert abs(got[4][2] - cn) < 1e-5


def test_dedup_chain_transitivity_body_matches_direct_python():
    """The pair machinery is pinned elsewhere (simhash_near_pairs, r12);
    this pins the wedge/closure logic on a hand-built pair graph: a 3-node
    chain (1 open wedge at its center) vs a triangle (3 closed wedges),
    with the deterministic center sample (c % MOD == 0) exercised — a
    hub center OFF the sample grid contributes nothing."""
    from oaim_sandbox_spark.queries_extended import (
        TRANSITIVITY_CENTER_MOD as MOD,
        _transitivity_body,
    )

    pairs = [(7, 8), (8, 9),               # chain centered at 8 (src0)
             (16, 24), (16, 32), (24, 32),  # triangle, all centers on-grid (src1)
             (5, 6), (5, 10)]               # wedge centered at 5: OFF-grid
    docs = {5: "src2", 6: "src2", 7: "src0", 8: "src0", 9: "src0",
            10: "src2", 16: "src1", 24: "src1", 32: "src1"}
    assert 8 % MOD == 0 and 16 % MOD == 0 and 24 % MOD == 0 and 32 % MOD == 0
    assert 5 % MOD != 0
    con = duckdb.connect()
    con.execute("CREATE TABLE p AS SELECT * FROM (VALUES "
                + ", ".join(f"({a}, {b})" for a, b in pairs)
                + ") AS v(doc_a, doc_b)")
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({k}, '{s}')" for k, s in docs.items())
                + ") AS v(doc_id, source)")
    sql = "WITH pairs AS (SELECT doc_a, doc_b FROM p)," + _transitivity_body("duck")
    got = con.execute(sql).fetchall()

    adj = defaultdict(set)
    pset = set(pairs)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    per_src = defaultdict(lambda: [0, 0])
    for c, nbrs in adj.items():
        if c % MOD != 0:
            continue
        for l in nbrs:
            for r in nbrs:
                if l < r:
                    per_src[docs[c]][0] += 1
                    per_src[docs[c]][1] += (l, r) in pset
    exp = [(s, w, cl, _r6(cl / w)) for s, (w, cl) in sorted(per_src.items())]
    assert [tuple(r) for r in got] == exp
    assert dict((r[0], r[3]) for r in got) == {"src0": 0.0, "src1": 1.0}
    assert "src2" not in {r[0] for r in got}  # off-grid center excluded


def test_metadata_lang_mismatch_matches_construction():
    from oaim_sandbox_spark.queries_extended import metadata_lang_mismatch

    # en stopwords, labeled en (match) / labeled fr (mismatch); no stopword
    # at all -> 'und' (excluded from the mismatch denominator)
    docs = [
        (0, "src0", "the of and to in the of", "en"),
        (1, "src0", "the of and to in the of", "fr"),
        (2, "src0", "zzz qqq xxx", "en"),
        (3, "src1", "the of and the", "en"),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{s}', '{t}', '{lg}')" for i, s, t, lg in docs)
                + ") AS v(doc_id, source, text, lang)")
    got = con.execute(metadata_lang_mismatch("duck")).fetchall()
    assert got == [("src0", 3, 1, 1, _r6(1 / 2)), ("src1", 1, 0, 0, 0.0)]


def test_session_trigram_paths_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import session_trigram_paths

    # user 1: c,v,p,c,v -> trigrams c>v>p, v>p>c, p>c>v
    # user 2: c,v,p     -> c>v>p (total c>v>p = 2)
    # user 3: c,v       -> too short, contributes nothing (and must NOT
    #                      chain into another user's stream)
    rows, eid = [], 0
    for uid, seq in ((1, "cvpcv"), (2, "cvp"), (3, "cv")):
        for k, ch in enumerate(seq):
            eid += 1
            et = {"c": "click", "v": "view", "p": "purchase"}[ch]
            rows.append((eid, uid, et, 1_000_000 * (k + 1), 1.0))
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(session_trigram_paths("duck")).fetchall()

    tri = Counter()
    for uid, seq in ((1, "cvpcv"), (2, "cvp"), (3, "cv")):
        ets = [{"c": "click", "v": "view", "p": "purchase"}[ch] for ch in seq]
        for i in range(len(ets) - 2):
            tri[">".join(ets[i:i + 3])] += 1
    tot = sum(tri.values())
    exp = sorted(((p, n, _r6(n / tot)) for p, n in tri.items()),
                 key=lambda r: (-r[1], r[0]))[:20]
    assert [tuple(r) for r in got] == exp
    assert got[0] == ("click>view>purchase", 2, 0.5)


def test_user_concentration_lorenz_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import user_concentration_lorenz

    # user activity 10,5,1,1,1,1,1 (7 users, 20 events): the 50% cut lands
    # INSIDE the c=1 bucket -> partial-bucket arithmetic exercised
    counts = {1: 10, 2: 5, 3: 1, 4: 1, 5: 1, 6: 1, 7: 1}
    rows, eid = [], 0
    for uid, n in counts.items():
        for k in range(n):
            eid += 1
            rows.append((eid, uid, "click", 1_000_000 * eid, 1.0))
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(user_concentration_lorenz("duck")).fetchall()

    vals = sorted(counts.values(), reverse=True)
    total, nu = sum(vals), len(vals)
    exp = []
    for p in (1, 5, 10, 50):
        k = -((-nu * p) // 100)  # ceil
        top = sum(vals[:k])
        exp.append((p, k, top, _r6(top / total)))
    assert [tuple(r) for r in got] == exp
    assert got[3] == (50, 4, 17, 0.85)


# --- wave 2 ---------------------------------------------------------------


def test_return_rate_anomaly_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import return_rate_anomaly_by_brand

    plan = {"A": ("R" * 8 + "N" * 2), "B": ("R" * 1 + "N" * 9),
            "C": ("R" * 3 + "A" * 7)}  # 'A' flag is NOT a return
    parts, lines, pk = [], [], 0
    for b, flags in plan.items():
        for fl in flags:
            pk += 1
            parts.append((pk, b))
            lines.append((pk, fl))
    con = duckdb.connect()
    con.execute("CREATE TABLE part AS SELECT * FROM (VALUES "
                + ", ".join(f"({k}, 'Brand#{b}')" for k, b in parts)
                + ") AS v(p_partkey, p_brand)")
    con.execute("CREATE TABLE lineitem AS SELECT * FROM (VALUES "
                + ", ".join(f"({k}, '{fl}')" for k, fl in lines)
                + ") AS v(l_partkey, l_returnflag)")
    got = con.execute(return_rate_anomaly_by_brand("duck")).fetchall()

    tot_n = sum(len(f) for f in plan.values())
    tot_r = sum(f.count("R") for f in plan.values())
    p0 = tot_r / tot_n
    exp = []
    for b in sorted(plan):
        n, r = len(plan[b]), plan[b].count("R")
        z = (r / n - p0) / math.sqrt(p0 * (1 - p0) / n)
        exp.append((f"Brand#{b}", n, r, _r6(r / n), _r6(p0), _r6(z)))
    assert [tuple(r) for r in got] == exp
    assert got[0][5] > 0 > got[1][5]  # A anomalously high, B low


def test_unit_price_dispersion_matches_numpy():
    from oaim_sandbox_spark.queries_extended import unit_price_dispersion

    plan = {"V": [(100.0, 1), (300.0, 2), (80.0, 4)],   # varied unit prices
            "C": [(50.0, 1), (100.0, 2), (200.0, 4)]}   # constant 50 -> cv 0
    parts, lines, pk = [], [], 0
    for b, ps in plan.items():
        for ext, qty in ps:
            pk += 1
            parts.append((pk, b))
            lines.append((pk, ext, qty))
    con = duckdb.connect()
    con.execute("CREATE TABLE part AS SELECT * FROM (VALUES "
                + ", ".join(f"({k}, 'Brand#{b}')" for k, b in parts)
                + ") AS v(p_partkey, p_brand)")
    con.execute("CREATE TABLE lineitem AS SELECT * FROM (VALUES "
                + ", ".join(f"({k}, CAST({e} AS DOUBLE), CAST({q} AS DOUBLE))"
                            for k, e, q in lines)
                + ") AS v(l_partkey, l_extendedprice, l_quantity)")
    got = {r[0]: r for r in con.execute(unit_price_dispersion("duck")).fetchall()}

    for b, ps in plan.items():
        up = np.array([e / q for e, q in ps])
        r = got[f"Brand#{b}"]
        assert r[1] == len(ps)
        assert abs(r[2] - up.mean()) < 1e-3
        cv = math.sqrt((up * up).mean() - up.mean() ** 2) / up.mean()
        if up.min() == up.max():
            assert r[3] == 0.0  # exact MIN=MAX guard, not quantization junk
        else:
            assert abs(r[3] - cv) < 1e-3
        assert abs(r[4] - up.max() / up.min()) < 2e-6
    assert got["Brand#C"][3] == 0.0


def test_centroid_classifier_accuracy_matches_numpy():
    from oaim_sandbox_spark.queries_extended import centroid_classifier_accuracy

    dim = 64
    rng = np.random.default_rng(5)
    centers = {0: rng.normal(0, 1, dim), 1: rng.normal(3, 1, dim),
               2: rng.normal(-3, 1, dim)}
    vecs, vid = [], 0
    for lbl, c in centers.items():
        for _ in range(6):
            vecs.append((vid, lbl, [float(x) for x in c + rng.normal(0, 0.5, dim)]))
            vid += 1
    # one deliberate outlier: labeled 0 but sitting on center 1
    vecs.append((vid, 0, [float(x) for x in centers[1]]))
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings AS SELECT * FROM (VALUES "
                + ", ".join(f"({v}, [{', '.join(repr(x) for x in e)}]::FLOAT[], {l})"
                            for v, l, e in vecs)
                + ") AS v(vec_id, embedding, label)")
    got = con.execute(centroid_classifier_accuracy("duck")).fetchall()

    f32 = [(v, l, np.array(np.array(e, dtype=np.float32), dtype=float))
           for v, l, e in vecs]
    cent = {}
    for lbl in centers:
        pts = [e for _, l, e in f32 if l == lbl]
        cent[lbl] = np.mean(pts, axis=0)
    conf = Counter()
    for _, l, e in f32:
        pred = min(cent, key=lambda c: (float(((e - cent[c]) ** 2).sum()), c))
        conf[(l, pred)] += 1
    totals = Counter()
    for (l, _), n in conf.items():
        totals[l] += n
    exp = [(l, p, n, _r6(n / totals[l])) for (l, p), n in sorted(conf.items())]
    assert [tuple(r) for r in got] == exp
    assert (0, 1, 1, _r6(1 / 7)) in exp  # the planted outlier misclassifies


def test_rollup_share_of_parent_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import rollup_share_of_parent

    # region X: nations n1 (100), n2 (300); region Y: n3 (600)
    rev = {("X", "n1"): "100.00", ("X", "n2"): "300.00", ("Y", "n3"): "600.00"}
    con = duckdb.connect()
    con.execute("CREATE TABLE region AS SELECT * FROM (VALUES "
                "(0, 'X'), (1, 'Y')) AS v(r_regionkey, r_name)")
    con.execute("CREATE TABLE nation AS SELECT * FROM (VALUES "
                "(0, 'n1', 0), (1, 'n2', 0), (2, 'n3', 1)"
                ") AS v(n_nationkey, n_name, n_regionkey)")
    con.execute("CREATE TABLE supplier AS SELECT * FROM (VALUES "
                "(1, 0), (2, 1), (3, 2)) AS v(s_suppkey, s_nationkey)")
    con.execute("CREATE TABLE lineitem AS SELECT * FROM (VALUES "
                "(1, 100.00, 0.00), (2, 600.00, 0.50), (3, 600.00, 0.00)"
                ") AS v(l_suppkey, l_extendedprice, l_discount)")
    got = con.execute(rollup_share_of_parent("duck")).fetchall()
    assert got == [
        ("ALL", "ALL", 1000.0, 1.0, 0),
        ("X", "ALL", 400.0, 0.4, 1),
        ("Y", "ALL", 600.0, 0.6, 1),
        ("X", "n1", 100.0, 0.25, 2),
        ("X", "n2", 300.0, 0.75, 2),
        ("Y", "n3", 600.0, 1.0, 2),
    ]


def test_containment_direction_pairs_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import containment_direction_pairs

    container = "one two three four five six seven eight nine ten"
    quote = "three four five six"            # fully contained in container
    rows = [
        (0, "srcA", container),
        (1, "srcA", quote),                  # b_in_a? a<b: doc0=container
        (2, "srcA", "one two three four x y z w"),  # partial overlap
        (3, "srcA", "p q r s t u"),          # disjoint: no pair
        (4, "srcB", quote),                  # other source: blocked
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{s}', '{t}')" for i, s, t in rows)
                + ") AS v(doc_id, source, text)")
    got = con.execute(containment_direction_pairs("duck")).fetchall()

    def tri(t):
        w = t.split()
        return {" ".join(w[j:j + 3]) for j in range(len(w) - 2)}

    exp = []
    srcA = [(i, tri(t)) for i, s, t in rows if s == "srcA"]
    for x in range(len(srcA)):
        for y in range(x + 1, len(srcA)):
            (ia, sa), (ib, sb) = srcA[x], srcA[y]
            inter = len(sa & sb)
            if not inter:
                continue
            ca, cb = inter / len(sa), inter / len(sb)
            if max(ca, cb) < 0.5:
                continue
            direction = ("mutual" if ca >= 0.8 and cb >= 0.8
                         else "a_in_b" if ca >= 0.8
                         else "b_in_a" if cb >= 0.8 else "partial")
            exp.append((ia, ib, inter, len(sa), len(sb),
                        _r6(ca), _r6(cb), direction))
    assert [tuple(r) for r in got] == exp
    assert ("b_in_a" in {r[7] for r in got})  # the quote was detected
    assert not any(4 in (r[0], r[1]) for r in got)  # source blocking held
