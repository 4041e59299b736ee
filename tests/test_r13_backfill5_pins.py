"""Independent naive-Python pins BACK-FILLED for certified entries, round 13
wave 5: the join-shape family (as-of, range/interval, full-outer version
diff, left-outer null-aware agg, correlated LATERAL, batched kNN cross
join), set operators, JSON prop extraction, ROLLUP, the int8 two-stage
retrieval tier, and ColBERT MaxSim late interaction. Planted boundaries:
a click EXACTLY at the +5-minute range edge (kept by <=) and one exactly
at the error instant (cut by >), a same-timestamp click ordered before
its error by event_id (the ROWS frame includes it), an error with zero
follow-ups surviving the LEFT join, a zero-order customer, an acctbal
tie inside the LATERAL top-2, and an event whose props lack the key."""

import hashlib
import json
import math
from collections import Counter

import duckdb

MOD = 1_000_000_007
COLBERT_QUERY = "table scan query fast"


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _r6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _toks(text: str):
    return [t for t in text.split(" ") if t]


def _seqdot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def _cosd(a, b):
    den = math.sqrt(_seqdot(a, a)) * math.sqrt(_seqdot(b, b))
    return 1.0 - (_seqdot(a, b) / den if den != 0 else 0.0)


def _mock_embed(text: str, dim: int):
    return [(_h64(f"{text}:{i}") % 2000001) / 1000000.0 - 1.0
            for i in range(dim)]


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
    """rows: (event_id, user_id, event_type, ts_us, value, props_json)."""
    vals = ", ".join(
        f"({eid}, make_timestamp({ts}), {uid}, '{et}', "
        f"CAST({val} AS DOUBLE), '{props}')"
        for eid, uid, et, ts, val, props in rows
    )
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + vals + ") AS v(event_id, ts, user_id, event_type, value, props)"
    )


def _mk_embeddings(con, vecs):
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({vid}, [{', '.join(repr(float(x)) for x in v)}]::FLOAT[], {lbl})"
            for vid, lbl, v in vecs)
        + ") AS v(vec_id, embedding, label)"
    )


def test_asof_clicks_before_errors_matches_python():
    from oaim_sandbox_spark.queries_relational import asof_clicks_before_errors

    rows = [
        (1, 1, "click", 1_000_000, 0.0, "{}"),
        (2, 1, "error", 5_000_000, 0.0, "{}"),     # asof click = ts 1s
        (3, 1, "click", 7_000_000, 0.0, "{}"),
        (4, 1, "error", 7_000_000, 0.0, "{}"),     # SAME ts: click id 3 < 4
        (5, 2, "error", 9_000_000, 0.0, "{}"),     # no preceding click: dropped
        (6, 2, "view", 1_000, 0.0, "{}"),          # non-click/error ignored
        (7, 3, "click", 2_000_000, 0.0, "{}"),
    ]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(asof_clicks_before_errors("duck")).fetchall()

    exp = []
    tagged = sorted((r for r in rows if r[2] in ("click", "error")),
                    key=lambda r: (r[1], r[3], r[0]))
    for i, (eid, uid, et, ts, _, _) in enumerate(tagged):
        if et != "error":
            continue
        clicks = [r[3] for r in tagged[:i] if r[1] == uid and r[2] == "click"]
        if clicks:
            prev = max(clicks)
            exp.append((uid, eid, ts, prev, ts - prev))
    assert [tuple(r) for r in got] == exp
    by_eid = {r[1]: r for r in got}
    assert by_eid[4][3] == 7_000_000        # same-ts click counted (ROWS frame)
    assert 5 not in by_eid                  # never-clicked user dropped


def test_range_error_followups_matches_python():
    from oaim_sandbox_spark.queries_relational import range_error_followups

    m5 = 300_000_000
    rows = [
        (1, 1, "error", 1_000_000, 0.0, "{}"),
        (2, 1, "click", 1_000_000, 0.0, "{}"),          # AT the error: cut (>)
        (3, 1, "click", 1_000_000 + m5, 0.0, "{}"),     # EXACTLY +5 min: kept
        (4, 1, "click", 1_000_000 + m5 + 1, 0.0, "{}"), # 1 us past: cut
        (5, 2, "error", 9_000_000, 0.0, "{}"),          # zero follow-ups
        (6, 3, "click", 9_500_000, 0.0, "{}"),          # other user
    ]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(range_error_followups("duck")).fetchall()

    exp = []
    for eid, uid, et, ts, _, _ in sorted(rows):
        if et != "error":
            continue
        n = sum(1 for r in rows if r[2] == "click" and r[1] == uid
                and ts < r[3] <= ts + m5)
        exp.append((uid, eid, n))
    exp.sort()
    assert [tuple(r) for r in got] == exp
    by_eid = {r[1]: r[2] for r in got}
    assert by_eid[1] == 1                   # only the exact-boundary click
    assert by_eid[5] == 0                   # LEFT join keeps the lonely error


def test_docs_union_intersect_except_match_python():
    from oaim_sandbox_spark.queries_relational import docs_union_distinct
    from oaim_sandbox_spark.queries_training import docs_intersect_except

    # even ids: 2,4,6,8; long docs (>300 chars): 3,4 -> overlap = {4}
    rows = [(1, "a" * 10, "en", "s"), (2, "b" * 20, "en", "s"),
            (3, "c" * 301, "en", "s"), (4, "d" * 400, "en", "s"),
            (5, "e" * 50, "en", "s"), (6, "f" * 300, "en", "s"),
            (7, "g" * 299, "en", "s"), (8, "h" * 5, "en", "s")]
    con = duckdb.connect()
    _mk_documents(con, rows)

    even = {r[0] for r in rows if r[0] % 2 == 0}
    long_ = {r[0] for r in rows if len(r[1]) > 300}
    got_u = con.execute(docs_union_distinct("duck")).fetchall()
    assert [r[0] for r in got_u] == sorted(even | long_)

    got_ie = con.execute(docs_intersect_except("duck")).fetchall()
    exp = ([("both", i) for i in sorted(even & long_)]
           + [("only_even", i) for i in sorted(even - long_)])
    assert [tuple(r) for r in got_ie] == exp
    assert ("both", 4) in exp and ("only_even", 2) in exp


def test_customer_order_stats_outer_matches_python():
    from oaim_sandbox_spark.queries_training import customer_order_stats_outer

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE customer AS SELECT * FROM (VALUES "
        "(1, 'a'), (2, 'b'), (3, 'c')) AS v(c_custkey, c_name)")
    con.execute(
        "CREATE TABLE orders AS SELECT * FROM (VALUES "
        "(10, 1, 100.50::DECIMAL(15,2)), (11, 1, 20.25::DECIMAL(15,2)), "
        "(12, 3, 7.00::DECIMAL(15,2))) AS v(o_orderkey, o_custkey, o_totalprice)")
    got = con.execute(customer_order_stats_outer("duck")).fetchall()

    exp = [(1, 2, 120.75), (2, 0, 0.0), (3, 1, 7.0)]
    assert [tuple(r) for r in got] == exp   # customer 2 survives with zeros


def test_lateral_top_customers_matches_python():
    from oaim_sandbox_spark.queries_extended import lateral_top_customers

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE nation AS SELECT * FROM (VALUES "
        "(0, 'ALPHA'), (1, 'BETA')) AS v(n_nationkey, n_name)")
    # BETA has an acctbal TIE at the top -> c_custkey ASC picks 20, 21;
    # ALPHA has a single customer (top-2 returns just one row).
    con.execute(
        "CREATE TABLE customer AS SELECT * FROM (VALUES "
        "(10, 0, 55.10), (20, 1, 99.99), (21, 1, 99.99), (22, 1, 12.00)"
        ") AS v(c_custkey, c_nationkey, c_acctbal)")
    got = con.execute(lateral_top_customers("duck")).fetchall()

    exp = [("ALPHA", 10, 55.1), ("BETA", 20, 99.99), ("BETA", 21, 99.99)]
    assert [tuple(r) for r in got] == exp
    assert all(r[1] != 22 for r in got)


def test_events_json_props_matches_python():
    from oaim_sandbox_spark.queries_relational import events_json_props

    rows = [
        (1, 1, "click", 1_000_000, 0.0, '{"k": 10}'),
        (2, 1, "click", 2_000_000, 0.0, '{"k": 32}'),
        (3, 2, "click", 3_000_000, 0.0, '{"other": 5}'),   # k missing -> NULL
        (4, 2, "view", 4_000_000, 0.0, '{"k": 7}'),
    ]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(events_json_props("duck")).fetchall()

    agg = {}
    for _, _, et, _, _, props in rows:
        k = json.loads(props).get("k")
        a = agg.setdefault(et, [0, 0])
        a[0] += k if k is not None else 0
        a[1] += 1
    exp = {(et, s, n, _r6(s / n)) for et, (s, n) in agg.items()}
    assert {tuple(r) for r in got} == exp
    click = next(r for r in got if r[0] == "click")
    assert click[2] == 3 and click[1] == 42   # NULL k skipped in SUM, not COUNT


def test_corpus_version_diff_matches_hash_python():
    from oaim_sandbox_spark.queries_extended import corpus_version_diff

    rows = [(i, f"doc number {i} body text", "en", f"s{i % 2}")
            for i in range(1, 101)]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(corpus_version_diff("duck")).fetchall()

    v1 = {did: (_h64(text), src) for did, text, _, src in rows}
    v2 = {}
    for did, text, _, src in rows:
        hm = _h64(f"vdiff:{did}") % MOD
        if hm % 17 == 0:
            continue
        th = _h64(text + " v2") if hm % 13 == 0 else _h64(text)
        v2[did] = (th, src)
        if hm % 19 == 0:
            v2[did + 1000000] = (_h64("new:" + text), src)
    cells = Counter()
    for did in set(v1) | set(v2):
        if did not in v1:
            cells[(v2[did][1], "added")] += 1
        elif did not in v2:
            cells[(v1[did][1], "removed")] += 1
        elif v1[did][0] != v2[did][0]:
            cells[(v1[did][1], "modified")] += 1
        else:
            cells[(v1[did][1], "unchanged")] += 1
    exp = sorted((src, st, n) for (src, st), n in cells.items())
    assert [tuple(r) for r in got] == exp
    assert {st for _, st, _ in exp} == {"added", "removed", "modified", "unchanged"}


def test_events_rollup_matches_python():
    from oaim_sandbox_spark.queries_relational import events_rollup

    day = 86_400_000_000
    rows = [(1, 1, "click", 10, 1.5, "{}"),
            (2, 1, "click", day + 5, 2.25, "{}"),
            (3, 2, "error", 20, 4.0, "{}")]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(events_rollup("duck")).fetchall()

    detail = Counter()
    sums = Counter()
    for _, _, et, ts, val, _ in rows:
        detail[(et, ts // day)] += 1
        sums[(et, ts // day)] += val
    exp = set()
    for (et, dd), n in detail.items():
        exp.add((et, dd, 0, 0, n, sums[(et, dd)]))
    for et in {r[2] for r in rows}:
        n = sum(v for (e, _), v in detail.items() if e == et)
        s = sum(v for (e, _), v in sums.items() if e == et)
        exp.add((et, -1, 0, 1, n, s))
    exp.add(("ALL", -1, 1, 1, len(rows), sum(r[4] for r in rows)))
    assert {tuple(r) for r in got} == exp


def test_quantized_topk_matches_python():
    from oaim_sandbox_spark.queries_training import quantized_topk

    # binary-exact components so FLOAT[] storage loses nothing; the scale
    # varies per vector so the int8 grid differs across the store.
    vecs = [(0, 0, [1.0, 0.5, 0.0, -0.25]),
            (1, 0, [1.0, 0.5, 0.0, -0.25]),       # identical to q -> dist 0
            (2, 0, [2.0, 1.0, 0.0, -0.5]),        # same direction, 2x scale
            (3, 0, [-1.0, -0.5, 0.0, 0.25]),      # opposite
            (4, 0, [0.5, -1.0, 0.75, 0.125]),
            (5, 0, [0.0, 0.0, 1.0, 0.0]),
            (6, 0, [0.25, 0.25, -0.25, 0.5])]
    con = duckdb.connect()
    _mk_embeddings(con, vecs)
    got = con.execute(quantized_topk("duck")).fetchall()

    def q8(v):
        scale = max(max(abs(x) for x in v), 1e-30)
        return [math.floor(x / scale * 127.0 + 0.5) for x in v]

    q = [1.0, 0.5, 0.0, -0.25]
    qq = q8(q)
    exp = []
    for vid, _, v in vecs:
        if vid == 0:
            continue
        sv = q8(v)
        den = math.sqrt(_seqdot(sv, sv)) * math.sqrt(_seqdot(qq, qq))
        approx = 1.0 - _seqdot(sv, qq) / den
        exp.append((vid, _r6(_cosd(v, q)), _r6(approx)))
    exp.sort(key=lambda r: (r[1], r[0]))
    assert [tuple(r) for r in got] == exp[:10]
    by_vid = {r[0]: r for r in got}
    assert by_vid[1][1] == 0.0 and by_vid[2][1] == 0.0   # scale cancels
    assert by_vid[3][1] == 2.0


def test_colbert_maxsim_topk_matches_python():
    from oaim_sandbox_spark.queries_extended import (
        COLBERT_DIM, COLBERT_MAX_DOC_TOKENS, colbert_maxsim_topk)

    rows = [(5, "table scan query fast table index", "en", "s"),
            (10, "completely unrelated words here", "en", "s"),
            (15, " ".join(f"w{i}" for i in range(20)), "en", "s"),  # capped at 12
            (7, "table scan filtered out by doc id", "en", "s")]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(colbert_maxsim_topk("duck")).fetchall()

    qvecs = [(_toks(COLBERT_QUERY)[i], _mock_embed(_toks(COLBERT_QUERY)[i], COLBERT_DIM))
             for i in range(len(_toks(COLBERT_QUERY)))]
    exp = []
    for did, text, _, _ in rows:
        if did % 5 != 0:
            continue
        dvecs = [_mock_embed(t, COLBERT_DIM)
                 for t in _toks(text)[:COLBERT_MAX_DOC_TOKENS]]
        total = 0
        for _, qv in qvecs:
            best = max(_seqdot(dv, qv) for dv in dvecs)
            total += math.floor(best * 1000000.0 + 0.5)
        exp.append((did, total / 1000000.0))
    exp.sort(key=lambda r: (-r[1], r[0]))
    assert [tuple(r) for r in got] == exp[:10]
    assert got[0][0] == 5          # the echo doc wins (exact token matches)
    assert all(r[0] != 7 for r in got)


def test_knn_join_batch_matches_python():
    from oaim_sandbox_spark.queries_relational import knn_join_batch

    # queries: vec_id 0 and 97 (every 97th). Other queries' vectors ARE
    # candidate neighbors (only self is excluded).
    vecs = [(0, 0, [1.0, 0.0, 0.0, 0.0]), (97, 0, [0.0, 1.0, 0.0, 0.0])]
    vecs += [(i, 0, [1.0, float(i % 5), 0.5, 0.0]) for i in range(1, 9)]
    con = duckdb.connect()
    _mk_embeddings(con, vecs)
    got = con.execute(knn_join_batch("duck")).fetchall()

    exp = []
    for qid, _, qv in vecs:
        if qid % 97 != 0:
            continue
        cands = sorted(((_r6(_cosd(v, qv)), vid) for vid, _, v in vecs
                        if vid != qid), key=lambda r: (r[0], r[1]))
        for rk, (dist, vid) in enumerate(cands[:5], 1):
            exp.append((qid, vid, rk, dist))
    assert sorted(map(tuple, got)) == sorted(exp)
    per_q = Counter(r[0] for r in got)
    assert per_q == {0: 5, 97: 5}              # exactly top-5 per query
    assert all(r[0] != r[1] for r in got)      # self excluded, others eligible
