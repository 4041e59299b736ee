"""Non-degenerate-path pins for extended templates whose oracle
certification runs over data that cannot exercise every branch (r10
review: the generated corpora are globally ts-ordered, so
late_arrival_profile certifies on the all-zeros path only — a sign flip
or swapped thresholds would still certify green)."""

import duckdb

from oaim_sandbox_spark.queries_extended import _late_arrival_body

# (event_id, event_type, ts_us) — deliberately out of arrival order:
# click id3 arrives 70s behind the high-water mark, id5 700s behind.
ROWS = [
    (1, "click", 0),
    (2, "click", 120_000_000),
    (3, "click", 50_000_000),
    (4, "click", 800_000_000),
    (5, "click", 100_000_000),
    (6, "error", 0),
    (7, "error", 30_000_000),
]
EXPECT = {
    # type: (n, late_60s, late_600s, max_late_us, mean_late_us)
    "click": (5, 2, 1, 700_000_000, (0 + 0 + 70_000_000 + 0 + 700_000_000) // 5),
    "error": (2, 0, 0, 0, 0),
}


def _check(rows):
    got = {r[0]: tuple(int(x) for x in r[1:]) for r in rows}
    assert got == EXPECT, got


def test_late_arrival_profile_nonzero_path_spark(spark):
    df = spark.createDataFrame(
        [(i, t, us) for i, t, us in ROWS],
        "event_id BIGINT, event_type STRING, ts_us BIGINT",
    )
    df.createOrReplaceTempView("late_ev")
    out = spark.sql(_late_arrival_body("spark", rel="late_ev")).collect()
    _check([tuple(r) for r in out])
    spark.catalog.dropTempView("late_ev")


HOUR = 3_600_000_000
# Two users: u1 has one session spanning 10:30-12:26 (five events at 29-min
# gaps — UNDER the >= 30min break, session_window semantics, so they
# chain); u2 a second session 10:45-10:50. Hand-computed per-hour peaks:
#   hour 10: u1 starts (conc 1), u2 starts (2), u2 ends (1)      -> max 2
#   hour 11: no boundaries (level 1 carried)                     -> absent
#   hour 12: carry-in 1, u1's end is the only boundary (-> 0)    -> max 1
# Hour 12 is exactly the r10 review counterexample: without the carry-in
# the row read max_concurrent=0 while one session was live until 12:26.
GAP29 = 1_740_000_000
SWEEP_EVENTS = [
    (1, 1, 10 * HOUR + 1_800_000_000),
    (2, 1, 10 * HOUR + 1_800_000_000 + GAP29),
    (3, 1, 10 * HOUR + 1_800_000_000 + 2 * GAP29),
    (4, 1, 10 * HOUR + 1_800_000_000 + 3 * GAP29),
    (5, 1, 10 * HOUR + 1_800_000_000 + 4 * GAP29),
    (6, 2, 10 * HOUR + 2_700_000_000),
    (7, 2, 10 * HOUR + 3_000_000_000),
]
SWEEP_EXPECT = {
    10: (3, 2, 2),  # (n_boundaries, max_concurrent, sessions_started)
    12: (1, 1, 0),
}


def _check_sweep(rows):
    got = {r[0]: tuple(int(x) for x in r[1:]) for r in rows}
    assert got == SWEEP_EXPECT, got


def test_sweepline_carry_in_spark(spark):
    from oaim_sandbox_spark.queries_extended import _sessions_sql, _sweepline_body

    df = spark.createDataFrame(
        [(i, u, us) for i, u, us in SWEEP_EVENTS],
        "event_id BIGINT, user_id BIGINT, ts_us BIGINT",
    )
    df.createOrReplaceTempView("sweep_ev")
    out = spark.sql(
        "WITH sess AS (" + _sessions_sql("spark", events_rel="sweep_ev") + "),\n"
        + _sweepline_body("spark")
    ).collect()
    _check_sweep([tuple(r) for r in out])
    spark.catalog.dropTempView("sweep_ev")


def test_sweepline_carry_in_duckdb():
    from oaim_sandbox_spark.queries_extended import _sessions_sql, _sweepline_body

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE sweep_ev AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {u}, make_timestamp({us}))" for i, u, us in SWEEP_EVENTS)
        + ") AS v(event_id, user_id, ts)"
    )
    out = con.execute(
        "WITH sess AS (" + _sessions_sql("duck", events_rel="sweep_ev") + "),\n"
        + _sweepline_body("duck")
    ).fetchall()
    _check_sweep(out)


def _naive_hourly_peaks(sessions):
    """Reference sweep in plain Python: per hour WITH at least one
    boundary, the max concurrency over [hour_start, hour_end) — including
    the level carried into the hour."""
    pts = {}
    for s, e in sessions:
        pts[s] = pts.get(s, 0) + 1
        pts[e + 1] = pts.get(e + 1, 0) - 1
    level, levels = 0, []  # (t, level AFTER applying t's deltas)
    for t in sorted(pts):
        level += pts[t]
        levels.append((t, level))
    out = {}
    for i, (t, lv) in enumerate(levels):
        h = t // HOUR
        carry = levels[i - 1][1] if i else 0
        cur = out.get(h)
        best = max(lv, carry if (cur is None) else max(cur, lv, carry))
        out[h] = best
    return out


from hypothesis import example, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

SESSIONS = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 5 * 3600), st.integers(0, 7200)),
    min_size=1, max_size=25,
)  # (user, start_sec, duration_sec) over a 5-hour span


@given(raw=SESSIONS)
@settings(max_examples=40, deadline=None)
def test_sweepline_matches_naive_python(raw):
    """The hour-partitioned two-pass sweep equals the obvious sequential
    sweep for arbitrary interval sets — the property that would have caught
    the carry-in bug (r10 review) on the first run. DuckDB executes the
    shared SQL; the naive model consumes the SESSIONS the SQL itself
    derives (random intervals may split/merge under the 30-min gap rule),
    so the property isolates the SWEEP algebra from sessionization."""
    from oaim_sandbox_spark.queries_extended import _sessions_sql, _sweepline_body

    con = duckdb.connect()
    rows, eid = [], 0
    for u, start, dur in raw:
        for t in (start, start + dur):
            eid += 1
            rows.append(f"({eid}, {u}, make_timestamp({t * 1_000_000}))")
    con.execute(
        "CREATE TABLE sweep_ev AS SELECT * FROM (VALUES "
        + ", ".join(rows) + ") AS v(event_id, user_id, ts)"
    )
    sess = con.execute(
        _sessions_sql("duck", events_rel="sweep_ev")
    ).fetchall()
    got = {int(r[0]): int(r[2]) for r in con.execute(
        "WITH sess AS (" + _sessions_sql("duck", events_rel="sweep_ev") + "),\n"
        + _sweepline_body("duck")
    ).fetchall()}
    want = _naive_hourly_peaks([(int(s), int(e)) for _u, _sid, s, e in sess])
    assert got == want, (got, want, sess)


@given(
    docs=st.lists(
        st.tuples(st.integers(0, 3),
                  st.lists(st.sampled_from("abcdef"), min_size=1, max_size=8)),
        min_size=1, max_size=20,
    )
)
@settings(max_examples=40, deadline=None)
def test_crossentropy_matrix_matches_direct_python(docs):
    """The no-outer-join absent-mass closed form equals the direct
    H(a,b) = -sum_w p_a(w) ln((c_b(w)+1)/(tot_b+V)) computed in plain
    Python over the full corpus vocab — the algebra that makes the CE
    matrix join-free for absent terms must not drift from the textbook
    definition."""
    import math as m

    from oaim_sandbox_spark.queries_extended import (
        _source_crossentropy_body,
        _source_token_counts_sql,
    )

    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, 'src{s}', '{' '.join(words)}', 'en', {len(' '.join(words))})"
        for i, (s, words) in enumerate(docs)
    )
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + vals + ") AS v(doc_id, source, text, lang, n_chars)"
    )
    got = {(r[0], r[1]): (r[2], r[3]) for r in con.execute(
        "WITH sc AS (" + _source_token_counts_sql("duck") + "),\n"
        + _source_crossentropy_body("duck")
    ).fetchall()}
    # direct computation
    counts: dict = {}
    for s, words in docs:
        src = f"src{s}"
        for w in words:
            counts.setdefault(src, {})
            counts[src][w] = counts[src].get(w, 0) + 1
    vocab = len({w for c in counts.values() for w in c})
    tots = {s: sum(c.values()) for s, c in counts.items()}
    for sa in counts:
        for sb in counts:
            pa = {w: c / tots[sa] for w, c in counts[sa].items()}
            ce = -sum(
                p * m.log((counts[sb].get(w, 0) + 1.0) / (tots[sb] + vocab))
                for w, p in pa.items()
            )
            g_ov, g_ce = got[(sa, sb)]
            assert abs(g_ce - ce) < 2e-6, (sa, sb, g_ce, ce)
            assert abs(g_ov - sum(pa[w] for w in pa if w in counts[sb])) < 2e-6


def test_late_arrival_profile_nonzero_path_duckdb():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE late_ev AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}', make_timestamp({us}))" for i, t, us in ROWS)
        + ") AS v(event_id, event_type, ts)"
    )
    out = con.execute(_late_arrival_body("duck", rel="late_ev")).fetchall()
    _check(out)


def _mk_docs(con, docs):
    vals = ", ".join(
        f"({i}, 'src{s}', '{' '.join(words)}', 'en', {len(' '.join(words))})"
        for i, (s, words) in enumerate(docs)
    )
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + vals + ") AS v(doc_id, source, text, lang, n_chars)"
    )


@given(
    docs=st.lists(
        st.tuples(st.integers(0, 2),
                  st.lists(st.sampled_from("abcd"), min_size=1, max_size=10)),
        min_size=2, max_size=25,
    )
)
@settings(max_examples=40, deadline=None)
def test_ks_length_matches_direct_python(docs):
    """The grid/cumsum KS SQL equals the direct max |ECDF_src - ECDF_corpus|
    over the corpus length support, with the argmax tie broken to the
    smallest length."""
    from oaim_sandbox_spark.queries_extended import ks_length_by_source

    con = duckdb.connect()
    _mk_docs(con, docs)
    got = {r[0]: (r[2], r[3]) for r in con.execute(ks_length_by_source("duck")).fetchall()}
    lengths = {}
    for s, words in docs:
        lengths.setdefault(f"src{s}", []).append(len(" ".join(words)))
    allv = sorted({v for ls in lengths.values() for v in ls})
    n_corp = sum(len(ls) for ls in lengths.values())
    for src, ls in lengths.items():
        best, best_v = -1.0, None
        for v in allv:
            f_src = sum(1 for x in ls if x <= v) / len(ls)
            f_corp = sum(1 for xs in lengths.values() for x in xs if x <= v) / n_corp
            d = abs(f_src - f_corp)
            # STRICT comparison, no epsilon: the SQL's argmax is decided by
            # exact IEEE doubles (e.g. 1 - 2/3 is one ULP above 1/3, so
            # those gaps are NOT tied) — both engines round divisions
            # identically, so mirroring exact floats is the correct model
            if d > best:
                best, best_v = d, v
        g_d, g_v = got[src]
        assert abs(g_d - best) < 2e-6, (src, g_d, best)
        assert g_v == best_v, (src, g_v, best_v)


@given(
    texts=st.lists(st.sampled_from(["a b", "c d e", "x", "a b c"]),
                   min_size=1, max_size=30)
)
@settings(max_examples=40, deadline=None)
def test_ingest_order_curve_matches_direct_python(texts):
    """Range-bucket deciles + hash first-occurrence == the obvious
    sequential scan with a seen-set, for duplicate-heavy ingest streams."""
    from oaim_sandbox_spark.queries_extended import dedup_ingest_order_curve

    con = duckdb.connect()
    _mk_docs(con, [(0, t.split()) for t in texts])
    got = {r[0]: (r[1], r[2], r[3]) for r in
           con.execute(dedup_ingest_order_curve("duck")).fetchall()}
    n = len(texts)
    seen, naive = set(), {}
    for i, t in enumerate(texts):
        dec = min(1 + (i * 10) // n, 10)
        rows, new = naive.get(dec, (0, 0))
        is_new = t not in seen
        seen.add(t)
        naive[dec] = (rows + 1, new + (1 if is_new else 0))
    cum = 0
    for dec in sorted(naive):
        rows, new = naive[dec]
        cum += new
        assert got[dec] == (rows, new, cum), (dec, got[dec], (rows, new, cum))


@given(
    docs=st.lists(
        st.tuples(st.integers(0, 2),
                  st.lists(st.sampled_from(["the", "of", "a1", "12", "#", "…", "..."]),
                           min_size=0, max_size=60)),
        min_size=1, max_size=15,
    )
)
@settings(max_examples=40, deadline=None)
def test_gopher_rules_match_direct_python(docs):
    """Each Gopher rule's fail count equals the direct per-doc evaluation —
    word-level alpha membership, the three-symbol pattern (counting the
    one-char ellipsis and the three-dot form), stopword hits."""
    import re

    from oaim_sandbox_spark.queries_extended import gopher_quality_rules
    from oaim_sandbox_spark.operators.text_analysis import STOPWORDS

    all_stop = {w for ws in STOPWORDS.values() for w in ws}
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = {r[0]: r[1:] for r in con.execute(gopher_quality_rules("duck")).fetchall()}
    naive = {}
    for s, words in docs:
        src = f"src{s}"
        text = " ".join(words)
        toks = [t for t in text.split(" ") if t]
        nw = len(toks)
        aw = sum(1 for t in toks if re.search("[A-Za-z]", t))
        sym = len(re.findall(r"#|…|\.\.\.", text))
        sh = sum(1 for t in text.lower().split(" ") if t in all_stop)
        cns = len(text.replace(" ", ""))
        f1 = 1 if (nw < 50 or nw > 100000) else 0
        f2 = 1 if (nw == 0 or cns / nw < 3.0 or cns / nw > 10.0) else 0
        f3 = 1 if (nw > 0 and sym / nw > 0.1) else 0
        f4 = 1 if (nw == 0 or aw / nw < 0.8) else 0
        f5 = 1 if sh < 2 else 0
        agg = naive.setdefault(src, [0, 0, 0, 0, 0, 0, 0])
        agg[0] += 1
        for j, f in enumerate((f1, f2, f3, f4, f5)):
            agg[1 + j] += f
        agg[6] += 1 if (f1 + f2 + f3 + f4 + f5) == 0 else 0
    for src, agg in naive.items():
        g = got[src]
        assert list(g[:7]) == agg, (src, g, agg)
        assert abs(g[7] - agg[6] / agg[0]) < 2e-6


@given(
    docs=st.lists(
        st.tuples(st.integers(0, 1),
                  st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12)),
        min_size=2, max_size=25,
    )
)
# r11 regression pin: a single-point source (zero x-variance) must yield
# NULL beta — the exact_avg conversion's grid-rounded moments made
# mxx - mx*mx tiny-nonzero and emitted beta=0.0 until the MIN(x)=MAX(x)
# guard landed (hypothesis found it; keep it pinned)
@example(docs=[(1, ["a"]), (0, ["a", "a"])])
@settings(max_examples=40, deadline=None)
def test_heaps_fit_matches_direct_python(docs):
    """The moment-form OLS on the cumulative (ln tokens, ln vocab) curve
    equals the direct least-squares slope/intercept computed in Python."""
    import math as m

    from oaim_sandbox_spark.queries_extended import heaps_law_fit

    con = duckdb.connect()
    _mk_docs(con, docs)
    got = {r[0]: (r[1], r[2], r[3], r[4], r[5]) for r in
           con.execute(heaps_law_fit("duck")).fetchall()}
    per = {}
    for i, (s, words) in enumerate(docs):
        per.setdefault(f"src{s}", []).append((i, words))
    for src, items in per.items():
        seen, cum_t, pts = set(), 0, []
        for _i, words in items:  # doc_id order == insertion order here
            cum_t += len(words)
            seen |= set(words)
            pts.append((m.log(cum_t), m.log(len(seen))))
        n = len(pts)
        mx = sum(x for x, _ in pts) / n
        my = sum(y for _, y in pts) / n
        varx = sum(x * x for x, _ in pts) / n - mx * mx
        cov = sum(x * y for x, y in pts) / n - mx * my
        g_n, g_tot, g_vocab, g_beta, g_k = got[src]
        assert g_n == n and g_tot == cum_t and g_vocab == len(seen)
        if abs(varx) < 1e-15:
            assert g_beta is None  # zero-variance x -> NULL slope
        else:
            beta = cov / varx
            assert abs(g_beta - beta) < 5e-6, (src, g_beta, beta)
            assert abs(g_k - m.exp(my - mx * beta)) < max(5e-6, 5e-6 * g_k)


@given(
    docs=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 400),
                  st.lists(st.sampled_from(["the", "of", "zz"]), min_size=0, max_size=6)),
        min_size=1, max_size=30,
    )
)
@settings(max_examples=40, deadline=None)
def test_kappa_matches_direct_python(docs):
    """Cohen's kappa per source equals the direct po/pe computation; NULL
    exactly when pe == 1 (both labelers constant in the same direction)."""
    from oaim_sandbox_spark.operators.text_analysis import STOPWORDS
    from oaim_sandbox_spark.queries_extended import label_agreement_kappa

    all_stop = {w for ws in STOPWORDS.values() for w in ws}
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, 'src{s}', '{' '.join(words)}', 'en', {nchars})"
        for i, (s, nchars, words) in enumerate(docs)
    )
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + vals + ") AS v(doc_id, source, text, lang, n_chars)"
    )
    got = {r[0]: r[5] for r in con.execute(label_agreement_kappa("duck")).fetchall()}
    per = {}
    for s, nchars, words in docs:
        toks = [t for t in " ".join(words).lower().split(" ") if t]
        la = 1 if nchars >= 200 else 0
        ratio = round(sum(1 for t in toks if t in all_stop) / len(toks), 6) if toks else None
        lb = 1 if (ratio is not None and ratio >= 0.10) else 0
        per.setdefault(f"src{s}", []).append((la, lb))
    for src, pairs in per.items():
        n = len(pairs)
        pa, pb = sum(a for a, _ in pairs), sum(b for _, b in pairs)
        po = sum(1 for a, b in pairs if a == b) / n
        pe = (pa * pb + (n - pa) * (n - pb)) / (n * n)
        if abs(1 - pe) < 1e-15:
            assert got[src] is None, (src, got[src])
        else:
            assert abs(got[src] - (po - pe) / (1 - pe)) < 2e-6, (src, got[src])


@given(
    docs=st.lists(
        st.tuples(st.integers(0, 1),
                  st.lists(st.sampled_from("abc"), min_size=2, max_size=10)),
        min_size=1, max_size=20,
    )
)
@settings(max_examples=40, deadline=None)
def test_bigram_entropy_matches_direct_python(docs):
    """H(w2|w1) per source equals the direct conditional-entropy sum over
    (prefix, bigram) counts."""
    import math as m

    from oaim_sandbox_spark.queries_extended import bigram_entropy_rate

    con = duckdb.connect()
    _mk_docs(con, docs)
    got = {r[0]: (r[1], r[2], r[3]) for r in
           con.execute(bigram_entropy_rate("duck")).fetchall()}
    per = {}
    for s, words in docs:
        bgs = [(words[i], (words[i], words[i + 1])) for i in range(len(words) - 1)]
        per.setdefault(f"src{s}", []).extend(bgs)
    for src, bgs in per.items():
        c12, c1 = {}, {}
        for w1, bg in bgs:
            c12[bg] = c12.get(bg, 0) + 1
            c1[w1] = c1.get(w1, 0) + 1
        n = len(bgs)
        h = -sum((c / n) * m.log(c / c1[bg[0]]) for bg, c in c12.items())
        g_n, g_distinct, g_h = got[src]
        assert g_n == n and g_distinct == len(c12)
        assert abs(g_h - h) < 2e-6, (src, g_h, h)
