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
# Two users: u1 has one session spanning 10:30-12:30 (events at 10:30,
# 11:00, ..., 12:30 — 30-min gaps, exactly at the break threshold so they
# chain); u2 a second session 10:45-10:50. Hand-computed per-hour peaks:
#   hour 10: u1 starts (conc 1), u2 starts (2), u2 ends (1)      -> max 2
#   hour 11: no boundaries (level 1 carried)                     -> absent
#   hour 12: carry-in 1, u1's end is the only boundary (-> 0)    -> max 1
# Hour 12 is exactly the r10 review counterexample: without the carry-in
# the row read max_concurrent=0 while one session was live until 12:30.
SWEEP_EVENTS = [
    (1, 1, 10 * HOUR + 1_800_000_000),
    (2, 1, 11 * HOUR),
    (3, 1, 11 * HOUR + 1_800_000_000),
    (4, 1, 12 * HOUR),
    (5, 1, 12 * HOUR + 1_800_000_000),
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


from hypothesis import given, settings  # noqa: E402
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
