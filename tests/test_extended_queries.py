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


def test_late_arrival_profile_nonzero_path_duckdb():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE late_ev AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}', make_timestamp({us}))" for i, t, us in ROWS)
        + ") AS v(event_id, event_type, ts)"
    )
    out = con.execute(_late_arrival_body("duck", rel="late_ev")).fetchall()
    _check(out)
