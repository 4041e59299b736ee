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


def test_late_arrival_profile_nonzero_path_duckdb():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE late_ev AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}', make_timestamp({us}))" for i, t, us in ROWS)
        + ") AS v(event_id, event_type, ts)"
    )
    out = con.execute(_late_arrival_body("duck", rel="late_ev")).fetchall()
    _check(out)
