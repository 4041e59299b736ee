"""Tests for operators/relational.py — as-of join, range join, rollup.

These are the beyond-the-reference relational shapes (SURVEY §2.4 notes the
reference has no theta/range/as-of joins; §2.5 no grouping sets).
"""

from pyspark.sql import functions as F

from oaim_sandbox_spark.operators.relational import asof_join, range_join, rollup_agg


def _trades_quotes(spark):
    trades = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 20, 101.0), ("B", 15, 50.0), ("C", 5, 9.0)],
        "sym STRING, t BIGINT, px DOUBLE",
    )
    quotes = spark.createDataFrame(
        [("A", 8, 99.5), ("A", 15, 100.5), ("A", 20, 100.9), ("B", 1, 49.0)],
        "sym STRING, t BIGINT, bid DOUBLE",
    )
    return trades, quotes


def test_asof_join_picks_latest_preceding(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(trades, quotes, "sym", "t", ["bid"])
    got = {(r["sym"], r["t"]): r["bid_asof"] for r in out.collect()}
    # A@10 -> quote@8; A@20 -> quote@20 ties: _side=0 sorts before left rows at
    # the same order value, so the same-timestamp quote IS visible (<= semantics).
    assert got[("A", 10)] == 99.5
    assert got[("A", 20)] == 100.9
    assert got[("B", 15)] == 49.0
    assert got[("C", 5)] is None  # no preceding quote


def test_asof_join_preserves_left_rowcount(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(trades, quotes, "sym", "t", ["bid"])
    assert out.count() == trades.count()
    assert set(trades.columns).issubset(set(out.columns))


def test_asof_join_single_shuffle(spark):
    trades, quotes = _trades_quotes(spark)
    plan = asof_join(trades, quotes, "sym", "t", ["bid"])._jdf.queryExecution().executedPlan().toString()
    # one Exchange for the window partition key; union sides are narrow
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_bounds_inclusive(spark):
    trades, quotes = _trades_quotes(spark)
    out = range_join(
        trades.withColumnRenamed("t", "tt"),
        quotes.withColumnRenamed("t", "qt"),
        "sym",
        left_point="tt",
        right_point="qt",
        lower=0,
        upper=5,
    )
    pairs = {(r["sym"], r["tt"], r["qt"]) for r in out.collect()}
    assert ("A", 10, 15) in pairs  # delta 5 inclusive
    assert ("A", 15, 20) not in pairs
    assert ("A", 20, 20) in pairs  # delta 0 inclusive
    assert all(qt - tt <= 5 and qt - tt >= 0 for _, tt, qt in pairs)


def test_rollup_produces_subtotals_and_grand_total(spark):
    df = spark.createDataFrame(
        [("x", "a", 1), ("x", "b", 2), ("y", "a", 4)], "d1 STRING, d2 STRING, v INT"
    )
    out = rollup_agg(df, ["d1", "d2"], [F.sum("v").alias("s")])
    rows = {(r["d1"], r["d2"]): r["s"] for r in out.collect()}
    assert rows[("x", "a")] == 1 and rows[("x", "b")] == 2
    assert rows[("x", None)] == 3  # subtotal
    assert rows[(None, None)] == 7  # grand total
