"""Driver-contract registry sanity: every template has an oracle, every Spark
query compiles and returns rows at sf0.001, oracle SQL parses in DuckDB."""

import duckdb
import pytest

from oaim_sandbox_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_every_template_has_oracle():
    oracles = Q.oracle_sqls()
    assert set(oracles) == set(Q.TEMPLATES)
    for name, sql in oracles.items():
        assert sql.strip().upper().startswith(("SELECT", "WITH")), name


def test_non_oracle_queries_registered():
    qs = Q.spark_queries()
    for name in Q.NON_ORACLE:
        assert name in qs
        assert name not in Q.oracle_sqls()


def test_oracle_sql_parses_in_duckdb():
    duck = duckdb.connect()
    for t in Q.ALL_TABLES:
        duck.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    for name, sql in Q.oracle_sqls().items():
        duck.sql(f"SELECT * FROM ({sql}) q LIMIT 1")  # parse + execute a row


@pytest.mark.parametrize("name", sorted(Q.TEMPLATES))
def test_spark_query_compiles(spark, name):
    df = Q.spark_queries()[name](spark, SF)
    assert df.limit(1).count() >= 0


def test_events_ts_us_timezone_independent(spark):
    """events_batch pins session tz to UTC internally, so ts_us equals the
    raw parquet value interpreted as UTC epoch-micros even when the caller's
    session is in another zone (vanilla driver sessions inherit the JVM tz)."""
    import pyarrow.parquet as pq

    from oaim_sandbox_spark.queries import events_batch

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = {r["event_id"]: r["ts_us"] for r in
               events_batch(spark, "/root/testdata/sf0.001").select("event_id", "ts_us").limit(50).collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    from datetime import timezone

    t = pq.read_table("/root/testdata/sf0.001/events.parquet", columns=["event_id", "ts"])
    want = dict(zip(t["event_id"].to_pylist(),
                    [int(v.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
                     if hasattr(v, "timestamp") else v // 1000
                     for v in t["ts"].to_pylist()]))
    assert all(got[k] == want[k] for k in got)
