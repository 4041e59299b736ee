"""Z-order layout (operators/relational.zorder_write): multi-column
clustering must narrow per-file min/max ranges on EVERY keyed column — the
property parquet data skipping and partition-level pruning feed on."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from oaim_sandbox_spark.operators.relational import zorder_expr, zorder_write


def _file_spans(path: str, col: str) -> list[tuple[float, float]]:
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo, hi = float("inf"), float("-inf")
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    lo = min(lo, c.statistics.min)
                    hi = max(hi, c.statistics.max)
        if lo != float("inf"):
            spans.append((lo, hi))
    return spans


def test_zorder_narrows_every_dimension(spark, tmp_path):
    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("rid"),
        (F.col("id") * 7919 % 1000).cast("double").alias("x"),
        (F.col("id") * 104729 % 1000).cast("double").alias("y"),
    )
    path = str(tmp_path / "zordered")
    zorder_write(df, path, ["x", "y"], n_files=16, bits=10)

    out = spark.read.parquet(path)
    assert out.count() == n
    assert out.agg(F.sum("rid")).first()[0] == n * (n - 1) // 2

    for col in ("x", "y"):
        spans = _file_spans(path, col)
        assert len(spans) >= 8
        mean_span = sum(hi - lo for lo, hi in spans) / len(spans)
        # random placement gives ~999 span per file on both columns; z-order
        # must shrink BOTH dimensions substantially at once
        assert mean_span < 600, f"{col}: mean file span {mean_span}"
        # a point filter should skip most files
        hit = sum(1 for lo, hi in spans if lo <= 500.0 <= hi)
        assert hit <= len(spans) * 0.7, f"{col}: point filter hits {hit}/{len(spans)}"


def test_zorder_single_column_degenerates_to_range_sort(spark, tmp_path):
    df = spark.range(5000).select((F.col("id") % 997).cast("double").alias("x"))
    path = str(tmp_path / "z1")
    zorder_write(df, path, ["x"], n_files=8, bits=10)
    spans = _file_spans(path, "x")
    # a 1-d z-order is a plain range sort: files tile the domain with
    # near-disjoint ranges
    total = sum(hi - lo for lo, hi in spans)
    assert total <= 997 * 1.5


def test_zorder_validates_arity(spark):
    df = spark.range(10).select(F.col("id").cast("double").alias("a"))
    with pytest.raises(ValueError, match="1-4 columns"):
        zorder_expr(df, [])
