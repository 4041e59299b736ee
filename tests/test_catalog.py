"""Vector-store naming + catalog parity (reference common/functions.py:47-75,
embedding.py:43-58,370-373)."""

import json

from oaim_sandbox_spark.catalog import VectorStorage, VectorStoreCatalog, filter_catalog, get_vs_table


def test_get_vs_table_naming():
    name, comment = get_vs_table("text-embed-3", 200, 20, "COSINE", "HNSW", alias="test1")
    # upper-cased, non-word chars -> _
    assert name == "TEST1_TEXT_EMBED_3_200_20_COSINE_HNSW"
    meta = json.loads(comment)
    assert meta["model"] == "text-embed-3"
    assert meta["chunk_size"] == 200
    assert meta["chunk_overlap"] == 20
    assert meta["distance_metric"] == "COSINE"
    assert meta["index_type"] == "HNSW"
    assert meta["alias"] == "test1"


def test_get_vs_table_ceils_overlap_and_no_alias():
    name, comment = get_vs_table("m", 100, 12.3, "DOT_PRODUCT", "IVF")
    assert name == "M_100_13_DOT_PRODUCT_IVF"  # ceil(12.3) = 13
    assert json.loads(comment)["chunk_overlap"] == 13
    assert json.loads(comment)["alias"] is None


def test_catalog_roundtrip(spark, tmp_path):
    cat = VectorStoreCatalog(spark, root=str(tmp_path))
    df = spark.createDataFrame(
        [("a", "hello", {"k": "v"}, [0.1, 0.2])],
        "id STRING, text STRING, metadata MAP<STRING,STRING>, embedding ARRAY<FLOAT>",
    )
    vs = VectorStorage(alias="t1", model="mock", chunk_size=100, chunk_overlap=20)
    name = cat.write_store(df, vs)
    stores = cat.list_stores()
    assert [s.vector_store for s in stores] == [name]
    assert cat.read_store(name).count() == 1
    # faceted filter (P12)
    assert filter_catalog(stores, alias="t1", chunk_size=100) == stores
    assert filter_catalog(stores, alias="nope") == []
    cat.drop_store(name)
    assert cat.list_stores() == []


def test_compact_store_shrinks_files_keeps_data(spark, tmp_path):
    from oaim_sandbox_spark.catalog import VectorStorage, VectorStoreCatalog

    cat = VectorStoreCatalog(spark, root=str(tmp_path))
    vs = VectorStorage(vector_store="", alias="cmp", model="mock.model",
                       chunk_size=200, chunk_overlap=20,
                       distance_metric="COSINE", index_type="HNSW")
    df = spark.createDataFrame([(str(i), f"t{i}") for i in range(200)], "id STRING, text STRING")
    name = cat.write_store(df.repartition(32), vs)  # 32 tiny files
    import glob, os
    before = len(glob.glob(os.path.join(str(tmp_path), name, "*.parquet")))
    assert before >= 16
    n = cat.compact_store(name)
    after = len(glob.glob(os.path.join(str(tmp_path), name, "*.parquet")))
    assert after < before and after <= max(n, 1)
    back = cat.read_store(name)
    assert back.count() == 200
    assert {r["id"] for r in back.collect()} == {str(i) for i in range(200)}
    # catalog entry survives compaction
    assert any(s.alias == "cmp" for s in cat.list_stores())


def test_maintain_store_compact_zorder_reindex(spark, tmp_path):
    """The nightly maintenance pass: many tiny append files -> compacted,
    Z-ordered on request, IVF rebuilt beside the store; data and sidecar
    survive every rewrite."""
    import glob
    import os

    from pyspark.sql import functions as F

    from oaim_sandbox_spark.catalog import VectorStorage, VectorStoreCatalog
    from oaim_sandbox_spark.operators.ann import IVFIndex

    cat = VectorStoreCatalog(spark, str(tmp_path / "cat"))
    vs = VectorStorage(alias="maint", model="m", chunk_size=8, chunk_overlap=0)
    # simulate streaming appends: 6 tiny files
    for i in range(6):
        df = spark.createDataFrame(
            [(f"d{i}_{j}", i * 100 + j, [float(i + 1), float(j + 1)]) for j in range(20)],
            "id STRING, seq BIGINT, embedding ARRAY<FLOAT>",
        ).coalesce(1)
        cat.write_store(df, vs, mode="append")
    name = cat.list_stores()[0].vector_store
    path = cat._store_path(name)
    assert len(glob.glob(os.path.join(path, "*.parquet"))) >= 6

    report = cat.maintain_store(name, zorder_cols=["seq"], rebuild_ivf=True, n_centroids=2)
    assert report["n_files"] >= 1
    assert report["zordered_on"] == ["seq"]
    after = cat.read_store(name)
    assert after.count() == 120
    assert after.agg(F.countDistinct("id")).collect()[0][0] == 120
    # rebuilt index loads and probes
    idx = IVFIndex.load(os.path.join(report["ivf_index"], "_ivf_index.json"))
    got = idx.search(spark, report["ivf_index"], [0.0, 1.0], k=3, nprobe=2, id_col="id")
    assert got.count() == 3

    # drop removes the derived index too — a recreated same-name store must
    # never see the stale index (ADVICE r3)
    cat.drop_store(name)
    assert not os.path.isdir(path)
    assert not os.path.isdir(report["ivf_index"])


def test_append_dim_mismatch_rejected(spark, tmp_path):
    """Appending embeddings of the wrong dimension fails AT WRITE TIME
    instead of corrupting every later distance scan."""
    import pytest as _pytest

    from oaim_sandbox_spark.catalog import VectorStorage, VectorStoreCatalog

    cat = VectorStoreCatalog(spark, str(tmp_path / "cat"))
    vs = VectorStorage(alias="dims", model="m", chunk_size=8, chunk_overlap=0)
    ok = spark.createDataFrame([("a", [1.0, 2.0])], "id STRING, embedding ARRAY<FLOAT>")
    cat.write_store(ok, vs)
    bad = spark.createDataFrame([("b", [1.0, 2.0, 3.0])], "id STRING, embedding ARRAY<FLOAT>")
    with _pytest.raises(ValueError, match="dim mismatch"):
        cat.write_store(bad, vs, mode="append")
    # matching dim still appends
    cat.write_store(
        spark.createDataFrame([("c", [3.0, 4.0])], "id STRING, embedding ARRAY<FLOAT>"),
        vs, mode="append",
    )
    name = cat.list_stores()[0].vector_store
    assert cat.read_store(name).count() == 2


def test_compact_preserves_hive_partitioning(spark, tmp_path):
    """Compacting a centroid-partitioned (IVF) store keeps the layout the
    index prunes against."""
    import os

    from oaim_sandbox_spark.catalog import SIDECAR, VectorStoreCatalog

    cat = VectorStoreCatalog(spark, str(tmp_path / "cat"))
    path = os.path.join(cat.root, "PARTED")
    df = spark.createDataFrame(
        [(i, i % 3, [float(i)]) for i in range(60)],
        "vec_id BIGINT, centroid INT, embedding ARRAY<FLOAT>",
    )
    df.write.partitionBy("centroid").mode("overwrite").parquet(path)
    with open(os.path.join(path, SIDECAR), "w") as fh:
        fh.write('{"alias": "parted"}')
    cat.compact_store("PARTED", target_file_mb=1)
    subdirs = {d for d in os.listdir(path) if d.startswith("centroid=")}
    assert subdirs == {"centroid=0", "centroid=1", "centroid=2"}
    back = cat.read_store("PARTED")
    assert back.count() == 60
    assert set(back.columns) == {"vec_id", "centroid", "embedding"}


def test_maintain_store_rejects_zorder_on_partitioned(spark, tmp_path):
    """Z-ordering a hive-partitioned (IVF) store would flatten the layout
    its index prunes against — maintain_store must refuse."""
    import os

    import pytest as _pytest

    from oaim_sandbox_spark.catalog import SIDECAR, VectorStoreCatalog

    cat = VectorStoreCatalog(spark, str(tmp_path / "cat"))
    path = os.path.join(cat.root, "PARTED2")
    spark.createDataFrame(
        [(i, i % 2, [float(i + 1)]) for i in range(10)],
        "vec_id BIGINT, centroid INT, embedding ARRAY<FLOAT>",
    ).write.partitionBy("centroid").mode("overwrite").parquet(path)
    with open(os.path.join(path, SIDECAR), "w") as fh:
        fh.write('{"alias": "parted2"}')
    with _pytest.raises(ValueError, match="hive-partitioned"):
        cat.maintain_store("PARTED2", zorder_cols=["vec_id"])
    # compaction alone still works and preserves the layout
    report = cat.maintain_store("PARTED2", target_file_mb=1)
    assert report["n_files"] >= 1
    assert {d for d in os.listdir(path) if d.startswith("centroid=")} == {"centroid=0", "centroid=1"}


def test_store_name_traversal_rejected(spark, tmp_path):
    """Store names become directory components and reach drop_store's
    rmtree — and they arrive raw off the wire (DELETE /v1/embed/{vs}).
    Traversal / separator / absolute names must be rejected before any
    filesystem operation; the catalog root's PARENT must survive."""
    import pytest

    from oaim_sandbox_spark.catalog import VectorStoreCatalog

    root = tmp_path / "wh" / "stores"
    root.mkdir(parents=True)
    (tmp_path / "wh" / "precious.txt").write_text("outside the root")
    cat = VectorStoreCatalog(spark, str(root))
    for bad in ("..", ".", "", "a/b", "a\\b", "../evil", "/abs/path"):
        with pytest.raises(KeyError):
            cat.drop_store(bad)
        with pytest.raises(KeyError):
            cat.read_store(bad)
    assert (tmp_path / "wh" / "precious.txt").exists()


def test_compact_store_crash_recovery_and_append_guard(spark, tmp_path):
    """_recover_swap restores a store stranded under __old by a crash
    between the two renames (and clears stale temp dirs that would
    otherwise fail every later swap); write_store's dim guard also fires
    for a sidecar-less store built by raw appends."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from oaim_sandbox_spark.catalog import VectorStorage, VectorStoreCatalog

    cat = VectorStoreCatalog(spark, str(tmp_path))
    vs = VectorStorage(alias="r", model="mock-embed", chunk_size=100, chunk_overlap=10)
    df = spark.range(20).select(
        F.col("id").cast("string").alias("id"),
        F.expr("array(1.0D, 2.0D, 3.0D)").alias("embedding"),
    )
    name = cat.write_store(df, vs)
    path = cat._store_path(name)

    # crash window: store renamed away, temp left behind
    os.rename(path, path + "__old")
    os.makedirs(path + "__compacting")
    n_files = cat.compact_store(name, target_file_mb=1)
    assert n_files >= 1
    assert cat.read_store(name).count() == 20
    assert not os.path.isdir(path + "__old")
    assert not os.path.isdir(path + "__compacting")

    # sidecar-less store (e.g. a streaming append created it): the dim
    # guard must still fire on a wrong-dim append
    os.remove(os.path.join(path, "_genai.json"))
    wrong = spark.range(3).select(
        F.col("id").cast("string").alias("id"),
        F.expr("array(1.0D, 2.0D)").alias("embedding"),
    )
    with pytest.raises(ValueError, match="dim mismatch"):
        cat.write_store(wrong, vs, mode="append")


def test_register_table_escapes_backslashes(spark, tmp_path):
    """A backslash in the catalog JSON must survive the SQL property round
    trip (Spark single-quoted literals eat backslash escapes), and a
    corrupt property on one table must not break the whole listing."""
    from oaim_sandbox_spark.catalog import VectorStoreCatalog

    spark.sql("DROP TABLE IF EXISTS esc_test")
    spark.sql("CREATE TABLE esc_test (id STRING) USING parquet")
    try:
        cat = VectorStoreCatalog(spark)
        comment = '{"alias": "a\\\\b", "model": "m", "chunk_size": 1, "chunk_overlap": 0, "distance_metric": "COSINE", "index_type": "HNSW"}'
        cat.register_table("esc_test", comment)
        found = [t for t in cat.list_tables() if t.vector_store == "esc_test"]
        assert found and found[0].alias == "a\\b"
        import pytest

        with pytest.raises(ValueError):
            cat.register_table("bad-name; DROP", comment)
    finally:
        spark.sql("DROP TABLE IF EXISTS esc_test")
