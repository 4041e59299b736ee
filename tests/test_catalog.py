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
