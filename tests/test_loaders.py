"""Loader matrix (S1-S11): text/md, csv row-per-document, jsonl, html
(regex fallback), extension dispatch incl. the reference's ValueError on
unknown extensions (embedding.py:137-150)."""

import os
import pytest

from oaim_sandbox_spark.sources.loaders import (
    load_csv,
    load_documents,
    load_json,
    load_text,
)


@pytest.fixture()
def docs_dir(tmp_path):
    (tmp_path / "a.md").write_text("# Title\n\nhello markdown world")
    (tmp_path / "b.txt").write_text("plain text content")
    (tmp_path / "c.csv").write_text("name,age\nalice,30\nbob,25\n")
    (tmp_path / "d.jsonl").write_text('{"text": "json row one"}\n{"text": "json row two"}\n')
    (tmp_path / "e.html").write_text("<html><body><h1>Head</h1><p>para text</p></body></html>")
    return tmp_path


def test_load_text(spark, docs_dir):
    out = {r.filename: r for r in load_text(spark, str(docs_dir / "*.md")).collect()}
    assert "a.md" in out
    assert "hello markdown world" in out["a.md"].text
    assert out["a.md"].ext == "md"


def test_load_csv_row_per_document(spark, docs_dir):
    rows = sorted(load_csv(spark, str(docs_dir / "c.csv")).collect(), key=lambda r: r.page)
    assert len(rows) == 2
    assert rows[0].text == "name: alice\nage: 30"
    assert rows[0].doc_id == "c.csv_row1"


def test_load_jsonl(spark, docs_dir):
    rows = load_json(spark, str(docs_dir / "d.jsonl")).collect()
    assert sorted(r.text for r in rows) == ["json row one", "json row two"]


def test_load_html_fallback(spark, docs_dir):
    rows = load_documents(spark, str(docs_dir / "e.html")).collect()
    assert len(rows) == 1
    assert "Head" in rows[0].text and "para text" in rows[0].text
    assert "<h1>" not in rows[0].text


def test_dispatch_unknown_ext(spark):
    with pytest.raises(ValueError, match="unsupported file extension"):
        load_documents(spark, "/tmp/whatever.xyz")


def test_dispatch_by_ext(spark, docs_dir):
    assert load_documents(spark, str(docs_dir / "b.txt")).count() == 1
    assert load_documents(spark, str(docs_dir / "c.csv")).count() == 2


def test_loader_feeds_split_pipeline(spark, docs_dir):
    """Loaders compose with the ingest operators without reshaping."""
    from oaim_sandbox_spark.operators.split import split_fixed

    docs = load_text(spark, str(docs_dir / "*.txt"))
    chunks = split_fixed(docs, text_col="text", id_col="doc_id", chunk_size=10, chunk_overlap=2)
    assert chunks.count() >= 2


# --- S7 / S8 / K6 ----------------------------------------------------------


def test_stage_local_files(tmp_path):
    from oaim_sandbox_spark.sources.loaders import stage_local_files

    staged = stage_local_files(
        [("a.txt", b"hello"), ("../evil.txt", b"x")], str(tmp_path / "stage")
    )
    assert (tmp_path / "stage" / "a.txt").read_bytes() == b"hello"
    # traversal normalized to basename, not written outside the staging dir
    assert (tmp_path / "stage" / "evil.txt").exists()
    assert not (tmp_path / "evil.txt").exists()
    assert len(staged) == 2


def test_local_object_store_roundtrip(tmp_path):
    from oaim_sandbox_spark.sources.loaders import LocalObjectStore

    (tmp_path / "bkt" / "sub").mkdir(parents=True)
    (tmp_path / "bkt" / "sub" / "doc.md").write_bytes(b"# hi\n" * 500_000)  # >1 chunk
    (tmp_path / "bkt" / "top.txt").write_bytes(b"t")
    store = LocalObjectStore(str(tmp_path))
    assert store.list_buckets() == ["bkt"]
    assert store.list_objects("bkt") == ["sub/doc.md", "top.txt"]
    dest = store.get_object(str(tmp_path / "stage"), "sub/doc.md", "bkt")
    assert open(dest, "rb").read() == b"# hi\n" * 500_000


def test_chunks_to_json_roundtrip(spark, tmp_path):
    from oaim_sandbox_spark.sources.loaders import chunks_to_json

    df = spark.createDataFrame(
        [("d1", "alpha", 0), ("d2", "beta", 10)], "id STRING, text STRING, start_index INT"
    )
    out = str(tmp_path / "chunks_json")
    chunks_to_json(df, out)
    back = spark.read.json(out)
    assert {tuple(sorted(r.asDict().items())) for r in back.collect()} == {
        tuple(sorted(r.asDict().items())) for r in df.collect()
    }


def test_object_store_datasource(spark, tmp_path):
    """Spark 4 Python DataSource over the object store: one partition per
    object, executor-side chunked reads, standard DataFrame ops downstream."""
    from oaim_sandbox_spark.sources.object_store_ds import ObjectStoreDataSource

    root = tmp_path / "store"
    (root / "docs").mkdir(parents=True)
    (root / "docs" / "a.txt").write_bytes(b"alpha " * 1000)
    (root / "docs" / "sub").mkdir()
    (root / "docs" / "sub" / "b.txt").write_bytes(b"beta")
    (root / "other").mkdir()
    (root / "other" / "c.bin").write_bytes(b"\x00\x01")

    spark.dataSource.register(ObjectStoreDataSource)
    df = spark.read.format("object_store").option("root", str(root)).option("bucket", "docs").load()
    rows = {r.object_name: r for r in df.collect()}
    assert set(rows) == {"a.txt", os.path.join("sub", "b.txt")}
    assert rows["a.txt"].length == 6000 and rows["a.txt"].content[:6] == b"alpha "
    # one task per object: the scan parallelizes across objects
    assert df.rdd.getNumPartitions() == 2
    # no bucket option -> whole store
    all_df = spark.read.format("object_store").option("root", str(root)).load()
    assert all_df.count() == 3
    assert {r.bucket for r in all_df.select("bucket").collect()} == {"docs", "other"}


def test_training_shard_export_roundtrip(spark, tmp_path):
    """Sharded JSONL export: shard count = ceil(n/target), shards are
    size-balanced (round-robin repartition), and the JSONL round-trips
    losslessly through spark.read.json."""
    from pyspark.sql import functions as F

    from oaim_sandbox_spark.sources.export import (
        read_training_shards,
        write_training_shards,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    path = str(tmp_path / "shards")
    n_shards = write_training_shards(
        docs.select("doc_id", "text", "lang"), path, target_rows_per_shard=100,
        order_col="doc_id",
    )
    assert n_shards == -(-n // 100)

    back = read_training_shards(spark, path)
    assert back.count() == n
    assert back.agg(F.sum("doc_id")).collect()[0][0] == docs.agg(F.sum("doc_id")).collect()[0][0]

    import glob
    files = glob.glob(f"{path}/part-*")
    assert len(files) == n_shards
    sizes = sorted(__import__("os").path.getsize(f) for f in files)
    assert sizes[0] > 0.5 * sizes[-1]  # round-robin balance


def test_html_stdlib_parser_entities_and_script_drop(spark, tmp_path):
    """The no-bs4 fallback is a real HTML tokenizer: entities decode,
    script/style subtrees vanish, attribute '>' doesn't break tag parsing."""
    (tmp_path / "f.html").write_text(
        "<html><head><style>p {color: red}</style>"
        "<script>if (1 > 0) { alert('<p>not text</p>'); }</script></head>"
        "<body><p title='a > b'>Caf&eacute; &amp; friends</p>"
        "<ul><li>one</li><li>two</li></ul></body></html>"
    )
    from oaim_sandbox_spark.sources.loaders import load_documents

    rows = load_documents(spark, str(tmp_path / "f.html")).collect()
    text = rows[0]["text"]
    assert "Café & friends" in text
    assert "alert" not in text and "color" not in text
    assert "one" in text and "two" in text
    # block boundaries became paragraph breaks for the splitter
    assert "\n\n" in text


def test_html_stdlib_parser_table_cells_not_merged(spark, tmp_path):
    """'<td>alpha</td><td>beta</td>' must extract as separate words — the
    parser emits a space at cell/inline boundaries (regression: the first
    html.parser version merged them into 'alphabeta')."""
    (tmp_path / "g.html").write_text(
        "<table><tr><td>alpha</td><td>beta</td></tr></table>"
        "<p>x<span>y</span>z words</p>"
    )
    from oaim_sandbox_spark.sources.loaders import load_documents

    rows = load_documents(spark, str(tmp_path / "g.html")).collect()
    text = rows[0]["text"]
    assert "alphabeta" not in text
    assert "alpha" in text.split() and "beta" in text.split()


def test_load_json_corrupt_modes(spark, tmp_path):
    from oaim_sandbox_spark.sources.loaders import load_json, load_json_quarantine

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"text": "good one"}\n'
        "{this is not json at all\n"
        '{"text": "good two"}\n'
    )
    path = str(p)
    assert load_json(spark, path, on_corrupt="drop").count() == 2
    docs, bad = load_json_quarantine(spark, path)
    assert docs.count() == 2
    assert {r["text"] for r in docs.collect()} == {"good one", "good two"}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "not json" in bad_rows[0]["corrupt_record"]

    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Py4JJavaError):
        load_json(spark, path, on_corrupt="fail").count()


def test_load_json_quarantine_fully_corrupt_file(spark, tmp_path):
    from oaim_sandbox_spark.sources.loaders import load_json_quarantine

    p = tmp_path / "allbad.jsonl"
    p.write_text("{nope\n[also nope\n")
    docs, bad = load_json_quarantine(spark, str(p))
    assert docs.count() == 0
    assert bad.count() == 2


def test_load_csv_corrupt_modes(spark, tmp_path):
    from oaim_sandbox_spark.sources.loaders import load_csv

    p = tmp_path / "mixed.csv"
    # second data row has an unclosed quote -> malformed under the parser
    p.write_text('a,b\n1,"ok"\n2,"broken\n3,"fine"\n')
    path = str(p)
    n_perm = load_csv(spark, path, on_corrupt="permissive").count()
    n_drop = load_csv(spark, path, on_corrupt="drop").count()
    assert n_drop <= n_perm and n_drop >= 1


def test_training_shard_export_columnar_formats(spark, tmp_path):
    """Parquet/ORC shard export round-trips losslessly with schema intact —
    the columnar sink for corpora that get re-curated (column-pruned,
    predicate-pushdown re-reads)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from oaim_sandbox_spark.sources.export import (
        read_training_shards,
        write_training_shards,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "lang", "n_chars"
    )
    n = docs.count()
    for fmt in ("parquet", "orc"):
        path = str(tmp_path / f"shards_{fmt}")
        n_shards = write_training_shards(
            docs, path, target_rows_per_shard=200, order_col="doc_id", fmt=fmt
        )
        back = read_training_shards(spark, path, fmt=fmt)
        assert back.count() == n
        assert dict(back.dtypes) == dict(docs.dtypes)  # schema preserved (JSON wouldn't)
        assert (
            back.agg(F.sum("n_chars")).collect()[0][0]
            == docs.agg(F.sum("n_chars")).collect()[0][0]
        )
        assert n_shards == -(-n // 200)

    with _pytest.raises(ValueError):
        write_training_shards(docs, str(tmp_path / "x"), fmt="avro")


def test_object_store_streaming_datasource(spark, tmp_path):
    """Streaming read of the object store (Spark 4 Python streaming
    DataSource): each micro-batch picks up exactly the newly-arrived
    objects; offsets are replayable listing indexes."""
    import time

    from oaim_sandbox_spark.sources.object_store_ds import ObjectStoreDataSource

    root = tmp_path / "store"
    (root / "in").mkdir(parents=True)
    (root / "in" / "one.txt").write_bytes(b"first")
    time.sleep(0.05)
    (root / "in" / "two.txt").write_bytes(b"second")

    spark.dataSource.register(ObjectStoreDataSource)
    stream = (
        spark.readStream.format("object_store")
        .option("root", str(root)).option("bucket", "in").load()
    )
    q = (
        stream.writeStream.format("memory").queryName("objstream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.object_name for r in spark.sql("SELECT * FROM objstream").collect()}
        assert got == {"one.txt", "two.txt"}

        time.sleep(0.05)
        (root / "in" / "three.txt").write_bytes(b"third late arrival")
        q.processAllAvailable()
        rows = {r.object_name: r for r in spark.sql("SELECT * FROM objstream").collect()}
        assert set(rows) == {"one.txt", "two.txt", "three.txt"}
        assert rows["three.txt"].content == b"third late arrival"
        # no duplicates across batches
        assert spark.sql("SELECT count(*) FROM objstream").collect()[0][0] == 3
    finally:
        q.stop()


def test_html_visible_text_fidelity():
    """Stdlib HTML path: skip-subtree tags drop entirely (including
    noscript/svg/iframe), <br> is a line break not a paragraph break, table
    cells separate with spaces, entities decode, and a declared non-UTF-8
    charset is honored."""
    from oaim_sandbox_spark.sources.loaders import _parse_html_bytes

    html = b"""<html><head>
    <meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">
    <script>var hidden = 'NOPE';</script><style>.x{color:red}</style>
    </head><body>
    <noscript>NOPE enable js</noscript>
    <svg><text>NOPE svg</text></svg>
    <h1>Caf\xe9 guide</h1>
    <p>Line one<br>line two &amp; more</p>
    <table><tr><td>alpha</td><td>beta</td></tr></table>
    </body></html>"""
    text = _parse_html_bytes(html)
    assert "NOPE" not in text
    assert "Café guide" in text          # iso-8859-1 \xe9 honored
    assert "Line one\nline two & more" in text  # br = single newline, entity decoded
    assert "alpha beta" in text
    assert "Café guide\n\nLine one" in text  # block boundary = paragraph break


def test_html_bad_declared_charset_falls_back():
    from oaim_sandbox_spark.sources.loaders import _parse_html_bytes

    html = b'<meta charset="no-such-enc"><p>ok text</p>'
    assert "ok text" in _parse_html_bytes(html)


def test_stage_local_files_rejects_dot_names_before_writing(tmp_path):
    """'.' and '..' pass a bare `not basename` guard and then explode as
    IsADirectoryError deep in open(); they must be rejected up front as
    ValueError (the wire route's 400), and validation must happen BEFORE
    any file is written so a bad name mid-batch leaves no partial staging."""
    import pytest

    from oaim_sandbox_spark.sources.loaders import stage_local_files

    stage = tmp_path / "stage"
    for bad in ("..", ".", "", "dir/.."):
        with pytest.raises(ValueError):
            stage_local_files([("ok.txt", b"first"), (bad, b"x")], str(stage))
        # atomicity: the valid first file must NOT have been staged
        assert not (stage / "ok.txt").exists(), bad


def test_stage_web_files_dedupes_colliding_url_tails(tmp_path, monkeypatch):
    """Distinct URLs sharing a tail segment (or ending in '/') must not
    silently overwrite each other inside one request; '..' tails must not
    escape the staging dir."""
    import sys
    import types

    payloads = {
        "http://a.example/page": b"A",
        "http://b.example/page": b"B",
        "http://c.example/": b"C",
        "http://d.example/..": b"D",
    }

    class _Resp:
        def __init__(self, body):
            self.content = body
            self.headers = {"content-type": "text/plain"}

        def raise_for_status(self):
            pass

    fake = types.SimpleNamespace(get=lambda url, timeout: _Resp(payloads[url]))
    monkeypatch.setitem(sys.modules, "requests", fake)
    from oaim_sandbox_spark.sources.loaders import stage_web_files

    staged = stage_web_files(list(payloads), str(tmp_path / "stage"))
    assert len(staged) == len(set(staged)) == 4
    bodies = sorted(open(p, "rb").read() for p in staged)
    assert bodies == [b"A", b"B", b"C", b"D"]
    for p in staged:  # everything landed inside the staging dir
        assert os.path.dirname(p) == str(tmp_path / "stage")


def test_is_url_accessible_status_contract(monkeypatch):
    """Reference functions.py:21-45 parity: 200/403/404/421 count as
    accessible (alive-but-guarded endpoints), other statuses and transport
    errors do not; empty URL short-circuits."""
    import sys
    import types

    class _R:
        def __init__(self, code):
            self.status_code = code

    class _ReqErr(Exception):
        pass

    calls = {}

    def fake_get(url, timeout):
        calls["timeout"] = timeout
        code = int(url.rsplit("/", 1)[-1])
        if code == 0:
            raise fake.exceptions.ConnectionError("boom")
        return _R(code)

    fake = types.SimpleNamespace(
        get=fake_get,
        exceptions=types.SimpleNamespace(
            RequestException=_ReqErr,
            ConnectionError=type("ConnectionError", (_ReqErr,), {}),
        ),
    )
    monkeypatch.setitem(sys.modules, "requests", fake)
    from oaim_sandbox_spark.sources.loaders import is_url_accessible

    assert is_url_accessible("") == (False, "No URL Provided")
    for code in (200, 403, 404, 421):
        assert is_url_accessible(f"http://x.test/{code}") == (True, None)
    ok, msg = is_url_accessible("http://x.test/500")
    assert not ok and "Status: 500" in msg
    ok, msg = is_url_accessible("http://x.test/0")
    assert not ok and "ConnectionError" in msg
    assert calls["timeout"] == 2
