"""Document loaders (SURVEY.md §2.1 S1-S11) — file -> Document rows
(doc_id, text, source, filename, ext).

The reference dispatches on extension (embedding.py:137-150,179-192):
pdf -> PyPDFLoader, html -> UnstructuredHTMLLoader, md/txt -> TextLoader,
csv -> CSVLoader (row per document). Spark-first equivalents:

  - text/md:  spark.read.text(wholetext=True) — one row per file, no Python
  - csv:      spark.read.csv + row->text projection (one Document per row,
              matching CSVLoader's "key: value" line format)
  - json(l):  spark.read.json (S9/S11 re-hydration)
  - pdf/html: spark.read.format("binaryFile") + mapInPandas parse. pypdf /
              beautifulsoup aren't in this container, so the parse step is a
              GATED STUB: real scan + schema + batching, parser raises
              NotImplementedError unless the lib is importable.
  - web:      driver-side staging download (S5/S6) — the reference stages to
              a temp dir too (endpoints.py:199-228); at scale parallelize
              fetches with sc.parallelize(urls).

All loaders emit DOCUMENT_ROW_SCHEMA so every downstream operator (split,
dedup, embed, merge) composes without reshaping.
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

DOCUMENT_ROW_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("text", StringType(), True),
        StructField("source", StringType(), True),
        StructField("filename", StringType(), True),
        StructField("ext", StringType(), True),
        StructField("page", IntegerType(), True),  # pdf page / csv row ordinal
    ]
)

SUPPORTED_EXTS = ("pdf", "html", "md", "txt", "csv")


def _with_doc_columns(df: DataFrame, path_col: str = "path") -> DataFrame:
    fname = F.element_at(F.split(F.col(path_col), "/"), -1)
    return (
        df.withColumn("source", F.col(path_col))
        .withColumn("filename", fname)
        .withColumn("ext", F.lower(F.element_at(F.split(fname, "\\."), -1)))
    )


def load_text(spark: SparkSession, path: str) -> DataFrame:
    """S3: one Document per text/markdown file (TextLoader parity)."""
    df = spark.read.text(path, wholetext=True).withColumn(
        "path", F.input_file_name()
    )
    df = _with_doc_columns(df)
    return df.select(
        F.col("filename").alias("doc_id"),
        F.col("value").alias("text"),
        "source",
        "filename",
        "ext",
        F.lit(None).cast("int").alias("page"),
    )


def load_csv(spark: SparkSession, path: str, on_corrupt: str = "permissive") -> DataFrame:
    """S4: one Document per CSV row, "col: value" lines (CSVLoader parity).

    Scale note: the row->text projection is concat_ws over columns — pure
    JVM, pushes the header schema once; no Python. ``on_corrupt`` mirrors
    load_json: 'permissive' | 'drop' (DROPMALFORMED) | 'fail' (FAILFAST).
    """
    modes = {"permissive": "PERMISSIVE", "drop": "DROPMALFORMED", "fail": "FAILFAST"}
    df = (
        spark.read.option("mode", modes[on_corrupt])
        .csv(path, header=True)
        .withColumn("path", F.input_file_name())
    )
    cols = [c for c in df.columns if c != "path"]
    line_exprs = [F.concat(F.lit(f"{c}: "), F.coalesce(F.col(c).cast("string"), F.lit(""))) for c in cols]
    df = _with_doc_columns(df)
    w_order = F.monotonically_increasing_id()
    df = df.withColumn("_rid", w_order)
    from pyspark.sql.window import Window

    rn = F.row_number().over(Window.partitionBy("source").orderBy("_rid"))
    return df.withColumn("page", rn).select(
        F.concat(F.col("filename"), F.lit("_row"), F.col("page").cast("string")).alias("doc_id"),
        F.concat_ws("\n", *line_exprs).alias("text"),
        "source",
        "filename",
        "ext",
        "page",
    )


def load_json(
    spark: SparkSession, path: str, text_field: str = "text", on_corrupt: str = "permissive"
) -> DataFrame:
    """S9/S11: JSON / JSONL re-hydration (jsonl is Spark's native json).

    ``on_corrupt`` controls malformed-line policy — at crawl scale a batch
    ALWAYS has some: 'permissive' (Spark default: null-field rows),
    'drop' (DROPMALFORMED), 'fail' (FAILFAST — fail the job loudly).
    Use `load_json_quarantine` to capture the raw bad lines instead."""
    modes = {"permissive": "PERMISSIVE", "drop": "DROPMALFORMED", "fail": "FAILFAST"}
    df = (
        spark.read.option("mode", modes[on_corrupt])
        .json(path)
        .withColumn("path", F.input_file_name())
    )
    df = _with_doc_columns(df)
    from pyspark.sql.window import Window

    rn = F.row_number().over(Window.partitionBy("source").orderBy(F.monotonically_increasing_id()))
    return df.withColumn("page", rn).select(
        F.concat(F.col("filename"), F.lit("_"), F.col("page").cast("string")).alias("doc_id"),
        F.col(text_field).cast("string").alias("text"),
        "source",
        "filename",
        "ext",
        "page",
    )


def load_json_quarantine(
    spark: SparkSession, path: str, text_field: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """JSON/JSONL load with corrupt-line quarantine: returns
    ``(docs, quarantine)`` — good rows through the normal `load_json`
    projection, malformed raw lines as (corrupt_record, path) for a
    quarantine sink. Neither failing the batch nor silently dropping loses
    the data; this is the 100 TB crawl-ingest pattern.

    Mechanics: infer the schema from the well-formed lines, then read the
    file as TEXT and `from_json` each line with a `_corrupt_record` field IN
    the struct schema — from_json fills it with the raw line on malformed
    input, and because the corrupt column lives in a parsed struct (not a
    raw file scan) Spark's corrupt-record-column query restriction
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) does not apply
    and nothing needs to be cached. Degenerate batches are first-class: a
    fully-corrupt file (no inferable fields) or one whose good rows lack
    `text_field` returns (empty/null-text docs, full quarantine) rather
    than raising."""
    from pyspark.sql.types import StringType, StructField, StructType

    inferred = spark.read.option("mode", "DROPMALFORMED").json(path).schema
    schema = StructType(
        [f for f in inferred.fields if f.name != "_corrupt_record"]
        + [StructField("_corrupt_record", StringType(), True)]
    )
    raw = (
        spark.read.text(path)
        .withColumn("path", F.input_file_name())
        .filter(F.trim(F.col("value")) != "")  # json source skips blank lines
        .withColumn(
            "j",
            F.from_json(
                F.col("value"), schema,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
            ),
        )
    )
    bad = raw.filter(F.col("j._corrupt_record").isNotNull()).select(
        F.col("value").alias("corrupt_record"), "path"
    )
    good = (
        raw.filter(F.col("j._corrupt_record").isNull())
        .select("j.*", "path")
        .drop("_corrupt_record")
    )
    if text_field not in good.columns:
        good = good.withColumn(text_field, F.lit(None).cast("string"))
    good = _with_doc_columns(good)
    from pyspark.sql.window import Window

    rn = F.row_number().over(Window.partitionBy("source").orderBy(F.monotonically_increasing_id()))
    docs = good.withColumn("page", rn).select(
        F.concat(F.col("filename"), F.lit("_"), F.col("page").cast("string")).alias("doc_id"),
        F.col(text_field).cast("string").alias("text"),
        "source",
        "filename",
        "ext",
        "page",
    )
    return docs, bad


def _parse_pdf_bytes(content: bytes) -> list[str]:
    """One text string per page (reference embedding.py:107-116 PyPDFLoader
    shape). pypdf when installed (full fidelity: CMaps, all filters,
    encryption); otherwise the vendored pure-Python extractor in
    sources/minipdf.py (unencrypted + Flate/plain streams — the common
    machine-generated class), so PDF bytes parse for real in containers
    without pypdf."""
    try:
        import io

        from pypdf import PdfReader  # type: ignore
    except ImportError:  # pragma: no cover - env-dependent
        from oaim_sandbox_spark.sources import minipdf

        return minipdf.extract_pages(content)
    reader = PdfReader(io.BytesIO(content))
    return [page.extract_text() or "" for page in reader.pages]


_HTML_BLOCK_TAGS = frozenset(
    "p div li ul ol h1 h2 h3 h4 h5 h6 tr table section article header footer "
    "blockquote pre hr".split()
)
# subtrees that never contribute visible text
_HTML_SKIP_TAGS = frozenset("script style template noscript svg iframe object".split())
# cell-level tags get a SPACE, not a paragraph break: '<td>alpha</td><td>beta'
# must come out 'alpha beta' (not merged, and not split across chunks)
_HTML_CELL_TAGS = frozenset("td th dt dd span a em strong b i u code".split())


class _VisibleTextParser(HTMLParser):
    """Stdlib html.parser extraction: visible text with paragraph breaks at
    block-element boundaries (so the downstream char splitter prefers section
    edges) and script/style/template subtrees dropped. Entity refs decode via
    convert_charrefs (the parser default)."""

    def __init__(self) -> None:
        super().__init__()
        self._chunks: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _HTML_SKIP_TAGS:
            self._skip += 1
        elif tag == "br":
            self._chunks.append("\n")  # line break, not a paragraph break
        elif tag in _HTML_BLOCK_TAGS:
            self._chunks.append("\n\n")
        elif tag in _HTML_CELL_TAGS:
            self._chunks.append(" ")

    def handle_endtag(self, tag: str) -> None:
        if tag in _HTML_SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag in _HTML_BLOCK_TAGS:
            self._chunks.append("\n\n")
        elif tag in _HTML_CELL_TAGS:
            self._chunks.append(" ")

    def handle_data(self, data: str) -> None:
        if not self._skip and data:
            self._chunks.append(data)

    def text(self) -> str:
        out = "".join(self._chunks)
        out = re.sub(r"[ \t]+", " ", out)
        return re.sub(r"\s*\n\s*\n\s*", "\n\n", out).strip()


def _parse_html_bytes(content: bytes) -> str:
    """Visible text of an HTML document. BeautifulSoup when installed (full
    fidelity on malformed soup; the reference uses UnstructuredHTMLLoader,
    embedding.py:183), else a real stdlib html.parser pass — an actual HTML
    tokenizer (entities, CDATA, comments, attribute '>' edge cases), not the
    tag-stripping regex this fallback used to be."""
    try:
        from bs4 import BeautifulSoup  # type: ignore

        return BeautifulSoup(content, "html.parser").get_text(separator="\n")
    except ImportError:
        # declared-charset detection (meta charset= / http-equiv content=),
        # scanned in the head bytes like browsers do; utf-8 otherwise
        enc = "utf-8"
        m = re.search(
            rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_.:-]+)""",
            content[:4096],
            re.IGNORECASE,
        )
        if m:
            import codecs

            try:
                enc = m.group(1).decode("ascii")
                codecs.lookup(enc)  # b"".decode() skips the lookup entirely
            except (LookupError, UnicodeDecodeError):
                enc = "utf-8"
        parser = _VisibleTextParser()
        parser.feed(content.decode(enc, errors="replace"))
        parser.close()
        return parser.text()


def load_binary_documents(spark: SparkSession, path: str, kind: str) -> DataFrame:
    """S1/S2: PDF (one Document per page) / HTML via binaryFile + mapInPandas.

    Scale note: binaryFile scan distributes files across executors; the parse
    is per-file Python (Arrow-batched). Oversized files are capped by
    spark.sql.files.maxPartitionBytes like any other source.
    """
    if kind not in ("pdf", "html"):
        raise ValueError("kind must be 'pdf' or 'html'")
    binf = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                fname = r["path"].rsplit("/", 1)[-1]
                ext = fname.rsplit(".", 1)[-1].lower()
                if kind == "pdf":
                    for i, text in enumerate(_parse_pdf_bytes(bytes(r["content"])), start=1):
                        rows.append(
                            {"doc_id": f"{fname}_p{i}", "text": text, "source": r["path"],
                             "filename": fname, "ext": ext, "page": i}
                        )
                else:
                    rows.append(
                        {"doc_id": fname, "text": _parse_html_bytes(bytes(r["content"])),
                         "source": r["path"], "filename": fname, "ext": ext, "page": None}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in DOCUMENT_ROW_SCHEMA.fields])

    return binf.mapInPandas(parse, DOCUMENT_ROW_SCHEMA)


def load_documents(spark: SparkSession, path: str, ext: str | None = None) -> DataFrame:
    """P4 extension dispatch (reference embedding.py:137-150): route a path
    to the right loader; unknown extensions raise ValueError like the
    reference."""
    ext = ext or path.rsplit(".", 1)[-1].lower()
    if ext in ("txt", "md"):
        return load_text(spark, path)
    if ext == "csv":
        return load_csv(spark, path)
    if ext in ("json", "jsonl"):
        return load_json(spark, path)
    if ext == "pdf":
        return load_binary_documents(spark, path, "pdf")
    if ext in ("html", "htm"):
        return load_binary_documents(spark, path, "html")
    raise ValueError(f"unsupported file extension: {ext}")


def is_url_accessible(url: str, timeout: int = 2) -> tuple[bool, str | None]:
    """Reference common/functions.py:21-45 parity: preflight a URL before
    staging/model registration. Accessible = reachable with status in
    {200, 403, 404, 421} (the reference treats auth/notfound endpoints as
    'alive'); anything else or a transport error returns (False, reason)."""
    if not url:
        return False, "No URL Provided"
    import requests

    try:
        response = requests.get(url, timeout=timeout)
    except requests.exceptions.RequestException as ex:
        return False, f"{url} is not accessible. ({type(ex).__name__})"
    if response.status_code in {200, 403, 404, 421}:
        return True, None
    return False, f"{url} is not accessible. (Status: {response.status_code})"


def _dedupe_basename(base: str, used: set[str]) -> str:
    """Counter-suffix a basename that collides with one already staged in
    this batch ('data.txt' -> 'data_1.txt'); both staging routes share this
    so the collision rule can't diverge between them."""
    if base not in used:
        return base
    stem, dot, ext = base.partition(".")
    k = 1
    while f"{stem}_{k}{dot}{ext}" in used:
        k += 1
    return f"{stem}_{k}{dot}{ext}"


def _safe_stage_basename(name: str) -> str:
    """Normalize a client-supplied or URL-derived filename to a safe basename.
    `os.path.basename` alone lets '.' and '..' through (both non-empty), and
    opening `directory/'..'` raises IsADirectoryError — an unhandled 500 on
    the wire routes instead of the contract's 400. Reject anything that does
    not resolve to a plain file name."""
    base = os.path.basename(name.replace("\\", "/"))
    if not base or base in (".", ".."):
        raise ValueError(f"invalid filename {name!r}")
    return base


def stage_web_files(urls: list[str], directory: str, timeout: int = 30) -> list[str]:
    """S5/S6: download URLs to a staging dir with content-type dispatch
    (reference endpoints.py:199-228 stores to a temp dir the same way).
    Unknown content types raise ValueError (reference returns 500).
    """
    import requests

    os.makedirs(directory, exist_ok=True)
    out = []
    used: set[str] = set()
    for url in urls:
        resp = requests.get(url, timeout=timeout)
        resp.raise_for_status()
        ctype = resp.headers.get("content-type", "").split(";")[0].strip().lower()
        name = url.rstrip("/").rsplit("/", 1)[-1] or "index"
        try:
            name = _safe_stage_basename(name)
        except ValueError:
            name = "index"
        if ctype == "application/pdf":
            if not name.endswith(".pdf"):
                name += ".pdf"
        elif ctype in ("text/html",):
            if not name.endswith((".html", ".htm")):
                name += ".html"
        elif ctype.startswith("text/"):
            if "." not in name:
                name += ".txt"
        else:
            raise ValueError(f"unsupported content type {ctype} for {url}")
        # distinct URLs can share a tail segment ('a/page', 'b/page') —
        # suffix a counter so one request never silently overwrites itself
        name = _dedupe_basename(name, used)
        used.add(name)
        dest = os.path.join(directory, name)
        with open(dest, "wb") as fh:
            fh.write(resp.content)
        out.append(dest)
    return out


def stage_local_files(files: list[tuple[str, bytes]], directory: str) -> list[str]:
    """S7 (endpoints.py:230-245): store uploaded (filename, payload) pairs
    into a per-client staging dir — the landing zone every loader reads from.
    Rejects path traversal in filenames (the reference trusts FastAPI's
    UploadFile.filename; we normalize to basename). All filenames are
    validated BEFORE any write so a bad name mid-batch can't leave a
    partially-staged directory behind. Distinct uploads whose paths share
    a basename ('a/data.txt', 'b/data.txt') get a counter suffix instead
    of silently clobbering each other — same rule as stage_web_files."""
    os.makedirs(directory, exist_ok=True)
    staged = []
    used: set[str] = set()
    for name, payload in files:
        base = _dedupe_basename(_safe_stage_basename(name), used)
        used.add(base)
        staged.append((base, payload))
    out = []
    for base, payload in staged:
        dest = os.path.join(directory, base)
        with open(dest, "wb") as fh:
            fh.write(payload)
        out.append(dest)
    return out


class LocalObjectStore:
    """S8 (server/utils/oci.py:101-188): object-storage list/download against
    a directory-backed fake with the reference's surface — list compartments
    (top-level dirs), list buckets, list objects, chunked get_object into a
    staging dir. The real OCI SDK isn't in this container; production Spark
    reads `oci://bucket@namespace/` directly through the Hadoop-OCI
    connector, so this staging path (like the reference's) is only for
    driver-side pre-processing of a handful of files.
    """

    CHUNK = 1024 * 1024  # reference streams 1 MiB chunks (oci.py:168-175)

    def __init__(self, root: str):
        self.root = root

    def list_buckets(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root) if os.path.isdir(os.path.join(self.root, d))
        )

    def list_objects(self, bucket: str) -> list[str]:
        bdir = os.path.join(self.root, bucket)
        out = []
        for dirpath, _dirs, names in os.walk(bdir):
            for n in names:
                out.append(os.path.relpath(os.path.join(dirpath, n), bdir))
        return sorted(out)

    def get_object(self, directory: str, object_name: str, bucket: str) -> str:
        """Chunked download into `directory`; returns the staged path."""
        src = os.path.join(self.root, bucket, object_name)
        os.makedirs(directory, exist_ok=True)
        dest = os.path.join(directory, os.path.basename(object_name))
        with open(src, "rb") as r, open(dest, "wb") as w:
            while True:
                chunk = r.read(self.CHUNK)
                if not chunk:
                    break
                w.write(chunk)
        return dest


def chunks_to_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K6 (embedding.py:61-75 doc_to_json): chunk rows -> JSON files, the
    debug/replay sink whose output S9 (load_json) re-hydrates losslessly."""
    df.write.mode(mode).json(path)
