"""Custom Python DataSource (Spark 4 DataSource API) over the object store.

The reference stages OCI Object Storage files to a driver temp dir and
processes them in Python (server/utils/oci.py:101-188, endpoints.py:475-499)
— a driver-side bottleneck the moment the bucket outgrows a handful of
files. This connector makes the object store a FIRST-CLASS distributed scan:

  - planning: the driver lists the bucket (metadata only) and emits one
    InputPartition per object;
  - execution: each task streams ITS object in 1 MiB chunks on the executor
    — no driver staging, no full-file memory spike, bytes move straight from
    store to the task that parses them;
  - the result is rows of (bucket, object_name, length, content) that feed
    the standard split→dedup→embed pipeline.

At 100 TB the same shape holds: listing is O(objects) metadata on the
driver, payload bytes are only ever touched by executors, and Spark
schedules per-object tasks like any other scan (speculation, retries,
locality hooks included). Register once per session:

    spark.dataSource.register(ObjectStoreDataSource)
    df = (spark.read.format("object_store")
          .option("root", "/path/to/store").option("bucket", "docs").load())
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CHUNK = 1024 * 1024  # stream objects in 1 MiB chunks (reference oci.py:168-175)

SCHEMA = StructType(
    [
        StructField("bucket", StringType(), False),
        StructField("object_name", StringType(), False),
        StructField("length", LongType(), False),
        StructField("content", BinaryType(), True),
    ]
)


class _ObjectPartition(InputPartition):
    def __init__(self, bucket: str, object_name: str, path: str):
        self.bucket = bucket
        self.object_name = object_name
        self.path = path


class ObjectStoreReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options["root"]
        self.bucket = options.get("bucket")

    def partitions(self) -> list[_ObjectPartition]:
        """Driver-side planning: metadata listing only — one partition per
        object, no payload bytes read."""
        buckets = (
            [self.bucket]
            if self.bucket
            else sorted(
                d
                for d in os.listdir(self.root)
                if os.path.isdir(os.path.join(self.root, d))
            )
        )
        parts: list[_ObjectPartition] = []
        for b in buckets:
            bdir = os.path.join(self.root, b)
            for dirpath, _dirs, names in os.walk(bdir):
                for n in sorted(names):
                    full = os.path.join(dirpath, n)
                    parts.append(
                        _ObjectPartition(b, os.path.relpath(full, bdir), full)
                    )
        return parts

    def read(self, partition: _ObjectPartition) -> Iterator[tuple]:
        """Executor-side: stream THIS object in bounded chunks. An object
        deleted between planning and the read yields no row instead of
        failing the micro-batch — the deletion IS the state."""
        buf = bytearray()
        try:
            with open(partition.path, "rb") as r:
                while True:
                    chunk = r.read(CHUNK)
                    if not chunk:
                        break
                    buf.extend(chunk)
        except FileNotFoundError:
            return
        yield (partition.bucket, partition.object_name, len(buf), bytes(buf))


class ObjectStoreStreamReader(DataSourceStreamReader):
    """Micro-batch streaming over the same store: continuous object-arrival
    ingestion WITHOUT the file-source's directory-listing semantics (the
    reference has no streaming ingest at all — batch staging only).

    Offsets are CURSORS — the (mtime, bucket, name) key of the last included
    object — not positions: a positional index into a re-computed listing
    skips and duplicates objects when arrivals interleave with planning
    (new object sorting before the boundary, or landing between
    latestOffset() and partitions()). Key-bounded slicing is stable: an
    object is in exactly the batch whose (start, end] cursor interval
    contains its key. Arrivals whose key sorts BELOW the committed cursor
    (backdated mtimes) are skipped — the same contract as Spark's file
    source; use monotone upload times or widen with a reprocess job.
    Planning lists metadata on the driver; payload bytes still stream on
    executors, one task per new object. At real scale swap the listing for
    the store's change-notification feed and keep the cursor identical."""

    _ZERO = {"cursor": [0.0, "", ""]}

    def __init__(self, options: dict):
        self._batch = ObjectStoreReader(options)

    def _keyed_listing(self) -> list[tuple[tuple, _ObjectPartition]]:
        out = []
        for p in self._batch.partitions():
            try:
                mtime = os.path.getmtime(p.path)
            except OSError:
                # deleted between the walk and the stat: a concurrent
                # delete must not kill the streaming query on the driver
                continue
            out.append(((mtime, p.bucket, p.object_name), p))
        out.sort(key=lambda kp: kp[0])
        return out

    @staticmethod
    def _key_of(offset: dict) -> tuple:
        c = offset["cursor"]
        return (float(c[0]), str(c[1]), str(c[2]))

    def initialOffset(self) -> dict:
        return dict(self._ZERO)

    def latestOffset(self) -> dict:
        listing = self._keyed_listing()
        if not listing:
            return dict(self._ZERO)
        k = listing[-1][0]
        return {"cursor": [k[0], k[1], k[2]]}

    def partitions(self, start: dict, end: dict) -> list[_ObjectPartition]:
        lo, hi = self._key_of(start), self._key_of(end)
        return [p for k, p in self._keyed_listing() if lo < k <= hi]

    def read(self, partition: _ObjectPartition) -> Iterator[tuple]:
        return self._batch.read(partition)

    def commit(self, end: dict) -> None:
        pass  # cursors are replayable key bounds; nothing to release


class ObjectStoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "object_store"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> ObjectStoreReader:
        return ObjectStoreReader(self.options)

    def streamReader(self, schema: StructType) -> ObjectStoreStreamReader:
        return ObjectStoreStreamReader(self.options)
