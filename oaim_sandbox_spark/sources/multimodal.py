"""Multimodal columns for 100 TB training-data pipelines.

Images / audio / video are opaque BINARY columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
mapInPandas stages. The image/audio codec libraries are NOT in this container,
so each codec call sits behind an import-try with a deterministic fake
(documented below); the Spark-side plumbing — schema, partitioning, UDF
signature, batch shape — is real and tested.

Design notes for scale:
  - binary payloads ride in the same row as metadata; Spark splits scan
    partitions by spark.sql.files.maxPartitionBytes so a partition of blobs
    stays memory-bounded.
  - every stage is a narrow mapInPandas (no shuffle); downstream groupings
    (e.g. per-label galleries) shuffle only extracted features, never blobs.
  - a deterministic fake decoder keeps the whole pipeline testable/CI-able
    with zero native deps: "pixels" are derived from sha256(content).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def load_media_dir(spark: SparkSession, path: str, kind: str = "image") -> DataFrame:
    """binaryFile scan -> MEDIA_SCHEMA rows (metadata filled by later stages)."""
    binf = spark.read.format("binaryFile").load(path)
    # media_id = FULL path: a bare basename conflates a/img0.png with
    # b/img0.png, silently merging distinct media in every downstream
    # join/dedup; the basename stays available via the path's tail
    return binf.select(
        F.col("path").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _decode_image(content: bytes) -> tuple[int, int, list[float]]:
    """(width, height, feature[16]). Real path uses PIL; fake path derives a
    deterministic pseudo-image from sha256(content) so the distributed
    pipeline is fully exercisable without codecs."""
    try:
        import io

        from PIL import Image  # type: ignore

        img = Image.open(io.BytesIO(content)).convert("L").resize((16, 16))
        px = list(img.getdata())
        feat = [sum(px[i::16]) / (16 * 255.0) for i in range(16)]
        return img.width, img.height, [float(f) for f in feat]
    except ImportError:
        h = hashlib.sha256(content or b"").digest()
        w = 64 + h[0] % 192
        hh = 64 + h[1] % 192
        feat = [b / 255.0 for b in h[2:18]]
        return w, hh, feat
    except Exception:
        # PIL present but the blob is corrupt/empty/unsupported: one bad
        # image must degrade to a sentinel row, never abort the whole job
        # from inside the Python worker
        return 0, 0, [0.0] * 16


def extract_image_features(df: DataFrame) -> DataFrame:
    """Decode + 16-dim feature per image, Arrow-batched; narrow op."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h, feat = _decode_image(bytes(r["content"]) if r["content"] is not None else b"")
                rows.append({"media_id": r["media_id"], "feature": feat, "width": w, "height": h})
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return df.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage: binary in, binary out, same schema. The fake path tags
    the payload with the target size (sha-stable) so tests can assert the
    transform ran; the PIL path does a real resize."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import io

            from PIL import Image  # type: ignore

            def do(content: bytes) -> bytes:
                img = Image.open(io.BytesIO(content)).resize((width, height))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                return buf.getvalue()

        except ImportError:

            def do(content: bytes) -> bytes:
                return hashlib.sha256((content or b"") + f":{width}x{height}".encode()).digest()

        def safe_do(content: bytes) -> bytes:
            try:
                return do(content)
            except Exception:
                # corrupt blob under PIL: pass the original through rather
                # than failing the task (the fake path never raises)
                return content

        for pdf in batches:
            pdf = pdf.copy()
            pdf["content"] = [safe_do(bytes(c) if c is not None else b"") for c in pdf["content"]]
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return df.mapInPandas(run, df.schema)


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling: one row per sampled frame. No video codec in this
    container -> deterministic fake (frame bytes = sha256(content:ts)); the
    1->N row fan-out, schema, and batching are the real plumbing."""
    out_schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("frame_ts_ms", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                duration = r["duration_ms"] if pd.notna(r["duration_ms"]) else 3000
                content = bytes(r["content"]) if r["content"] is not None else b""
                for ts in range(0, int(duration), every_ms):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_ts_ms": ts,
                            "frame": hashlib.sha256(content + f":{ts}".encode()).digest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(run, out_schema)


def audio_features(df: DataFrame, n_bands: int = 8) -> DataFrame:
    """Audio feature stub: n_bands floats per clip (sha-derived fake; a real
    impl would do an FFT band energy via soundfile/librosa)."""
    out_schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("bands", ArrayType(FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                h = hashlib.sha256(bytes(r["content"]) if r["content"] is not None else b"").digest()
                rows.append({"media_id": r["media_id"], "bands": [b / 255.0 for b in h[:n_bands]]})
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(run, out_schema)
