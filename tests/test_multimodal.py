"""Multimodal column plumbing: binary payloads + typed metadata through
mapInPandas stages (decode/features/resize/frame-sample run on the
deterministic fake in this container)."""

import pytest

from oaim_sandbox_spark.sources.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    extract_image_features,
    load_media_dir,
    resize_images,
    sample_video_frames,
)


@pytest.fixture()
def media(spark):
    rows = [
        ("img1.png", "image", b"\x89PNGfakebytes1", None, None, None, None),
        ("img2.png", "image", b"\x89PNGfakebytes2", None, None, None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_load_media_dir(spark, tmp_path):
    (tmp_path / "x.bin").write_bytes(b"12345")
    df = load_media_dir(spark, str(tmp_path), kind="image")
    rows = df.collect()
    # media_id is the FULL path (a bare basename would conflate
    # same-named files in different subdirectories)
    assert rows[0].media_id.endswith("/x.bin")
    assert bytes(rows[0].content) == b"12345"


def test_extract_image_features(media):
    rows = {r.media_id: r for r in extract_image_features(media).collect()}
    assert len(rows) == 2
    assert len(rows["img1.png"].feature) == 16
    assert all(0.0 <= f <= 1.0 for f in rows["img1.png"].feature)
    # deterministic: different payloads -> different features
    assert rows["img1.png"].feature != rows["img2.png"].feature
    assert rows["img1.png"].width > 0


def test_features_deterministic(media):
    a = extract_image_features(media).collect()
    b = extract_image_features(media).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_resize_images(media):
    out = resize_images(media, 32, 32).collect()
    assert all(r.width == 32 and r.height == 32 for r in out)
    assert out[0].media_id in ("img1.png", "img2.png")


def test_sample_video_frames(spark):
    rows = [("v1.mp4", "video", b"videobytes", None, None, None, 3500)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    frames = sample_video_frames(df, every_ms=1000).collect()
    assert [f.frame_ts_ms for f in sorted(frames, key=lambda r: r.frame_ts_ms)] == [0, 1000, 2000, 3000]
    assert len({bytes(f.frame) for f in frames}) == 4  # distinct per timestamp


def test_audio_features(spark):
    rows = [("a1.wav", "audio", b"audiobytes", None, None, None, 2000)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = audio_features(df, n_bands=8).collect()
    assert len(out[0].bands) == 8
