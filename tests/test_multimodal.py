"""Multimodal plumbing tests: schema, batching, fan-out, determinism.
The decode step is a documented stub; the Spark-side contract is real."""

from __future__ import annotations

import hashlib

import pytest

from topn_clashroyal_etl_sql_snapshot_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNG-fake-bytes-1", 64, 64, None),
        (2, "image", "image/png", b"\x89PNG-fake-bytes-22", 32, 32, None),
        (3, "audio", "audio/wav", b"RIFF-fake", None, None, 1200),
        (4, "video", "video/mp4", bytes(range(100)), 320, 240, 5000),
        (5, "image", "image/jpeg", None, None, None, None),  # null payload
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_image_features_deterministic(spark, media):
    out = mm.extract_image_features(media).orderBy("media_id").collect()
    assert [r["media_id"] for r in out] == [1, 2, 5]
    r1 = out[0]
    assert r1["sha1"] == hashlib.sha1(b"\x89PNG-fake-bytes-1").hexdigest()
    assert r1["n_bytes"] == len(b"\x89PNG-fake-bytes-1")
    assert len(r1["feature"]) == 8
    assert all(0.0 <= f <= 1.0 for f in r1["feature"])
    # null payload → empty-bytes semantics, not a crash
    r5 = out[2]
    assert r5["sha1"] == hashlib.sha1(b"").hexdigest()
    assert r5["n_bytes"] == 0
    # determinism: second run identical
    again = mm.extract_image_features(media).orderBy("media_id").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


def test_video_frame_fanout(spark, media):
    frames = mm.sample_video_frames(media, every_n=10).collect()
    assert all(r["media_id"] == 4 for r in frames)
    assert len(frames) == 10
    assert sorted(r["frame_idx"] for r in frames) == list(range(10))
    # frames reassemble to the original payload
    payload = b"".join(
        r["frame_payload"] for r in sorted(frames, key=lambda r: r["frame_idx"])
    )
    assert payload == bytes(range(100))


def test_media_stats_no_udf(spark, media):
    stats = {r["kind"]: r for r in mm.media_stats(media).collect()}
    assert stats["image"]["n"] == 3
    assert stats["video"]["total_bytes"] == 100
    # the rollup plan must be UDF-free (pure JVM)
    plan = mm.media_stats(media)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stub_raises_without_fake(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        mm.extract_image_features(media, deterministic_fake=False).collect()


# --- real header parsing (no codec libs) -----------------------------------

# a GENUINE 1×1 transparent PNG (full valid file, not a synthetic header)
REAL_PNG_1x1 = __import__("base64").b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhf"
    "DwAChwGA60e6kgAAAABJRU5ErkJggg=="
)


def _minimal_jpeg(width: int, height: int) -> bytes:
    """A structurally valid JPEG prefix: SOI, APP0 (JFIF), SOF0."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0


def test_parse_image_header_formats():
    import struct

    assert mm.parse_image_header(REAL_PNG_1x1) == ("png", 1, 1)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
    assert mm.parse_image_header(gif) == ("gif", 320, 200)
    assert mm.parse_image_header(_minimal_jpeg(640, 480)) == ("jpeg", 640, 480)
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 12, -34) + b"\x00" * 8
    assert mm.parse_image_header(bmp) == ("bmp", 12, 34)  # top-down DIB
    # OS/2 BITMAPCOREHEADER: 12-byte DIB header, u16 width/height
    os2 = b"BM" + b"\x00" * 12 + struct.pack("<I", 12) + struct.pack("<HH", 640, 350)
    assert mm.parse_image_header(os2) == ("bmp", 640, 350)
    # corrupt / unknown / empty → None, never an exception
    assert mm.parse_image_header(b"\x89PNG-fake-bytes") is None
    assert mm.parse_image_header(b"\xff\xd8\x00\x00") is None
    assert mm.parse_image_header(b"") is None
    assert mm.parse_image_header(None) is None


def test_image_dimensions_operator(spark):
    rows = [
        (10, "image", "image/png", REAL_PNG_1x1, None, None, None),
        (11, "image", "image/gif",
         b"GIF87a" + __import__("struct").pack("<HH", 7, 9) + b"\x00" * 6,
         None, None, None),
        (12, "image", "image/jpeg", _minimal_jpeg(33, 44), None, None, None),
        (13, "image", "image/png", b"not-an-image", None, None, None),
        (14, "video", "video/mp4", b"whatever", None, None, None),  # filtered out
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {
        r["media_id"]: (r["format"], r["width"], r["height"])
        for r in mm.image_dimensions(df).collect()
    }
    assert got == {
        10: ("png", 1, 1),
        11: ("gif", 7, 9),
        12: ("jpeg", 33, 44),
        13: (None, None, None),
    }
