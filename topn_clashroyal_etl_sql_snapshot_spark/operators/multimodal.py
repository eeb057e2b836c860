"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched Pandas UDFs.

The Spark-side contract is fully real — schemas, partition-preserving
``mapInPandas`` plumbing, batch shapes, deterministic fake features — and
image HEADER decoding (PNG/GIF/JPEG/BMP width·height, pure struct byte
parsing — no codec libraries) is REAL via :func:`image_dimensions`.
Pixel-level decoding is STUBBED: the image/audio codec libraries are
not available in this environment. Each decode function documents its
production body and raises ``NotImplementedError`` unless
``deterministic_fake=True`` (the default used in tests), which derives
features from the raw bytes so the pipeline is testable end-to-end.

Scale notes: binary payloads ride the columnar Arrow path (no per-row
pickling); ``mapInPandas`` keeps batches bounded via
``spark.sql.execution.arrow.maxRecordsPerBatch``; feature extraction is
embarrassingly parallel — no shuffle at all until a downstream groupBy.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata for an opaque media blob
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),   # images/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),  # audio/video
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sha1", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)


IMAGE_DIM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

# JPEG start-of-frame markers that carry dimensions (SOF0-SOF15 minus
# DHT/DAC/RST-family C4, C8, CC)
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF
}


def parse_image_header(payload: bytes | None) -> tuple[str, int, int] | None:
    """(format, width, height) from real container headers — pure struct
    parsing, no codec libraries:

    - PNG: 8-byte signature, then the IHDR chunk (width/height u32 BE at
      offsets 16/20).
    - GIF: 'GIF87a'/'GIF89a', then the logical screen descriptor
      (width/height u16 LE).
    - JPEG: walk the marker stream from SOI to the first SOF marker;
      its payload is [precision u8, height u16 BE, width u16 BE].
    - BMP: 'BM', BITMAPINFOHEADER width/height i32 LE at offset 18/22.

    Returns None for unknown/truncated payloads (callers keep the row
    with null dims — corrupt media must not kill a 100 TB scan).
    """
    if not payload:
        return None
    p = payload
    if p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 24 and p[12:16] == b"IHDR":
        w, h = struct.unpack(">II", p[16:24])
        return ("png", w, h)
    if p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
        w, h = struct.unpack("<HH", p[6:10])
        return ("gif", w, h)
    if p[:2] == b"BM" and len(p) >= 22:
        # DIB header size at offset 14 selects the layout: 12 = OS/2
        # BITMAPCOREHEADER (u16 width/height at 18/20); anything newer
        # (40 = BITMAPINFOHEADER, 108/124 = V4/V5) uses i32 at 18/22.
        (dib_size,) = struct.unpack("<I", p[14:18])
        if dib_size == 12:
            w, h = struct.unpack("<HH", p[18:22])
            return ("bmp", w, h)
        if len(p) >= 26:
            w, h = struct.unpack("<ii", p[18:26])
            return ("bmp", w, abs(h))  # negative height = top-down DIB
        return None
    if p[:2] == b"\xff\xd8":
        off = 2
        while off + 4 <= len(p):
            if p[off] != 0xFF:
                return None  # marker desync — corrupt stream
            marker = p[off + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                off += 2  # standalone markers carry no length
                continue
            if off + 4 > len(p):
                return None
            seg_len = struct.unpack(">H", p[off + 2 : off + 4])[0]
            if marker in _JPEG_SOF:
                if off + 9 > len(p):
                    return None
                h, w = struct.unpack(">HH", p[off + 5 : off + 9])
                return ("jpeg", w, h)
            off += 2 + seg_len
        return None
    return None


def image_dimensions(media: DataFrame) -> DataFrame:
    """payload → (format, width, height) by REAL header parsing (see
    :func:`parse_image_header`) over Arrow-batched ``mapInPandas`` —
    the decode path that needs no codec libraries."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_image_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": [t[0] if t else None for t in parsed],
                    "width": pd.array(
                        [t[1] if t else None for t in parsed], dtype="Int32"
                    ),
                    "height": pd.array(
                        [t[2] if t else None for t in parsed], dtype="Int32"
                    ),
                }
            )

    img = media.filter(F.col("kind") == "image").select("media_id", "payload")
    return img.mapInPandas(run, IMAGE_DIM_SCHEMA)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature vector derived from content bytes."""
    h = hashlib.sha1(payload or b"").digest()
    return [h[i] / 255.0 for i in range(dim)]


def extract_image_features(
    media: DataFrame, deterministic_fake: bool = True, dim: int = 8
) -> DataFrame:
    """payload → (sha1, n_bytes, feature[dim]) via ``mapInPandas``.

    Production body (requires PIL/torchvision, not in this container)::

        img = PIL.Image.open(io.BytesIO(payload)).convert("RGB")
        img = img.resize((224, 224))
        feature = model(np.asarray(img))          # or color histogram

    The stub derives a deterministic fake feature from the bytes so the
    plumbing (schema, batching, downstream joins) runs for real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real image decode requires PIL/libvips — not available here"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sha1": [
                        hashlib.sha1(p or b"").hexdigest() for p in payloads
                    ],
                    "n_bytes": [len(p or b"") for p in payloads],
                    "feature": [_fake_feature(p, dim) for p in payloads],
                }
            )

    img = media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    )
    return img.mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def sample_video_frames(
    media: DataFrame, every_n: int = 10, deterministic_fake: bool = True
) -> DataFrame:
    """video payload → rows of sampled frames (one row per frame).

    Production body (requires pyav/ffmpeg)::

        container = av.open(io.BytesIO(payload))
        for i, frame in enumerate(container.decode(video=0)):
            if i % every_n == 0: yield frame.to_image().tobytes()

    The stub slices the payload into ``every_n`` pseudo-frames so the
    fan-out shape (1 row → N rows) is exercised for real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real video decode requires pyav/ffmpeg — not available here"
                )
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = payload or b""
                step = max(1, len(p) // every_n)
                for idx, off in enumerate(range(0, len(p), step)):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_payload"].append(p[off : off + step])
            yield pd.DataFrame(out)

    vid = media.filter(F.col("kind") == "video").select("media_id", "payload")
    return vid.mapInPandas(run, FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata rollup — no UDF: payload sizes/counts by kind."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max(F.length("payload")).alias("max_bytes"),
        )
        .orderBy("kind")
    )
