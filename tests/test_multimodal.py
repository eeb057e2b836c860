"""Multimodal tests: schema, batching, fan-out, determinism, and REAL
stdlib-only decode — PNG/GIF/BMP pixels and WAV samples round-tripped
against independent test-side encoders."""

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


def test_real_feature_path_nulls_undecodable_rows(spark, media):
    # the media fixture's payloads are fake bytes, not decodable images:
    # the REAL pixel path must emit NULL features, never raise — a
    # corrupt blob must not kill the scan
    rows = mm.extract_image_features(media, deterministic_fake=False).collect()
    assert len(rows) == 3  # two fake-PNG rows + the null-payload row
    assert all(r["feature"] is None for r in rows)
    assert all(r["sha1"] for r in rows)  # byte-level metadata still real


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


# --- real pixel decode (stdlib only) ---------------------------------------

import struct
import zlib

import numpy as np


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _encode_png(arr: np.ndarray, color_type: int, filters, palette: bytes | None = None) -> bytes:
    """Test-side PNG ENCODER — the forward filter transform (spec §9),
    the inverse of the operator's unfilter, applied per scanline from
    the cycle ``filters``. An encode→decode round-trip therefore checks
    the decoder against independent math, not against itself."""
    h, w = arr.shape[:2]
    c = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    flat = arr.reshape(h, w * c).astype(np.uint8)
    raw = bytearray()
    prev = bytes(w * c)
    for y in range(h):
        line = flat[y].tobytes()
        f = filters[y % len(filters)]
        raw.append(f)
        n = len(line)
        if f == 0:
            enc = line
        elif f == 1:
            enc = bytes(
                (line[i] - (line[i - c] if i >= c else 0)) & 0xFF for i in range(n)
            )
        elif f == 2:
            enc = bytes((line[i] - prev[i]) & 0xFF for i in range(n))
        elif f == 3:
            enc = bytes(
                (line[i] - (((line[i - c] if i >= c else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(n)
            )
        elif f == 4:
            enc = bytearray()
            for i in range(n):
                a = line[i - c] if i >= c else 0
                b = prev[i]
                cc = prev[i - c] if i >= c else 0
                pa, pb, pc = abs(b - cc), abs(a - cc), abs(a + b - 2 * cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                enc.append((line[i] - pred) & 0xFF)
            enc = bytes(enc)
        else:
            raise ValueError(f)
        raw += enc
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = _chunk(b"IHDR", ihdr)
    if palette is not None:
        body += _chunk(b"PLTE", palette)
    body += _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


def _encode_bmp(arr: np.ndarray, top_down: bool = False) -> bytes:
    """24-bit BI_RGB BMP with proper 4-byte row stride (test-side)."""
    h, w = arr.shape[:2]
    stride = ((24 * w + 31) // 32) * 4
    src = arr if top_down else arr[::-1]
    data = b"".join(
        src[y][:, ::-1].tobytes() + b"\x00" * (stride - 3 * w) for y in range(h)
    )
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + dib + data


def _rand_pixels(rng: np.random.Generator, h: int, w: int, c: int) -> np.ndarray:
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def test_png_decode_roundtrip_all_filters_and_colortypes():
    rng = np.random.default_rng(11)
    for color_type, c in ((0, 1), (2, 3), (4, 2), (6, 4)):
        px = _rand_pixels(rng, 7, 5, c)
        # cycle through every filter type across scanlines
        payload = _encode_png(px, color_type, filters=[0, 1, 2, 3, 4])
        got = mm.decode_png_pixels(payload)
        assert got is not None and got.shape == px.shape, color_type
        assert np.array_equal(got, px), f"colortype {color_type}"


def test_png_decode_palette():
    rng = np.random.default_rng(5)
    palette = bytes(rng.integers(0, 256, size=48, dtype=np.uint8))  # 16 entries
    idx = rng.integers(0, 16, size=(6, 4, 1), dtype=np.uint8)
    payload = _encode_png(idx, 3, filters=[0, 2, 4], palette=palette)
    got = mm.decode_png_pixels(payload)
    pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
    assert np.array_equal(got, pal[idx[:, :, 0]])


def test_png_decode_real_file_and_rejects():
    got = mm.decode_png_pixels(REAL_PNG_1x1)
    assert got is not None and got.shape[:2] == (1, 1)
    assert got.shape[2] in (3, 4)
    assert mm.decode_png_pixels(b"\x89PNG-fake") is None
    assert mm.decode_png_pixels(b"") is None
    assert mm.decode_png_pixels(None) is None
    # truncated IDAT → None, not an exception
    trunc = _encode_png(np.zeros((4, 4, 3), np.uint8), 2, [0])
    assert mm.decode_png_pixels(trunc[: len(trunc) - 20]) is None


def test_bmp_decode_roundtrip_both_orientations():
    rng = np.random.default_rng(3)
    px = _rand_pixels(rng, 5, 3, 3)  # stride padding exercised (3*3=9 → 12)
    assert np.array_equal(mm.decode_bmp_pixels(_encode_bmp(px)), px)
    assert np.array_equal(mm.decode_bmp_pixels(_encode_bmp(px, top_down=True)), px)
    assert mm.decode_bmp_pixels(b"BM\x00") is None


def test_downsample_block_means_exact():
    arr = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = mm.downsample_pixels(arr, 2, 2)
    for by in range(2):
        for bx in range(2):
            block = arr[2 * by : 2 * by + 2, 2 * bx : 2 * bx + 2].astype(float)
            want = np.rint(block.mean(axis=(0, 1))).astype(np.uint8)
            assert np.array_equal(out[by, bx], want)
    # upsample repeats pixels
    up = mm.downsample_pixels(arr[:2, :2], 4, 4)
    assert np.array_equal(up[0, 0], arr[0, 0]) and np.array_equal(up[3, 3], arr[1, 1])


def test_real_feature_and_thumbnail_operators(spark):
    rng = np.random.default_rng(9)
    px = _rand_pixels(rng, 8, 6, 3)
    png = _encode_png(px, 2, filters=[4, 3, 2, 1, 0])
    bmp_px = _rand_pixels(rng, 4, 4, 3)
    rows = [
        (1, "image", "image/png", png, None, None, None),
        (2, "image", "image/bmp", _encode_bmp(bmp_px), None, None, None),
        (3, "image", "image/jpeg", _minimal_jpeg(10, 10), None, None, None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)

    feats = {r["media_id"]: r for r in
             mm.extract_image_features(df, deterministic_fake=False).collect()}
    rgb = px.astype(np.float64) / 255.0
    want = [*rgb.mean(axis=(0, 1)), *rgb.std(axis=(0, 1)), 6 / 8, 3 / 4.0]
    assert feats[1]["feature"] == pytest.approx(want, abs=1e-6)
    assert feats[2]["feature"] is not None
    assert feats[3]["feature"] is None  # JPEG needs absent codec libs

    thumbs = {r["media_id"]: r for r in mm.image_thumbnails(df, 2, 2).collect()}
    assert (thumbs[1]["thumb_h"], thumbs[1]["thumb_w"]) == (2, 2)
    assert len(thumbs[1]["rgb"]) == 2 * 2 * 3
    got_thumb = np.frombuffer(thumbs[1]["rgb"], dtype=np.uint8).reshape(2, 2, 3)
    assert np.array_equal(got_thumb, mm.downsample_pixels(px, 2, 2))
    assert thumbs[3]["rgb"] is None and thumbs[3]["thumb_h"] is None


# --- GIF (pure-Python LZW) -------------------------------------------------


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """Test-side GIF-LZW ENCODER: emits a clear code, then every pixel
    index as a literal code, tracking the decoder's table growth to keep
    code widths in sync (valid per spec — an encoder may defer
    compression). Independent of the decoder's string-table logic."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code, size):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    emit(clear, code_size)
    next_code = end + 1
    first = True
    for ix in indices:
        emit(int(ix), code_size)
        if first:
            first = False
            continue
        # decoder adds one table entry per code after the first
        if next_code < 4096:
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _encode_gif(idx: np.ndarray, palette: np.ndarray, interlaced: bool = False) -> bytes:
    h, w = idx.shape
    n = len(palette)
    depth = max(2, (n - 1).bit_length())
    pal = np.zeros((2**depth, 3), dtype=np.uint8)
    pal[:n] = palette
    screen = struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    rows = idx
    if interlaced:
        order = [r for start, step in mm._GIF_PASSES for r in range(start, h, step)]
        rows = idx[order]  # store rows in pass order
    min_code = max(2, depth)
    lzw = _lzw_encode(rows.flatten(), min_code)
    sub = bytearray()
    for i in range(0, len(lzw), 200):
        blk = lzw[i : i + 200]
        sub.append(len(blk))
        sub += blk
    sub.append(0)
    img = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlaced else 0)
    return (
        b"GIF89a" + screen + pal.tobytes() + img + bytes([min_code]) + bytes(sub) + b"\x3b"
    )


def test_gif_decode_roundtrip():
    rng = np.random.default_rng(13)
    palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(11, 7), dtype=np.uint8).astype(np.int64)
    got = mm.decode_gif_pixels(_encode_gif(idx, palette))
    assert got is not None and got.shape == (11, 7, 3)
    assert np.array_equal(got, palette[idx])


def test_gif_decode_interlaced_and_large_alphabet():
    rng = np.random.default_rng(17)
    # 256-entry palette → 8-bit codes → exercises code-size growth past 9+ bits
    palette = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(23, 31), dtype=np.int64)
    assert np.array_equal(mm.decode_gif_pixels(_encode_gif(idx, palette)), palette[idx])
    assert np.array_equal(
        mm.decode_gif_pixels(_encode_gif(idx, palette, interlaced=True)), palette[idx]
    )


def test_gif_decode_rejects_corrupt():
    assert mm.decode_gif_pixels(b"GIF89a\x00") is None
    assert mm.decode_gif_pixels(None) is None
    rng = np.random.default_rng(1)
    palette = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(6, 6), dtype=np.int64)
    full = _encode_gif(idx, palette)
    assert mm.decode_gif_pixels(full[:30]) is None  # truncated mid-stream
    # decode_image_pixels dispatches GIF now
    assert np.array_equal(mm.decode_image_pixels(full), palette[idx])


# --- WAV (stdlib struct) ---------------------------------------------------


def _encode_wav(samples: np.ndarray, rate: int, bits: int = 16, float32: bool = False) -> bytes:
    n, ch = samples.shape
    if float32:
        data = samples.astype("<f4").tobytes()
        audio_fmt, bits = 3, 32
    elif bits == 8:
        data = ((samples * 128.0) + 128.0).clip(0, 255).astype(np.uint8).tobytes()
        audio_fmt = 1
    elif bits == 16:
        data = (samples * 32768.0).clip(-32768, 32767).astype("<i2").tobytes()
        audio_fmt = 1
    else:
        data = (samples * 2147483648.0).clip(-(2**31), 2**31 - 1).astype("<i4").tobytes()
        audio_fmt = 1
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", audio_fmt, ch, rate, rate * block, block, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_wav_decode_roundtrip_all_encodings():
    rng = np.random.default_rng(21)
    x = (rng.uniform(-0.9, 0.9, size=(480, 2))).astype(np.float64)
    for kwargs, tol in (
        ({"bits": 16}, 1 / 32000),
        ({"bits": 32}, 1e-9),
        ({"float32": True}, 1e-7),
        ({"bits": 8}, 1 / 120),
    ):
        got = mm.decode_wav_samples(_encode_wav(x, 16000, **kwargs))
        assert got is not None, kwargs
        samples, rate = got
        assert rate == 16000 and samples.shape == (480, 2)
        assert np.abs(samples - x).max() < tol, kwargs
    assert mm.decode_wav_samples(b"RIFFxxxx") is None
    assert mm.decode_wav_samples(None) is None


def test_extract_audio_features_operator(spark):
    t = np.arange(8000) / 8000.0
    sine = np.sin(2 * np.pi * 100 * t)[:, None]  # 100 Hz, 1 s
    rows = [
        (1, "audio", "audio/wav", _encode_wav(sine, 8000), None, None, None),
        (2, "audio", "audio/mpeg", b"ID3-not-a-wav", None, None, None),
        (3, "image", "image/png", b"ignored", None, None, None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in mm.extract_audio_features(df).collect()}
    assert set(got) == {1, 2}
    r = got[1]
    assert (r["sample_rate"], r["channels"], r["n_samples"]) == (8000, 1, 8000)
    assert r["duration_ms"] == pytest.approx(1000.0)
    assert r["rms"] == pytest.approx(1 / np.sqrt(2), rel=1e-3)
    assert r["peak"] == pytest.approx(1.0, rel=1e-3)
    # 100 Hz sine crosses zero 200 times/second
    assert r["zero_crossing_rate"] == pytest.approx(200 / 8000, rel=0.02)
    assert got[2]["sample_rate"] is None and got[2]["rms"] is None


def test_gif_animation_compositing_roundtrip():
    """Multi-frame GIF with transparency, offsets, and disposal: each
    decoded frame must equal the composited canvas per the GIF89a
    animation model."""
    import numpy as np

    from topn_clashroyal_etl_sql_snapshot_spark.operators.multimodal import (
        decode_gif_frames,
    )
    from topn_clashroyal_etl_sql_snapshot_spark.testing.gif_codec import encode_gif

    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
         [255, 255, 0], [255, 0, 255], [0, 255, 255], [255, 255, 255]],
        dtype=np.uint8,
    )
    f0 = np.full((8, 10), 1, dtype=np.uint8)          # all red
    f1 = np.full((4, 4), 2, dtype=np.uint8)           # green patch at (3,2)
    f2 = np.full((8, 10), 3, dtype=np.uint8)
    f2[2:6, 1:5] = 7                                  # idx 7 transparent
    blob = encode_gif(
        [
            {"indices": f0},
            {"indices": f1, "offset": (3, 2)},
            {"indices": f2, "transparent": 7},
        ],
        pal,
    )
    frames = decode_gif_frames(blob)
    assert frames is not None and len(frames) == 3
    assert np.array_equal(frames[0], np.tile(pal[1], (8, 10, 1)))
    expect1 = np.tile(pal[1], (8, 10, 1)).astype(np.uint8)
    expect1[2:6, 3:7] = pal[2]
    assert np.array_equal(frames[1], expect1)
    # frame 2: blue everywhere except the transparent window, which
    # shows frame 1's canvas through
    expect2 = np.tile(pal[3], (8, 10, 1)).astype(np.uint8)
    expect2[2:6, 1:5] = expect1[2:6, 1:5]
    assert np.array_equal(frames[2], expect2)


def test_gif_disposal_restore_background():
    import numpy as np

    from topn_clashroyal_etl_sql_snapshot_spark.operators.multimodal import (
        decode_gif_frames,
    )
    from topn_clashroyal_etl_sql_snapshot_spark.testing.gif_codec import encode_gif

    pal = np.array(
        [[9, 9, 9], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    f0 = np.full((6, 6), 1, dtype=np.uint8)
    f1 = np.full((6, 6), 2, dtype=np.uint8)
    f1[1:5, 1:5] = 3
    # frame 0 disposes to background; frame 1 then draws with idx 3
    # transparent, so the hole shows BACKGROUND (palette[0]), not frame 0
    blob = encode_gif(
        [{"indices": f0, "disposal": 2}, {"indices": f1, "transparent": 3}],
        pal,
        bg_index=0,
    )
    frames = decode_gif_frames(blob)
    assert frames is not None and len(frames) == 2
    expect = np.tile(pal[2], (6, 6, 1)).astype(np.uint8)
    expect[1:5, 1:5] = pal[0]
    assert np.array_equal(frames[1], expect)


def test_sample_video_frames_real_gif(spark):
    """The video frame sampler's REAL path: an animated GIF payload
    fans out to every_n-th composited RGB frame; an undecodable codec
    payload is skipped, not fatal."""
    import numpy as np

    from topn_clashroyal_etl_sql_snapshot_spark.operators import multimodal
    from topn_clashroyal_etl_sql_snapshot_spark.testing.gif_codec import encode_gif

    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    gif = encode_gif(
        [{"indices": np.full((4, 5), i % 4, dtype=np.uint8)} for i in range(5)],
        pal,
    )
    rows = [
        (1, "video", "image/gif", bytearray(gif), None, None, None),
        (2, "video", "video/mp4", bytearray(b"\x00\x00mp4 junk"), None, None, None),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = multimodal.sample_video_frames(
        media, every_n=2, deterministic_fake=False
    ).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["media_id"], []).append(r)
    assert 2 not in by_id  # undecodable skipped
    idxs = sorted(r["frame_idx"] for r in by_id[1])
    assert idxs == [0, 2, 4]
    f0 = [r for r in by_id[1] if r["frame_idx"] == 0][0]
    arr = np.frombuffer(bytes(f0["frame_payload"]), np.uint8).reshape(4, 5, 3)
    assert np.array_equal(arr, np.tile(pal[0], (4, 5, 1)))


def test_gif_frames_corrupt_and_hostile_headers_return_none():
    """Truncated GCE and absurd declared screen sizes must yield None,
    never an exception or a multi-GB allocation."""
    import struct

    from topn_clashroyal_etl_sql_snapshot_spark.operators.multimodal import (
        decode_gif_frames,
    )

    # truncated right after the GCE block-size byte
    truncated = b"GIF89a" + struct.pack("<HH", 4, 4) + bytes([0, 0, 0]) + b"\x21\xf9\x04"
    assert decode_gif_frames(truncated) is None
    # header declares a 65535x65535 canvas (~12.9 GB) with no frame data
    huge = b"GIF89a" + struct.pack("<HH", 65535, 65535) + bytes([0, 0, 0]) + b"\x3b"
    assert decode_gif_frames(huge) is None
    assert decode_gif_frames(None) is None
    assert decode_gif_frames(b"GIF89a") is None


def test_gif_retained_frames_bounded_by_total_bytes():
    """A small GIF declaring a large screen plus many tiny frame rects
    must not expand to max_frames full-canvas copies: the retained list
    is capped at max_total_bytes, and every_n skips frames without
    breaking compositing state."""
    import numpy as np

    from topn_clashroyal_etl_sql_snapshot_spark.operators.multimodal import (
        decode_gif_frames,
    )
    from topn_clashroyal_etl_sql_snapshot_spark.testing.gif_codec import encode_gif

    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    # 64x64 screen (12 KB/frame), 40 one-pixel frames
    frames_in = [
        {"indices": np.full((1, 1), 1 + (i % 2), dtype=np.uint8),
         "offset": (i % 8, i // 8)}
        for i in range(40)
    ]
    blob = encode_gif(frames_in, pal, screen=(64, 64))
    # budget for exactly 3 retained frames: 3 * 64*64*3 = 36864 bytes
    got = decode_gif_frames(blob, max_total_bytes=3 * 64 * 64 * 3)
    assert got is not None and len(got) == 3
    # every_n=4: retained frames are composites 0,4,8,... and each must
    # equal the corresponding slice of the full decode
    full = decode_gif_frames(blob)
    sampled = decode_gif_frames(blob, every_n=4)
    assert sampled is not None and len(sampled) == len(full[::4])
    for a, b in zip(sampled, full[::4]):
        assert np.array_equal(a, b)


def test_jpeg_non_8bit_precision_returns_none():
    """A 12-bit extended-sequential SOF must return None (decoding with
    the 8-bit level shift would give plausible-but-wrong pixels)."""
    import numpy as np

    from topn_clashroyal_etl_sql_snapshot_spark.operators import jpeg
    from topn_clashroyal_etl_sql_snapshot_spark.testing.jpeg_codec import encode_jpeg

    blob = bytearray(encode_jpeg(np.arange(64, dtype=np.uint8).reshape(8, 8)))
    sof = blob.find(b"\xff\xc0")
    assert sof >= 0 and blob[sof + 4] == 8  # precision byte after len
    assert jpeg.decode_jpeg_pixels(bytes(blob)) is not None
    blob[sof + 4] = 12
    assert jpeg.decode_jpeg_pixels(bytes(blob)) is None


def test_decoders_never_raise_on_fuzzed_bytes():
    """The module contract is None-or-valid on ANY payload — random
    bytes and bit-flipped valid files must never raise out of a decoder
    (an exception inside mapInPandas kills the task and, after retries,
    the whole scan)."""
    import numpy as np

    from topn_clashroyal_etl_sql_snapshot_spark.operators import jpeg, multimodal
    from topn_clashroyal_etl_sql_snapshot_spark.testing.gif_codec import encode_gif
    from topn_clashroyal_etl_sql_snapshot_spark.testing.jpeg_codec import encode_jpeg

    decoders = [
        multimodal.parse_image_header,
        multimodal.decode_image_pixels,
        multimodal.decode_png_pixels,
        multimodal.decode_bmp_pixels,
        multimodal.decode_gif_pixels,
        multimodal.decode_gif_frames,
        multimodal.decode_wav_samples,
        jpeg.decode_jpeg_pixels,
    ]
    rng = np.random.default_rng(99)

    payloads = [b"", b"\x00", bytes(rng.integers(0, 256, 64, dtype=np.uint8))]
    # random bytes behind each real magic prefix (parser goes deepest)
    for magic in (b"\x89PNG\r\n\x1a\n", b"GIF89a", b"BM", b"\xff\xd8\xff",
                  b"RIFF????WAVE"):
        for size in (4, 64, 512):
            payloads.append(magic + bytes(rng.integers(0, 256, size, dtype=np.uint8)))
    # bit-flipped valid files
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    valid = [
        encode_jpeg(np.arange(64, dtype=np.uint8).reshape(8, 8)),
        encode_gif([{"indices": np.zeros((4, 4), np.uint8)}] * 2, pal),
    ]
    for blob in valid:
        for _ in range(40):
            b = bytearray(blob)
            for _ in range(rng.integers(1, 4)):
                b[rng.integers(0, len(b))] ^= 1 << rng.integers(0, 8)
            payloads.append(bytes(b))

    for payload in payloads:
        for dec in decoders:
            dec(payload)  # must not raise; return value unconstrained


# ---------------------------------------------------------------------------
# Perceptual image dedup (pHash)
# ---------------------------------------------------------------------------


def _smooth_pixels(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Low-frequency test image (pHash is a low-frequency descriptor —
    white noise has no structure for it to hold on to)."""
    coarse = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    return np.repeat(np.repeat(coarse, h // 8, axis=0), w // 8, axis=1)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_invariances_and_separation():
    rng = np.random.default_rng(23)
    base = _smooth_pixels(rng, 32, 32)
    h_base = mm.phash64(base)

    # identical pixels, different container: identical hash
    assert mm.phash64(base.copy()) == h_base

    # mild noise: a few bits at most
    noised = base.astype(np.int16) + rng.integers(-8, 9, size=base.shape)
    noised = noised.clip(0, 255).astype(np.uint8)
    assert _hamming(mm.phash64(noised), h_base) <= 10

    # global brightness shift: DC-excluded median keeps the hash close
    brighter = (base.astype(np.int16) + 40).clip(0, 255).astype(np.uint8)
    assert _hamming(mm.phash64(brighter), h_base) <= 10

    # resize (same content at another resolution): close
    big = np.repeat(np.repeat(base, 4, axis=0), 4, axis=1)
    assert _hamming(mm.phash64(big), h_base) <= 10

    # distinct structured images: far apart
    other = _smooth_pixels(rng, 32, 32)
    assert _hamming(mm.phash64(other), h_base) > 16


def test_image_neardup_pairs_finds_planted_pair(spark):
    rng = np.random.default_rng(31)
    base = _smooth_pixels(rng, 32, 32)
    noised = (
        (base.astype(np.int16) + rng.integers(-4, 5, size=base.shape))
        .clip(0, 255)
        .astype(np.uint8)
    )
    others = [_smooth_pixels(rng, 32, 32) for _ in range(6)]
    rows = [
        (1, "image", "image/bmp", _encode_bmp(base), 32, 32, None),
        (2, "image", "image/bmp", _encode_bmp(noised), 32, 32, None),
        (3, "image", "image/bmp", b"\x00corrupt", None, None, None),
        (4, "audio", "audio/wav", b"RIFF", None, None, 100),
    ] + [
        (10 + i, "image", "image/bmp", _encode_bmp(o), 32, 32, None)
        for i, o in enumerate(others)
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)

    hashes = {r["media_id"]: r["phash"] for r in mm.image_phashes(media).collect()}
    assert hashes[3] is None  # corrupt -> NULL, never a crash
    assert 4 not in hashes    # non-image rows never decode
    assert hashes[1] is not None and hashes[2] is not None

    got = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in mm.image_neardup_pairs(media, max_hamming=10, chunks=11).collect()
    }
    assert (1, 2) in got and got[(1, 2)] <= 10
    # unrelated images don't pair with the planted ones
    assert all({a, b} == {1, 2} for a, b in got), got


# ---------------------------------------------------------------------------
# Perceptual audio dedup (spectral band signature)
# ---------------------------------------------------------------------------


def _tone_mix(rng: np.random.Generator, rate: int, secs: float = 0.5) -> np.ndarray:
    """Random 16-tone mixture — enough spectral structure that distinct
    clips occupy distinct band patterns (4 sparse tones left most bands
    at the noise floor and unrelated clips within a few bits)."""
    t = np.arange(int(rate * secs)) / rate
    freqs = rng.uniform(60, 3800, size=16)
    amps = rng.uniform(0.05, 0.3, size=16)
    x = sum(a * np.sin(2 * np.pi * f * t) for a, f in zip(amps, freqs))
    return x.reshape(-1, 1)


def test_audio_fingerprint_invariances_and_separation():
    rng = np.random.default_rng(41)
    rate = 16000
    base = _tone_mix(rng, rate)
    h_base = mm.audio_fingerprint64(base, rate)

    # exact volume invariance: every band energy scales together
    assert mm.audio_fingerprint64(base * 0.3, rate) == h_base

    # s16 quantization (a re-encode): at most a couple of border bits
    q = np.round(base * 32767) / 32767
    assert _hamming(mm.audio_fingerprint64(q, rate), h_base) <= 4

    # mild additive noise: close
    noised = base + rng.normal(0, 0.01, size=base.shape)
    assert _hamming(mm.audio_fingerprint64(noised, rate), h_base) <= 8

    # different tone mixture: far
    other = _tone_mix(rng, rate)
    assert _hamming(mm.audio_fingerprint64(other, rate), h_base) > 8

    # too short to frame
    assert mm.audio_fingerprint64(base[:100], rate) is None


def test_audio_neardup_pairs_finds_planted_pair(spark):
    rng = np.random.default_rng(43)
    rate = 16000
    base = _tone_mix(rng, rate)
    noised = base + rng.normal(0, 0.005, size=base.shape)
    others = [_tone_mix(rng, rate) for _ in range(5)]
    rows = [
        (1, "audio", "audio/wav", _encode_wav(base, rate), None, None, 500),
        (2, "audio", "audio/wav", _encode_wav(noised, rate), None, None, 500),
        (3, "audio", "audio/wav", b"RIFFcorrupt", None, None, None),
        (4, "image", "image/bmp", b"BMnope", None, None, None),
    ] + [
        (10 + i, "audio", "audio/wav", _encode_wav(o, rate), None, None, 500)
        for i, o in enumerate(others)
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)

    fps = {r["media_id"]: r["afp"] for r in mm.audio_fingerprints(media).collect()}
    assert fps[3] is None and 4 not in fps
    assert fps[1] is not None and fps[2] is not None

    got = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in mm.audio_neardup_pairs(media, max_hamming=6).collect()
    }
    assert (1, 2) in got and got[(1, 2)] <= 6
    assert all({a, b} == {1, 2} for a, b in got), got
