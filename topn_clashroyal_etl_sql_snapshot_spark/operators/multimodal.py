"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched Pandas UDFs.

The Spark-side contract is fully real — schemas, partition-preserving
``mapInPandas`` plumbing, batch shapes — and so is the decode path for
every format stdlib can carry: image HEADER parsing for
PNG/GIF/JPEG/BMP (:func:`parse_image_header`); PIXEL decoding for PNG
(zlib inflate + all five scanline filters, :func:`decode_png_pixels`),
GIF (pure-Python LZW + interlace, :func:`decode_gif_pixels`), and
uncompressed BMP (:func:`decode_bmp_pixels`); SAMPLE decoding for
PCM/float WAV (:func:`decode_wav_samples`) — no codec libraries
involved. JPEG entropy coding and compressed audio/video codecs DO
need external libraries that are not in this container; those paths
return ``None`` features per row (corrupt or undecodable media must
not kill a 100 TB scan), and the frame sampler documents its pyav
production body behind ``deterministic_fake``.

Scale notes: binary payloads ride the columnar Arrow path (no per-row
pickling); ``mapInPandas`` keeps batches bounded via
``spark.sql.execution.arrow.maxRecordsPerBatch``; decode and feature
extraction are embarrassingly parallel — no shuffle at all until a
downstream groupBy.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
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


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png_pixels(payload: bytes | None) -> np.ndarray | None:
    """REAL PNG pixel decode with stdlib only: chunk walk → zlib inflate
    → per-scanline unfilter (None/Sub/Up/Average/Paeth, the full filter
    set of the PNG spec §9) → H×W×C uint8. Palette images are mapped
    through PLTE to RGB. Supported: bit depth 8, non-interlaced — the
    overwhelmingly common web case; anything else returns None rather
    than guessing.
    """
    p = payload or b""
    if p[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    ihdr = plte = None
    idat = bytearray()
    off = 8
    while off + 8 <= len(p):
        (ln,), typ = struct.unpack(">I", p[off : off + 4]), p[off + 4 : off + 8]
        data = p[off + 8 : off + 8 + ln]
        if len(data) < ln:
            return None  # truncated chunk
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        off += 12 + ln  # length + type + data + CRC
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr[:13])
    channels = _PNG_CHANNELS.get(color)
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or channels is None:
        return None
    if color == 3 and plte is None:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * channels
    if len(raw) < h * (stride + 1):
        return None
    rows: list[bytes] = []
    prev = bytearray(stride)
    pos = 0
    for _ in range(h):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += stride + 1
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            return None
        rows.append(bytes(line))
        prev = line
    arr = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(h, w, channels)
    if color == 3:
        pal = np.frombuffer(plte, dtype=np.uint8)
        pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
        if int(arr.max(initial=0)) >= len(pal):
            return None
        arr = pal[arr[:, :, 0]]
    return arr


def decode_bmp_pixels(payload: bytes | None) -> np.ndarray | None:
    """REAL uncompressed-BMP pixel decode: BITMAPINFOHEADER (or newer),
    24/32 bpp BI_RGB, 4-byte row stride, bottom-up (or top-down when
    height is negative), BGR(A) → RGB. Returns H×W×3 uint8; other BMP
    variants return None."""
    p = payload or b""
    if p[:2] != b"BM" or len(p) < 34:
        return None
    (data_off,) = struct.unpack("<I", p[10:14])
    (dib,) = struct.unpack("<I", p[14:18])
    if dib < 40:
        return None  # OS/2 core headers carry no compression field
    w, h = struct.unpack("<ii", p[18:26])
    bpp, (comp,) = struct.unpack("<H", p[28:30])[0], struct.unpack("<I", p[30:34])
    if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        return None
    top_down, h = h < 0, abs(h)
    nb = bpp // 8
    stride = ((bpp * w + 31) // 32) * 4
    if len(p) < data_off + h * stride:
        return None
    rows = np.frombuffer(
        p, dtype=np.uint8, count=h * stride, offset=data_off
    ).reshape(h, stride)
    px = rows[:, : w * nb].reshape(h, w, nb)
    if not top_down:
        px = px[::-1]
    return px[:, :, 2::-1].copy()  # BGR(A) → RGB, drop alpha


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> list[int] | None:
    """GIF-variant LZW (LSB-first bit packing, dynamic code width 3→12
    bits, clear/end codes) — the spec's decompressor, appendix F of
    GIF89a. Returns pixel indices or None on a corrupt stream."""
    if not 2 <= min_code_size <= 11:
        return None
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    base = {i: (i,) for i in range(clear)}
    table = dict(base)
    next_code = end + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    bitpos, total_bits = 0, len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < max_pixels:
        byte_i, bit_o = divmod(bitpos, 8)
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> bit_o) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size = min_code_size + 1
            table = dict(base)
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + (prev[0],)  # the KwKwK special case
        else:
            return None
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        out.extend(entry)
        prev = entry
    return out


# GIF interlace passes: (start row, step)
_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_pixels(payload: bytes | None) -> np.ndarray | None:
    """REAL GIF first-frame decode with stdlib only: logical screen +
    color tables by struct parsing, pixel indices through the
    pure-Python LZW decompressor, optional interlace row reordering →
    H×W×3 uint8. Animation frames beyond the first and transparency
    compositing are out of scope (frame fan-out belongs to the video
    path); corrupt streams return None."""
    p = payload or b""
    if p[:6] not in (b"GIF87a", b"GIF89a") or len(p) < 13:
        return None
    flags = p[10]
    off = 13
    gct = None
    if flags & 0x80:
        n = 2 ** ((flags & 0x07) + 1)
        if len(p) < off + 3 * n:
            return None
        gct = np.frombuffer(p, np.uint8, count=3 * n, offset=off).reshape(-1, 3)
        off += 3 * n
    while off < len(p):
        b0 = p[off]
        if b0 == 0x21:  # extension: label, then sub-blocks to a 0 terminator
            off += 2
            while off < len(p) and p[off] != 0:
                off += 1 + p[off]
            off += 1
        elif b0 == 0x2C:  # image descriptor
            if len(p) < off + 10:
                return None
            _, _, iw, ih, iflags = struct.unpack("<HHHHB", p[off + 1 : off + 10])
            off += 10
            table = gct
            if iflags & 0x80:
                n = 2 ** ((iflags & 0x07) + 1)
                if len(p) < off + 3 * n:
                    return None
                table = np.frombuffer(p, np.uint8, count=3 * n, offset=off).reshape(-1, 3)
                off += 3 * n
            if table is None or iw == 0 or ih == 0 or off >= len(p):
                return None
            min_code_size = p[off]
            off += 1
            data = bytearray()
            while off < len(p) and p[off] != 0:
                ln = p[off]
                data += p[off + 1 : off + 1 + ln]
                off += 1 + ln
            indices = _lzw_decode(bytes(data), min_code_size, iw * ih)
            if indices is None or len(indices) < iw * ih:
                return None
            idx = np.asarray(indices[: iw * ih], dtype=np.int32).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: stored rows are in pass order
                order = [r for start, step in _GIF_PASSES for r in range(start, ih, step)]
                out = np.empty_like(idx)
                out[order] = idx
                idx = out
            if int(idx.max(initial=0)) >= len(table):
                return None
            return table[idx]
        elif b0 == 0x3B:  # trailer
            break
        else:
            return None
    return None


def decode_gif_frames(
    payload: bytes | None,
    max_frames: int = 256,
    max_pixels: int = 16_777_216,
    max_total_bytes: int = 134_217_728,
    every_n: int = 1,
) -> list[np.ndarray] | None:
    """REAL animated-GIF decode: every frame composited onto the logical
    screen per the GIF89a animation model — graphic-control extensions
    (transparency index, disposal method), frame rectangles at offsets,
    local color tables, interlacing — using the same pure-Python LZW
    core as the single-frame path. Returns a list of H×W×3 uint8 arrays
    (one per frame, already composited), or None for corrupt/non-GIF
    payloads. Disposal methods: 0/1 leave, 2 restore background,
    3 restore previous (snapshot).

    ``max_pixels`` bounds the DECLARED logical screen (a few header
    bytes can claim a 65535×65535 canvas — ~12.9 GB before any frame
    data is read; a bad blob must not OOM an executor). The RETAINED
    frame list is independently bounded by ``max_total_bytes``: a
    few-KB GIF declaring a large screen plus 256 tiny frame rects would
    otherwise expand to ``max_frames × screen`` full-canvas copies
    (~12 GB at the old defaults). The retained-frame cap is
    ``min(max_frames, max_total_bytes // (sw*sh*3))`` — long animations
    on large canvases truncate rather than OOM. ``every_n`` retains
    every n-th composited frame (frames in between are composited onto
    the canvas for correctness but never copied out), so callers that
    sample — :func:`sample_video_frames` — pay memory only for the
    frames they keep."""
    try:
        return _decode_gif_frames(
            payload or b"", max_frames, max_pixels, max_total_bytes, every_n
        )
    except Exception:
        # Truncated/corrupt containers must yield None, never propagate
        # (same contract as every decoder in this module).
        return None


def _decode_gif_frames(
    p: bytes, max_frames: int, max_pixels: int, max_total_bytes: int,
    every_n: int,
) -> list[np.ndarray] | None:
    if p[:6] not in (b"GIF87a", b"GIF89a") or len(p) < 13:
        return None
    sw, sh = struct.unpack("<HH", p[6:10])
    flags, bg_idx = p[10], p[11]
    if sw == 0 or sh == 0 or sw * sh > max_pixels:
        return None
    every_n = max(1, every_n)
    # Retained-output budget: never hold more than max_total_bytes of
    # composited frames, whatever max_frames says.
    frame_cap = min(max_frames, max(1, max_total_bytes // (sw * sh * 3)))
    off = 13
    gct = None
    if flags & 0x80:
        n = 2 ** ((flags & 0x07) + 1)
        if len(p) < off + 3 * n:
            return None
        gct = np.frombuffer(p, np.uint8, count=3 * n, offset=off).reshape(-1, 3)
        off += 3 * n
    if gct is not None and bg_idx < len(gct):
        canvas = np.tile(gct[bg_idx], (sh, sw, 1)).astype(np.uint8)
    else:
        canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    bg_canvas = canvas.copy()
    frames: list[np.ndarray] = []
    transparent_idx: int | None = None
    disposal = 0
    seen = 0  # composited frames, including those every_n skips
    while off < len(p) and len(frames) < frame_cap:
        b0 = p[off]
        if b0 == 0x21:  # extension
            if off + 2 > len(p):
                return None
            label = p[off + 1]
            off += 2
            if label == 0xF9 and off + 4 < len(p) and p[off] >= 4:  # GCE
                gce_flags = p[off + 1]
                disposal = (gce_flags >> 2) & 0x07
                transparent_idx = p[off + 4] if gce_flags & 0x01 else None
            while off < len(p) and p[off] != 0:
                off += 1 + p[off]
            off += 1
        elif b0 == 0x2C:  # image descriptor
            if len(p) < off + 10:
                return None
            ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", p[off + 1 : off + 10])
            off += 10
            table = gct
            if iflags & 0x80:
                n = 2 ** ((iflags & 0x07) + 1)
                if len(p) < off + 3 * n:
                    return None
                table = np.frombuffer(p, np.uint8, count=3 * n, offset=off).reshape(-1, 3)
                off += 3 * n
            if table is None or iw == 0 or ih == 0 or off >= len(p):
                return None
            if ix + iw > sw or iy + ih > sh:
                return None
            min_code_size = p[off]
            off += 1
            data = bytearray()
            while off < len(p) and p[off] != 0:
                ln = p[off]
                data += p[off + 1 : off + 1 + ln]
                off += 1 + ln
            off += 1  # block terminator
            indices = _lzw_decode(bytes(data), min_code_size, iw * ih)
            if indices is None or len(indices) < iw * ih:
                return None
            idx = np.asarray(indices[: iw * ih], dtype=np.int32).reshape(ih, iw)
            if iflags & 0x40:
                order = [r for start, step in _GIF_PASSES for r in range(start, ih, step)]
                out = np.empty_like(idx)
                out[order] = idx
                idx = out
            if int(idx.max(initial=0)) >= len(table):
                return None
            prev_canvas = canvas.copy() if disposal == 3 else None
            region = canvas[iy : iy + ih, ix : ix + iw]
            if transparent_idx is not None:
                opaque = idx != transparent_idx
                region[opaque] = table[idx][opaque]
            else:
                region[:] = table[idx]
            if seen % every_n == 0:
                frames.append(canvas.copy())
            seen += 1
            if disposal == 2:
                canvas[iy : iy + ih, ix : ix + iw] = bg_canvas[
                    iy : iy + ih, ix : ix + iw
                ]
            elif disposal == 3 and prev_canvas is not None:
                canvas = prev_canvas
            disposal = 0
            transparent_idx = None
        elif b0 == 0x3B:
            break
        else:
            return None
    return frames or None


def decode_image_pixels(payload: bytes | None) -> np.ndarray | None:
    """Dispatch on the real container header: PNG, GIF, uncompressed
    BMP, and baseline JPEG (SOF0/SOF1 — operators/jpeg.py's stdlib
    Huffman+IDCT decoder) all decode to pixels with no codec library.
    Progressive JPEG (SOF2) decodes fully since r6 (multi-scan
    spectral selection + successive approximation, operators/jpeg.py);
    arithmetic-coded JPEG and corrupt payloads → None."""
    hdr = parse_image_header(payload)
    if hdr is None:
        return None
    if hdr[0] == "png":
        return decode_png_pixels(payload)
    if hdr[0] == "gif":
        return decode_gif_pixels(payload)
    if hdr[0] == "bmp":
        return decode_bmp_pixels(payload)
    if hdr[0] == "jpeg":
        from .jpeg import decode_jpeg_pixels

        return decode_jpeg_pixels(payload)
    return None


def _block_mean(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Float block-average pooling via two ``reduceat`` passes — exact
    mean over each output cell's source block, no codec library.
    Upsampling repeats source pixels (blocks of size 1). Shared by
    :func:`downsample_pixels` (uint8 thumbnails) and :func:`phash64`
    (which must stay float: rounding to uint8 before the DCT would
    quantize away low-contrast structure). Works on 2-D (gray) and
    3-D (channel-last) arrays."""
    h, w = arr.shape[:2]
    r_edges = (np.arange(out_h) * h) // out_h
    c_edges = (np.arange(out_w) * w) // out_w
    pooled = np.add.reduceat(
        np.add.reduceat(arr.astype(np.float64), r_edges, axis=0), c_edges, axis=1
    )
    r_sizes = np.diff(np.append(r_edges, h)).clip(min=1)
    c_sizes = np.diff(np.append(c_edges, w)).clip(min=1)
    counts = np.outer(r_sizes, c_sizes)
    if arr.ndim == 3:
        counts = counts[:, :, None]
    return pooled / counts


def downsample_pixels(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Block-average resize (area interpolation) to uint8 — see
    :func:`_block_mean` for the pooling."""
    return np.rint(_block_mean(arr, out_h, out_w)).astype(np.uint8)


def _to_rgb(arr: np.ndarray) -> np.ndarray:
    """Gray / gray+alpha / RGBA → RGB (alpha dropped, gray replicated)."""
    c = arr.shape[2]
    if c >= 3:
        return arr[:, :, :3]
    return np.repeat(arr[:, :, :1], 3, axis=2)


def _pixel_feature(arr: np.ndarray) -> list[float]:
    """8-dim content descriptor from REAL pixels: per-channel means and
    stds (RGB, [0,1]-scaled), aspect ratio (min/max), channel count /4."""
    rgb = _to_rgb(arr).astype(np.float64) / 255.0
    h, w = arr.shape[:2]
    means = rgb.mean(axis=(0, 1))
    stds = rgb.std(axis=(0, 1))
    return [
        *(float(m) for m in means),
        *(float(s) for s in stds),
        min(h, w) / max(h, w),
        arr.shape[2] / 4.0,
    ]


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature vector derived from content bytes."""
    h = hashlib.sha1(payload or b"").digest()
    return [h[i] / 255.0 for i in range(dim)]


def extract_image_features(
    media: DataFrame, deterministic_fake: bool = True, dim: int = 8
) -> DataFrame:
    """payload → (sha1, n_bytes, feature[dim]) via ``mapInPandas``.

    With ``deterministic_fake=False`` the feature is computed from REAL
    decoded pixels (:func:`decode_image_pixels` — PNG and uncompressed
    BMP, stdlib-only): per-channel means/stds + shape descriptors.
    Formats whose entropy coding needs absent codec libraries (JPEG,
    GIF) and corrupt payloads yield a NULL feature for that row — a bad
    blob must not kill a 100 TB scan. The default keeps the
    byte-derived deterministic fake (stable across environments, used
    by the plumbing tests; a model-embedding production body would slot
    in the same way, e.g. ``model(np.asarray(img))`` over the decoded
    array).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if deterministic_fake:
                feats = [_fake_feature(p, dim) for p in payloads]
            else:
                decoded = [decode_image_pixels(p) for p in payloads]
                feats = [
                    _pixel_feature(a) if a is not None else None for a in decoded
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sha1": [
                        hashlib.sha1(p or b"").hexdigest() for p in payloads
                    ],
                    "n_bytes": [len(p or b"") for p in payloads],
                    "feature": feats,
                }
            )

    img = media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    )
    return img.mapInPandas(run, IMAGE_FEATURE_SCHEMA)


THUMBNAIL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("thumb_h", T.IntegerType(), True),
        T.StructField("thumb_w", T.IntegerType(), True),
        T.StructField("rgb", T.BinaryType(), True),  # row-major H×W×3
    ]
)


def image_thumbnails(media: DataFrame, out_h: int = 8, out_w: int = 8) -> DataFrame:
    """payload → fixed-size RGB thumbnail (raw row-major bytes) by REAL
    decode + block-average resize; undecodable rows get NULL dims/bytes.
    Same Arrow ``mapInPandas`` shape as the feature extractor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hs, ws, blobs = [], [], []
            for p in pdf["payload"]:
                arr = decode_image_pixels(p)
                if arr is None:
                    hs.append(None), ws.append(None), blobs.append(None)
                else:
                    thumb = downsample_pixels(_to_rgb(arr), out_h, out_w)
                    hs.append(out_h), ws.append(out_w)
                    blobs.append(thumb.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "thumb_h": pd.array(hs, dtype="Int32"),
                    "thumb_w": pd.array(ws, dtype="Int32"),
                    "rgb": blobs,
                }
            )

    img = media.filter(F.col("kind") == "image").select("media_id", "payload")
    return img.mapInPandas(run, THUMBNAIL_SCHEMA)


def sample_video_frames(
    media: DataFrame, every_n: int = 10, deterministic_fake: bool = True
) -> DataFrame:
    """video payload → rows of sampled frames (one row per frame;
    ``frame_idx`` is the source frame number, ``frame_payload`` the raw
    row-major H×W×3 RGB bytes).

    REAL decode path (``deterministic_fake=False``): animated GIF —
    the one video-shaped format stdlib can carry — decodes fully via
    :func:`decode_gif_frames` (LZW + GIF89a compositing: transparency,
    disposal, frame rects), then every ``every_n``-th composited frame
    is emitted. Container formats whose codecs need absent libraries
    (MP4/H.264, VP9, AV1…) emit zero rows for that media_id — skipped,
    not fatal; the production body swaps in pyav::

        container = av.open(io.BytesIO(payload))
        for i, frame in enumerate(container.decode(video=0)):
            if i % every_n == 0: yield frame.to_rgb().planes...

    The default stub slices the payload into ``every_n`` pseudo-frames
    so the fan-out shape (1 row → N rows) is exercised by the plumbing
    tests without any decodable media.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = payload or b""
                if deterministic_fake:
                    step = max(1, len(p) // every_n)
                    for idx, off in enumerate(range(0, len(p), step)):
                        out["media_id"].append(mid)
                        out["frame_idx"].append(idx)
                        out["frame_payload"].append(p[off : off + step])
                    continue
                # Sampling is pushed INTO the decoder: skipped frames
                # are composited (animation state stays correct) but
                # never copied out, so memory is paid only for frames
                # this row actually emits.
                frames = decode_gif_frames(p, every_n=max(1, every_n))
                if frames is None:
                    continue  # undecodable codec: skip, never kill the scan
                for i, frame in enumerate(frames):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i * max(1, every_n))
                    out["frame_payload"].append(frame.tobytes())
            yield pd.DataFrame(out)

    vid = media.filter(F.col("kind") == "video").select("media_id", "payload")
    return vid.mapInPandas(run, FRAME_SCHEMA)


def decode_wav_samples(payload: bytes | None) -> tuple[np.ndarray, int] | None:
    """REAL WAV decode with stdlib struct parsing: RIFF chunk walk →
    fmt (PCM or IEEE-float) + data → (samples[n, channels] float64 in
    [-1, 1], sample_rate). Supported encodings: u8 / s16 / s32 PCM and
    f32 — the uncompressed cases; compressed codecs (MP3, AAC, μ-law)
    need libraries not in this container → None."""
    p = payload or b""
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    fmt = data = None
    off = 12
    while off + 8 <= len(p):
        cid, ln = p[off : off + 4], struct.unpack("<I", p[off + 4 : off + 8])[0]
        body = p[off + 8 : off + 8 + ln]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        off += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if channels == 0 or rate == 0:
        return None
    if audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 16:
        x = np.frombuffer(data[: len(data) // 2 * 2], "<i2").astype(np.float64) / 32768.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(data[: len(data) // 4 * 4], "<i4").astype(np.float64) / 2147483648.0
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(data[: len(data) // 4 * 4], "<f4").astype(np.float64)
    else:
        return None
    n = len(x) // channels
    if n == 0:
        return None
    return x[: n * channels].reshape(n, channels), int(rate)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("zero_crossing_rate", T.DoubleType(), True),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """payload → signal-level features from REAL decoded WAV samples
    (sample rate, duration, RMS, peak, zero-crossing rate of the
    channel-mean signal). Non-WAV/compressed/corrupt rows → NULLs, same
    per-row error containment as the image path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {k.name: [] for k in AUDIO_FEATURE_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                cols["media_id"].append(mid)
                decoded = decode_wav_samples(payload)
                if decoded is None:
                    for k in (
                        "sample_rate", "channels", "n_samples", "duration_ms",
                        "rms", "peak", "zero_crossing_rate",
                    ):
                        cols[k].append(None)
                    continue
                x, rate = decoded
                mono = x.mean(axis=1)
                cols["sample_rate"].append(rate)
                cols["channels"].append(x.shape[1])
                cols["n_samples"].append(x.shape[0])
                cols["duration_ms"].append(1000.0 * x.shape[0] / rate)
                cols["rms"].append(float(np.sqrt(np.mean(mono**2))))
                cols["peak"].append(float(np.abs(mono).max()))
                zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if len(mono) > 1 else 0.0
                cols["zero_crossing_rate"].append(zc)
            yield pd.DataFrame(
                {
                    "media_id": cols["media_id"],
                    "sample_rate": pd.array(cols["sample_rate"], dtype="Int32"),
                    "channels": pd.array(cols["channels"], dtype="Int32"),
                    "n_samples": pd.array(cols["n_samples"], dtype="Int64"),
                    "duration_ms": pd.array(cols["duration_ms"], dtype="Float64"),
                    "rms": pd.array(cols["rms"], dtype="Float64"),
                    "peak": pd.array(cols["peak"], dtype="Float64"),
                    "zero_crossing_rate": pd.array(
                        cols["zero_crossing_rate"], dtype="Float64"
                    ),
                }
            )

    aud = media.filter(F.col("kind") == "audio").select("media_id", "payload")
    return aud.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


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


# ---------------------------------------------------------------------------
# Perceptual image dedup (pHash)
# ---------------------------------------------------------------------------

_PHASH_DCT = None


def _phash_dct_matrix() -> np.ndarray:
    """Orthonormal 32×32 DCT-II basis (same construction as jpeg._A at
    8×8), cached — the pHash transform is two matrix products."""
    global _PHASH_DCT
    if _PHASH_DCT is None:
        n = 32
        A = np.zeros((n, n))
        for u in range(n):
            cu = (1 / np.sqrt(2)) if u == 0 else 1.0
            for x in range(n):
                A[u, x] = cu * np.sqrt(2.0 / n) * np.cos(
                    (2 * x + 1) * u * np.pi / (2 * n)
                )
        _PHASH_DCT = A
    return _PHASH_DCT


def phash64(arr: np.ndarray) -> int:
    """64-bit DCT perceptual hash (the public pHash scheme, as in the
    pHash.org / imagehash formulation): grayscale → 32×32 block-average
    → 2D DCT-II → the top-left 8×8 low-frequency block → each bit is
    that coefficient vs the MEDIAN of the 63 non-DC coefficients (DC is
    pure brightness; excluding it from the median makes the hash
    brightness-shift tolerant, the property LAION-style image dedup
    relies on). Returns a SIGNED 64-bit int (bit 63 rides the sign) so
    the value drops straight into a Spark LongType column and
    ``dedup.simhash_candidate_pairs``' pigeonhole machinery."""
    gray = _to_rgb(arr).astype(np.float64).mean(axis=2)
    small = _block_mean(gray, 32, 32)
    A = _phash_dct_matrix()
    coef = (A @ small @ A.T)[:8, :8].flatten()
    med = np.median(coef[1:])
    bits = coef > med
    v = 0
    for i in range(64):
        if bits[i]:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def image_phashes(media: DataFrame) -> DataFrame:
    """(media_id, phash): perceptual hash per decodable image row;
    undecodable payloads get NULL. Same Arrow ``mapInPandas`` shape as
    the other decoders — per-row CPU, no shuffle."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("phash", T.LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                arr = decode_image_pixels(p)
                out.append(None if arr is None else phash64(arr))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": pd.array(out, dtype="Int64"),
                }
            )

    img = media.filter(F.col("kind") == "image").select("media_id", "payload")
    return img.mapInPandas(run, schema)


def image_neardup_pairs(
    media: DataFrame,
    max_hamming: int = 6,
    chunks: int = 8,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Perceptual near-duplicate image pairs (id1, id2, hamming ≤
    ``max_hamming``): pHash fingerprints fed through the SAME
    pigeonhole candidate machinery as text SimHash
    (``dedup.simhash_candidate_pairs`` — any pair within hamming ≤
    chunks−1 is guaranteed a shared exact chunk; ``max_bucket`` bounds
    hot-bucket volume). Unlike text SimHash there is no second verify
    stage: pHash hamming IS the similarity verdict (the public pHash
    dedup contract — re-encodes, mild noise, brightness shifts land
    within a few bits; distinct images average ~32). The decode is the
    expensive stage and runs once; candidates join on 8-bit chunk
    keys. Defaults lean precision (hamming ≤ 6, radius-7 guarantee);
    recall-leaning dedup uses ``max_hamming=10, chunks=11`` — the
    pigeonhole guarantee needs chunks ≥ max_hamming+1."""
    from . import dedup as dd

    fps = image_phashes(media).filter(F.col("phash").isNotNull()).select(
        F.col("media_id").alias("id"), F.col("phash").alias("sh64")
    )
    fps = fps.localCheckpoint(eager=False)
    return dd.simhash_candidate_pairs(fps, max_hamming, chunks, max_bucket)


# ---------------------------------------------------------------------------
# Perceptual audio dedup (spectral band signature)
# ---------------------------------------------------------------------------

def _pack_bits_signed(bits) -> int:
    """64 bools → signed 64-bit int (bit 63 rides the sign) — shared
    packing for the perceptual fingerprints feeding LongType columns."""
    v = 0
    for i in range(64):
        if bits[i]:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def audio_fingerprint64(samples: np.ndarray, rate: int) -> int | None:
    """64-bit spectral band signature in the Haitsma–Kalker (2002,
    "A Highly Robust Audio Fingerprinting System") family, collapsed
    to clip level: mono mixdown → Welch-averaged power spectrum over
    ~32 Hann-windowed frames → 65 log-spaced bands on an ABSOLUTE
    50 Hz–4 kHz axis (absolute, so re-encodes at different sample
    rates land in the same bands) → bit b = E_b > E_{b+1} (the
    adjacent-band energy-difference sign). Comparing energies makes
    the signature exactly volume-invariant (scaling every energy by
    c² preserves every comparison) and robust to quantization/noise;
    collapsing time trades HK's per-frame granularity for one
    LongType value per clip — the right grain for corpus-level
    near-dup of re-encoded clips. Returns None for clips too short to
    frame (< 256 samples)."""
    mono = samples.mean(axis=1)
    if len(mono) < 256:
        return None
    n_frames = min(32, len(mono) // 64)
    flen = len(mono) // n_frames
    edges = np.geomspace(50.0, 4000.0, 66)
    band_e = np.zeros(65)
    for i in range(n_frames):
        seg = mono[i * flen : (i + 1) * flen]
        w = np.hanning(len(seg))
        ps = np.abs(np.fft.rfft(seg * w)) ** 2
        freqs = np.fft.rfftfreq(len(seg), 1.0 / rate)
        idx = np.searchsorted(edges, freqs, side="right") - 1
        valid = (idx >= 0) & (idx < 65)
        band_e += np.bincount(idx[valid], weights=ps[valid], minlength=65)
    return _pack_bits_signed(band_e[:-1] > band_e[1:])


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """(media_id, afp): spectral fingerprint per decodable audio row;
    undecodable/too-short payloads get NULL. Arrow ``mapInPandas``,
    per-row CPU, no shuffle."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("afp", T.LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                dec = decode_wav_samples(p)
                out.append(
                    None if dec is None else audio_fingerprint64(*dec)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "afp": pd.array(out, dtype="Int64"),
                }
            )

    aud = media.filter(F.col("kind") == "audio").select("media_id", "payload")
    return aud.mapInPandas(run, schema)


def audio_neardup_pairs(
    media: DataFrame,
    max_hamming: int = 6,
    chunks: int = 8,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Perceptual near-duplicate audio pairs (id1, id2, hamming ≤
    ``max_hamming``) — the audio twin of :func:`image_neardup_pairs`,
    through the same ``dedup.simhash_candidate_pairs`` pigeonhole
    machinery (guarantee radius ``chunks − 1``; hamming is the
    verdict). Decode + FFT run once per clip."""
    from . import dedup as dd

    fps = audio_fingerprints(media).filter(F.col("afp").isNotNull()).select(
        F.col("media_id").alias("id"), F.col("afp").alias("sh64")
    )
    fps = fps.localCheckpoint(eager=False)
    return dd.simhash_candidate_pairs(fps, max_hamming, chunks, max_bucket)
