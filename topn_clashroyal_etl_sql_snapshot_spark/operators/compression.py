"""Compressed document columns: sniff + decompress as a corpus stage.

Web-scale corpora routinely land with per-document compression (WARC
payloads, gzip'd JSONL bodies, zstd-framed records). Spark has no
built-in per-VALUE decompression function (its codecs work at file
level), so this is a legitimate Pandas-UDF stage — same justification
as the multimodal decoders: the payload is opaque bytes and the work
is per-row CPU.

Two pieces:

- :func:`detect_compression` — pure column algebra over magic bytes
  (gzip/zlib/bz2/xz/zstd), codegen, rides the scan. Use it to route or
  audit before paying Python for the decompress.
- :func:`decompress_text` — Arrow-batched ``mapInPandas`` decompress
  via stdlib ``gzip``/``zlib``/``bz2``/``lzma``. Corrupt or unknown
  payloads yield NULL for the row — a bad blob must not kill a 100 TB
  scan. Oversized decompressed output is truncated at ``max_bytes``
  (zip-bomb guard: a 1 KB gzip member can inflate to GBs).

zstd (now a dominant corpus container — HF datasets, OSCAR) is
detected but has no stdlib decompressor: by DEFAULT it yields NULL,
and the ``codecs`` hook lets the caller plug a decompressor in
(``{"zstd": lambda payload, max_bytes: ...}``) without this module
growing a dependency — the callable rides the closure to executors
like any Python UDF state.

No reference analog; training-pipeline extension surface.
"""

from __future__ import annotations

import bz2
import lzma
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def detect_compression(col: Column) -> Column:
    """Codec name from magic bytes: 'gzip' | 'zlib' | 'bz2' | 'xz' |
    'zstd' | 'none' (NULL input → NULL). Pure column algebra (hex
    prefix compare), so it runs inside the scan's codegen stage."""
    hex8 = F.upper(F.hex(F.substring(col, 1, 4)))
    first2 = F.substring(hex8, 1, 4)
    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(first2 == "1F8B", F.lit("gzip"))
        .when(F.substring(hex8, 1, 6) == "425A68", F.lit("bz2"))
        .when(F.substring(hex8, 1, 8) == "FD377A58", F.lit("xz"))
        .when(F.substring(hex8, 1, 8) == "28B52FFD", F.lit("zstd"))
        # zlib: 0x78 followed by a valid flag byte (the usual levels)
        .when(first2.isin("7801", "785E", "789C", "78DA"), F.lit("zlib"))
        .otherwise(F.lit("none"))
    )


def _sniff(p: bytes) -> str:
    """Python twin of :func:`detect_compression` for the UDF path."""
    if p[:2] == b"\x1f\x8b":
        return "gzip"
    if p[:3] == b"BZh":
        return "bz2"
    if p[:4] == b"\xfd7zX":
        return "xz"
    if p[:4] == b"\x28\xb5\x2f\xfd":
        return "zstd"
    if len(p) >= 2 and p[0] == 0x78 and p[1] in (0x01, 0x5E, 0x9C, 0xDA):
        return "zlib"
    return "none"


def _load_zstd_codec():
    """Auto-wire a zstd decoder when a binding exists on the cluster
    (r8 verdict item 6): try ``zstandard`` (the HF/OSCAR-ecosystem
    binding), then ``pyzstd``. Both paths are BOUNDED — at most
    ``max_bytes`` of output is ever materialized (stream_reader /
    max_length), same zip-bomb contract as the stdlib codecs. Returns
    None when neither binding imports, in which case zstd payloads
    NULL by default exactly as before (README "Known limits"); a
    caller-supplied ``codecs`` entry still wins either way."""
    try:
        import zstandard

        def _decode(p: bytes, max_bytes: int) -> bytes:
            import io

            reader = zstandard.ZstdDecompressor().stream_reader(
                io.BytesIO(p)
            )
            return reader.read(max_bytes)

        return _decode
    except ImportError:
        pass
    try:
        import pyzstd

        def _decode(p: bytes, max_bytes: int) -> bytes:
            return pyzstd.ZstdDecompressor().decompress(p, max_bytes)

        return _decode
    except ImportError:
        return None


_ZSTD_DECODE = _load_zstd_codec()


def _decompress_one(
    payload: bytes | None, max_bytes: int, codecs: dict | None = None
) -> bytes | None:
    """Bounded decompress: every codec path uses an incremental
    decompressor with ``max_length`` so a zip bomb allocates at most
    ``max_bytes`` — ``decompress(p)[:max_bytes]`` would inflate the
    whole bomb first and OOM before the slice. A ``codecs`` override
    for the sniffed format wins over the stdlib default; its
    exceptions NULL the row like any other corrupt payload (the
    caller's decompressor must not be able to kill the scan either)."""
    if payload is None:
        return None
    p = bytes(payload)
    if codecs:
        fmt = _sniff(p)
        if fmt in codecs:
            try:
                out = codecs[fmt](p, max_bytes)
            except Exception:
                return None
            return None if out is None else bytes(out)[:max_bytes]
    try:
        if p[:2] == b"\x1f\x8b":
            # Multi-member (concatenated) gzip is the norm for
            # WARC-style web payloads: decompress member after member,
            # keeping the cumulative output under max_bytes.
            out = bytearray()
            data = p
            first = True
            while data[:2] == b"\x1f\x8b" and len(out) < max_bytes:
                d = zlib.decompressobj(wbits=31)
                try:
                    out += d.decompress(data, max_bytes - len(out))
                except Exception:
                    if first:
                        raise  # corrupt first member → NULL (outer handler)
                    break  # corrupt LATER member: keep the decoded prefix
                first = False
                if not d.eof:
                    break  # member truncated by the bound (or by input)
                data = d.unused_data
            return bytes(out)
        if p[:3] == b"BZh":
            return bz2.BZ2Decompressor().decompress(p, max_bytes)
        if p[:4] == b"\xfd7zX":
            return lzma.LZMADecompressor().decompress(p, max_bytes)
        if p[:4] == b"\x28\xb5\x2f\xfd":
            if _ZSTD_DECODE is None:
                return None  # zstd: no binding importable here
            return bytes(_ZSTD_DECODE(p, max_bytes))[:max_bytes]
        if len(p) >= 2 and p[0] == 0x78 and p[1] in (0x01, 0x5E, 0x9C, 0xDA):
            return zlib.decompressobj().decompress(p, max_bytes)
        return p[:max_bytes]  # not compressed: pass through
    except Exception:
        return None  # corrupt member: NULL, never a task failure


def decompress_text(
    media: DataFrame,
    payload_col: str = "payload",
    out_col: str = "text",
    encoding: str = "utf-8",
    max_bytes: int = 16_777_216,
    codecs: dict | None = None,
) -> DataFrame:
    """Adds ``out_col``: the payload decompressed (codec sniffed per
    row) and decoded as ``encoding`` (errors replaced — a stray byte
    must not kill the row either). NULL on corrupt payloads — and on
    zstd unless the caller plugs a decompressor into ``codecs``
    (``{format: callable(payload, max_bytes) -> bytes|None}``, formats
    as named by :func:`detect_compression`; an override wins over the
    stdlib default for that format, and its output is still truncated
    at ``max_bytes``). If the input already has ``out_col`` it is
    REPLACED (decompressing into an existing ``text`` column is the
    natural call shape) — without this, the appended duplicate field
    would fail the mapInPandas schema check.

    Plan: ``mapInPandas`` preserving all other input columns —
    Arrow-batched, embarrassingly parallel, no shuffle."""
    kept = [f for f in media.schema if f.name != out_col]
    schema = T.StructType(kept + [T.StructField(out_col, T.StringType(), True)])
    kept_names = [f.name for f in kept]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decompressed = [
                _decompress_one(p, max_bytes, codecs) for p in pdf[payload_col]
            ]
            out = pdf[kept_names].copy()
            out[out_col] = [
                b.decode(encoding, errors="replace") if b is not None else None
                for b in decompressed
            ]
            yield out

    return media.mapInPandas(run, schema)
