"""Compressed-column stage (operators/compression.py): sniffing parity
with stdlib magic bytes, round-trips per codec, corrupt → NULL, and the
zip-bomb output bound."""

from __future__ import annotations

import bz2
import gzip
import lzma
import zlib

import pytest
from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.operators import compression as cz


def _rows():
    text = "the quick brown fox jumps over the lazy dog " * 20
    raw = text.encode()
    return text, [
        (1, "gzip", bytearray(gzip.compress(raw))),
        (2, "zlib", bytearray(zlib.compress(raw, 6))),
        (3, "bz2", bytearray(bz2.compress(raw))),
        (4, "xz", bytearray(lzma.compress(raw))),
        (5, "none", bytearray(raw)),
        (6, "none", None),  # NULL payload
        (7, "gzip", bytearray(b"\x1f\x8b" + b"corrupt!")),
        (8, "zstd", bytearray(b"\x28\xb5\x2f\xfd" + b"\x00" * 16)),
    ]


def test_detect_and_decompress_roundtrip(spark):
    text, rows = _rows()
    df = spark.createDataFrame(rows, "doc_id long, codec string, payload binary")
    det = {
        r["doc_id"]: r["d"]
        for r in df.select(
            "doc_id", cz.detect_compression(F.col("payload")).alias("d")
        ).collect()
    }
    assert det[1] == "gzip" and det[2] == "zlib" and det[3] == "bz2"
    assert det[4] == "xz" and det[5] == "none" and det[6] is None
    assert det[7] == "gzip" and det[8] == "zstd"

    got = {
        r["doc_id"]: r["text"] for r in cz.decompress_text(df).collect()
    }
    for i in (1, 2, 3, 4, 5):
        assert got[i] == text, i
    assert got[6] is None          # NULL in, NULL out
    assert got[7] is None          # corrupt gzip → NULL, not a crash
    # zstd: NULL either way — no binding in this container, and with a
    # binding auto-wired this magic+zeros frame is junk and NULLs too
    assert got[8] is None


def test_zip_bomb_output_is_bounded(spark):
    # 64 MB of zeros compresses to ~64 KB; the stage must inflate at
    # most max_bytes, not the whole bomb.
    bomb = gzip.compress(b"\x00" * (64 * 1024 * 1024))
    assert len(bomb) < 200_000
    df = spark.createDataFrame(
        [(1, bytearray(bomb))], "doc_id long, payload binary"
    )
    out = cz.decompress_text(df, max_bytes=1024).collect()[0]["text"]
    assert out is not None and len(out) == 1024


def test_multi_member_gzip_decodes_every_member():
    """Concatenated gzip members (WARC-style payloads) must decode to
    the concatenation of every member, not silently stop at the first —
    and the cumulative max_bytes bound must still hold across members."""
    a, b, c = b"first-member|" * 10, b"second-member|" * 10, b"third|" * 10
    blob = gzip.compress(a) + gzip.compress(b) + gzip.compress(c)
    assert cz._decompress_one(blob, 1 << 20) == a + b + c
    # bound lands mid-second-member: output is exactly max_bytes
    bound = len(a) + 5
    assert cz._decompress_one(blob, bound) == (a + b)[:bound]
    # trailing garbage after the last member: members before it decode
    trailing = gzip.compress(a) + b"\x1f\x8bgarbage"
    assert cz._decompress_one(trailing, 1 << 20) == a


def test_detect_is_codegen_column_algebra(spark):
    import contextlib
    import io

    df = spark.createDataFrame([(1, bytearray(b"x"))], "i long, payload binary")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.select(cz.detect_compression(F.col("payload"))).explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pluggable_zstd_codec(spark):
    """The codecs hook: a caller-supplied zstd decompressor routes by
    the sniffed magic, round-trips, is bounded by max_bytes, and its
    exceptions NULL the row — while the stdlib default for zstd stays
    NULL and other formats keep their stdlib path."""
    import zlib as _zlib

    magic = b"\x28\xb5\x2f\xfd"

    # fake zstd container for the test: magic + zlib body (the real
    # plug-in would be the zstandard library's decompressobj)
    def fake_zstd(payload, max_bytes):
        return _zlib.decompressobj().decompress(payload[4:], max_bytes)

    body = b"zstd framed text " * 20
    rows = [
        (1, magic + _zlib.compress(body)),           # fake-zstd frame
        (2, gzip.compress(b"still gzip")),           # untouched path
        (3, magic + b"\x00corrupt"),                 # codec raises -> NULL
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    # default: zstd is detected but yields NULL
    base = {
        r["doc_id"]: r["text"]
        for r in cz.decompress_text(df).collect()
    }
    assert base[1] is None and base[2] == "still gzip"

    got = {
        r["doc_id"]: r["text"]
        for r in cz.decompress_text(
            df, codecs={"zstd": fake_zstd}
        ).collect()
    }
    assert got[1] == body.decode()
    assert got[2] == "still gzip"
    assert got[3] is None
    assert got[4] is None

    # the override's output is still truncated at max_bytes
    capped = {
        r["doc_id"]: r["text"]
        for r in cz.decompress_text(
            df, codecs={"zstd": lambda p, mx: _zlib.decompress(p[4:])},
            max_bytes=10,
        ).collect()
    }
    assert capped[1] == body.decode()[:10]


@pytest.mark.skipif(
    cz._ZSTD_DECODE is None,
    reason="no zstd binding (zstandard/pyzstd) in this container",
)
def test_autowired_zstd_roundtrip(spark):
    """When a zstd binding IS importable, real zstd frames decode by
    default (r8 verdict item 6) — no codecs hook needed — and the
    output stays bounded at max_bytes like every other codec path.
    importorskip (not a bare import): in a pyzstd-only environment the
    skipif gate passes but ``zstandard`` still isn't importable — the
    test should skip, not error (r9 advisor finding)."""
    zstandard = pytest.importorskip("zstandard")

    body = b"zstd native frame " * 50
    frame = zstandard.ZstdCompressor().compress(body)
    df = spark.createDataFrame(
        [(1, bytearray(frame))], "doc_id int, payload binary"
    )
    got = {r["doc_id"]: r["text"] for r in cz.decompress_text(df).collect()}
    assert got[1] == body.decode()
    capped = {
        r["doc_id"]: r["text"]
        for r in cz.decompress_text(df, max_bytes=10).collect()
    }
    assert capped[1] == body.decode()[:10]


def test_autowired_dispatch_with_fake_binding(monkeypatch):
    """The auto-wired zstd dispatch in _decompress_one (sniff the zstd
    magic → call _ZSTD_DECODE → truncate at max_bytes) exercised
    WITHOUT a real binding, by monkeypatching the module decoder.
    Driver-side on purpose: executor Python workers re-import the
    module, so a monkeypatched global can never reach a Spark job —
    this pins the exact code path the auto-wire lands on (r9 advisor
    finding: the whole path shipped untested in binding-less
    containers)."""
    body = b"pretend this was zstd-compressed content " * 5
    calls = []

    def fake_decode(p, max_bytes):
        calls.append((bytes(p[:4]), max_bytes))
        return body[:max_bytes]

    monkeypatch.setattr(cz, "_ZSTD_DECODE", fake_decode)
    frame = b"\x28\xb5\x2f\xfd" + b"opaque-zstd-payload"
    out = cz._decompress_one(frame, max_bytes=1 << 20)
    assert out == body
    assert calls and calls[0][0] == b"\x28\xb5\x2f\xfd"
    # bounded output: the dispatch truncates even an over-long decode
    assert cz._decompress_one(frame, max_bytes=10) == body[:10]

    # and with the decoder absent, zstd payloads NULL (the documented
    # no-binding default), never crash
    monkeypatch.setattr(cz, "_ZSTD_DECODE", None)
    assert cz._decompress_one(frame, max_bytes=1 << 20) is None


def test_load_zstd_codec_pyzstd_branch(monkeypatch):
    """The pyzstd fallback branch of _load_zstd_codec, covered with a
    fake module (neither binding ships in this container): zstandard's
    import must fail, pyzstd's decompressor must be picked up, and the
    returned decoder must pass max_bytes through as pyzstd's bounded
    max_length argument."""
    import sys
    import types

    class _FakeDecompressor:
        def decompress(self, p, max_length):
            return (b"decoded:" + bytes(p))[:max_length]

    fake = types.ModuleType("pyzstd")
    fake.ZstdDecompressor = _FakeDecompressor
    # a None sys.modules entry makes `import zstandard` raise ImportError
    monkeypatch.setitem(sys.modules, "zstandard", None)
    monkeypatch.setitem(sys.modules, "pyzstd", fake)
    decode = cz._load_zstd_codec()
    assert decode is not None
    assert decode(b"xyz", 6) == b"decode"
    assert decode(b"xyz", 100) == b"decoded:xyz"


def test_load_zstd_codec_zstandard_branch(monkeypatch):
    """The preferred zstandard branch, same fake-module treatment: the
    returned decoder must stream-read at most max_bytes."""
    import io
    import sys
    import types

    class _FakeStreamDecompressor:
        def stream_reader(self, buf):
            return io.BytesIO(b"streamed:" + buf.read())

    fake = types.ModuleType("zstandard")
    fake.ZstdDecompressor = _FakeStreamDecompressor
    monkeypatch.setitem(sys.modules, "zstandard", fake)
    decode = cz._load_zstd_codec()
    assert decode is not None
    assert decode(b"abc", 8) == b"streamed"
    assert decode(b"abc", 100) == b"streamed:abc"
