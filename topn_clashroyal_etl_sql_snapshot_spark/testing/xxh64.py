"""Pure-Python twin of Spark SQL's ``xxhash64(...)`` expression.

Implements the public xxHash64 algorithm (Yann Collet's xxHash, BSD-2;
spec: github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) plus the
Spark-side conventions of ``org.apache.spark.sql.catalyst.expressions.
XxHash64``:

- a multi-argument call CHAINS: ``h = 42`` (Spark's default seed), then
  ``h = hash(arg_i, seed=h)`` left to right;
- ``IntegerType`` hashes as its 4-byte little-endian form, ``LongType``
  as its 8-byte little-endian form, ``StringType`` as its UTF-8 bytes;
- NULL arguments leave the running hash unchanged;
- the result is reinterpreted as a SIGNED 64-bit long.

This gives tests an engine-independent oracle for every xxhash64-derived
operator — MinHash seeded mins (operators/dedup.py:300), LSH band
buckets, and hash-split sampling (operators/sampling.py) — the pieces a
SQL oracle cannot re-compute (DuckDB's ``hash()`` is a different
function). Shares no code with the Spark plans: the engine side is
column algebra compiled by Catalyst; this is arithmetic on Python ints.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_DEFAULT_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Reference xxHash64 of a byte string (unsigned 64-bit result)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def _to_unsigned(h: int) -> int:
    return h & _M


def _encode(dtype: str, value) -> bytes:
    if dtype == "int":
        return int(value).to_bytes(4, "little", signed=True)
    if dtype == "long":
        return int(value).to_bytes(8, "little", signed=True)
    if dtype == "string":
        return str(value).encode("utf-8")
    if dtype == "binary":
        return bytes(value)
    raise ValueError(f"unsupported dtype for xxhash64 twin: {dtype}")


def spark_xxhash64(values, seed: int = SPARK_DEFAULT_SEED) -> int:
    """Twin of ``F.xxhash64(*cols)``: ``values`` is a sequence of
    ``(dtype, value)`` with dtype in {int, long, string, binary}; None
    values are skipped (Spark's null rule). Returns a SIGNED long,
    matching the LongType column Spark produces."""
    h = _to_unsigned(seed)
    for dtype, value in values:
        if value is None:
            continue
        h = xxh64_bytes(_encode(dtype, value), h)
    return _to_signed(h)
