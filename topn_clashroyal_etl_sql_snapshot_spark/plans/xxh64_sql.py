"""Spark's ``xxhash64`` bucket math, generated as DuckDB SQL.

The sampling/split family (``operators/sampling.py``) keys membership
on ``pmod(xxhash64(42L, key), buckets)``. To oracle those operators in
the driver's DuckDB harness, this module emits a CTE chain computing
the IDENTICAL value in pure SQL arithmetic:

- XXH64 of one 64-bit little-endian lane (the public xxHash spec /
  Spark's ``XXH64.hashLong``): acc = seed+P5+8; acc ^= rotl(lane*P2,
  31)*P1; acc = rotl(acc,27)*P1+P4; then the avalanche mix.
- Spark folds multi-argument ``xxhash64(42L, key)`` by chaining:
  ``hashLong(key, hashLong(42, 42))``. The inner hash is a constant,
  precomputed here (:data:`ACC0` bakes it into the first add).
- DuckDB has no wrapping 64-bit multiply (UBIGINT raises on overflow,
  HUGEINT is signed 128-bit and a 64×64 product overflows it), so each
  ``(a*b) mod 2⁶⁴`` splits ``a`` into 32-bit halves:
  ``(a_lo*b mod 2⁶⁴ + (a_hi*b mod 2³²)·2³²) mod 2⁶⁴`` — every
  intermediate < 2⁹⁶ fits HUGEINT. Rotations use the same disjoint
  decomposition; XORs/shifts run on UBIGINT (bit ops don't overflow).

The chain is validated lane-for-lane against ``F.xxhash64`` and the
pure-Python twin ``testing/xxh64.py`` in tests/test_sampling.py.
"""

from __future__ import annotations

_M = "18446744073709551616"  # 2^64
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261
_MASK = (1 << 64) - 1


def _mulmod(a: str, b: int) -> str:
    return (
        f"((({a}) % 4294967296) * {b}::HUGEINT % {_M} + "
        f"((({a}) // 4294967296) * {b} % 4294967296) * 4294967296) % {_M}"
    )


def _rotl(x: str, r: int) -> str:
    lo = 1 << (64 - r)
    return f"((({x}) % {lo}) * {1 << r} + ({x}) // {lo})"


def _xor(a: str, b: str) -> str:
    return f"CAST(xor(CAST({a} AS UBIGINT), CAST({b} AS UBIGINT)) AS HUGEINT)"


def _shr(a: str, n: int) -> str:
    return f"CAST(CAST({a} AS UBIGINT) >> {n} AS HUGEINT)"


def _py_rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _py_fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def hash_long(lane: int, seed: int) -> int:
    """Python twin of Spark's ``XXH64.hashLong`` (used to bake the
    seed-chain constant; independently re-verified by testing/xxh64.py)."""
    h = (seed + _P5 + 8) & _MASK
    h ^= (_py_rotl((lane * _P2) & _MASK, 31) * _P1) & _MASK
    h = (_py_rotl(h, 27) * _P1 + _P4) & _MASK
    return _py_fmix(h)


def hash_int(value: int, seed: int) -> int:
    """Python twin of Spark's ``XXH64.hashInt`` — the 4-byte-lane
    variant Spark applies to INT columns (length addend 4, the int
    zero-extended through ``& 0xFFFFFFFF``, rotl 23 with P1/P2/P3
    where hashLong uses 31/27 with P2/P1/P4). Multi-column
    ``xxhash64(a, b)`` over ints chains ``hashInt(b, hashInt(a, 42))``
    — parity with ``F.xxhash64`` over int columns is pinned in
    tests/test_sampling.py. Used to bake the hyperplane-coefficient
    literal table into the embedding_neardup_incremental oracle
    (``similarity.hyperplane_sketches`` derives coef(q, d) from
    ``xxhash64(q, d)`` with q, d INT — no stored model, so the oracle
    can re-derive the exact coefficients driver-side)."""
    h = (seed + _P5 + 4) & _MASK
    h ^= ((value & 0xFFFFFFFF) * _P1) & _MASK
    h = (_py_rotl(h, 23) * _P2 + _P3) & _MASK
    return _py_fmix(h)


def spark_xxhash64_int2(a: int, b: int) -> int:
    """SIGNED Spark ``xxhash64(a, b)`` for two INT columns."""
    u = hash_int(b, hash_int(a, 42))
    return u - (1 << 64) if u >= (1 << 63) else u


# xxhash64(42L, key) == hashLong(key, hashLong(42, 42)); fold the
# constant inner hash + P5 + 8 into the chain's first addend.
ACC0 = (hash_long(42, 42) + _P5 + 8) & _MASK


def xxh64_bucket_ctes(src: str, key: str, buckets: int = 10_000) -> str:
    """CTE chain text: given relation ``src`` with BIGINT column
    ``key``, defines ``_xxbkt(key, _bucket)`` where ``_bucket`` equals
    Spark's ``pmod(xxhash64(42L, key), buckets)`` (signed pmod at the
    end — Spark's hash is a signed long). Splice into a WITH list."""
    steps = [
        # two's-complement lane: negative longs map to value + 2^64
        # (DuckDB % keeps the dividend's sign, hence the double-mod)
        ("_xx0",
         f"SELECT {key}, (CAST({key} AS HUGEINT) % {_M} + {_M}) % {_M} AS v "
         f"FROM {src}"),
        ("_xx1", f"SELECT {key}, {_mulmod('v', _P2)} AS v FROM _xx0"),
        ("_xx2", f"SELECT {key}, {_rotl('v', 31)} AS v FROM _xx1"),
        ("_xx3", f"SELECT {key}, {_mulmod('v', _P1)} AS v FROM _xx2"),
        ("_xx4", f"SELECT {key}, {_xor(str(ACC0), 'v')} AS v FROM _xx3"),
        ("_xx5", f"SELECT {key}, {_rotl('v', 27)} AS v FROM _xx4"),
        ("_xx6", f"SELECT {key}, ({_mulmod('v', _P1)} + {_P4}) % {_M} AS v FROM _xx5"),
        ("_xx7", f"SELECT {key}, {_xor('v', _shr('v', 33))} AS v FROM _xx6"),
        ("_xx8", f"SELECT {key}, {_mulmod('v', _P2)} AS v FROM _xx7"),
        ("_xx9", f"SELECT {key}, {_xor('v', _shr('v', 29))} AS v FROM _xx8"),
        ("_xx10", f"SELECT {key}, {_mulmod('v', _P3)} AS v FROM _xx9"),
        ("_xx11", f"SELECT {key}, {_xor('v', _shr('v', 32))} AS v FROM _xx10"),
        (
            "_xxbkt",
            f"SELECT {key}, CAST((((CASE WHEN v >= 9223372036854775808::HUGEINT "
            f"THEN v - {_M}::HUGEINT ELSE v END) % {buckets}) + {buckets}) "
            f"% {buckets} AS BIGINT) AS _bucket FROM _xx11",
        ),
    ]
    return ",\n".join(f"{name} AS ({q})" for name, q in steps)


def xxh64_signed_ctes(src: str, key: str, seed: int = 42) -> str:
    """CTE chain text: defines ``_xxh({key}, _hash)`` where ``_hash``
    equals Spark's SINGLE-argument ``xxhash64({key})`` as a signed
    BIGINT — i.e. ``hashLong(key, seed)`` with Spark's default seed 42.
    (The two-arg ``xxhash64(42L, key)`` form is what
    :func:`xxh64_bucket_ctes` bakes into :data:`ACC0`; a single-column
    call skips the chaining, so its first addend is just
    ``seed + P5 + 8``.) Used by oracles that must reproduce
    hash-ORDERED selections — e.g. the deterministic pivot pick in
    ``similarity.ivf_centroids`` (``ORDER BY xxhash64(id), id``)."""
    acc0 = (seed + _P5 + 8) & _MASK
    steps = [
        ("_sx0",
         f"SELECT {key}, (CAST({key} AS HUGEINT) % {_M} + {_M}) % {_M} AS v "
         f"FROM {src}"),
        ("_sx1", f"SELECT {key}, {_mulmod('v', _P2)} AS v FROM _sx0"),
        ("_sx2", f"SELECT {key}, {_rotl('v', 31)} AS v FROM _sx1"),
        ("_sx3", f"SELECT {key}, {_mulmod('v', _P1)} AS v FROM _sx2"),
        ("_sx4", f"SELECT {key}, {_xor(str(acc0), 'v')} AS v FROM _sx3"),
        ("_sx5", f"SELECT {key}, {_rotl('v', 27)} AS v FROM _sx4"),
        ("_sx6", f"SELECT {key}, ({_mulmod('v', _P1)} + {_P4}) % {_M} AS v FROM _sx5"),
        ("_sx7", f"SELECT {key}, {_xor('v', _shr('v', 33))} AS v FROM _sx6"),
        ("_sx8", f"SELECT {key}, {_mulmod('v', _P2)} AS v FROM _sx7"),
        ("_sx9", f"SELECT {key}, {_xor('v', _shr('v', 29))} AS v FROM _sx8"),
        ("_sx10", f"SELECT {key}, {_mulmod('v', _P3)} AS v FROM _sx9"),
        ("_sx11", f"SELECT {key}, {_xor('v', _shr('v', 32))} AS v FROM _sx10"),
        (
            "_xxh",
            f"SELECT {key}, CAST(CASE WHEN v >= 9223372036854775808::HUGEINT "
            f"THEN v - {_M}::HUGEINT ELSE v END AS BIGINT) AS _hash FROM _sx11",
        ),
    ]
    return ",\n".join(f"{name} AS ({q})" for name, q in steps)


def _le_word(b: str, off: str, nbytes: int) -> str:
    """Little-endian integer of ``nbytes`` bytes of byte-list ``b``
    starting at 0-based offset expression ``off`` (SQL, HUGEINT)."""
    terms = " + ".join(
        f"{b}[CAST(({off}) + {j + 1} AS INT)] * {1 << (8 * j)}::HUGEINT"
        for j in range(nbytes)
    )
    return f"({terms})"


def _lane_round(v: str, w: str) -> str:
    """XXH64 stripe round: rotl(v + w*P2, 31) * P1 (mod 2^64)."""
    return _mulmod(_rotl(f"((({v}) + {_mulmod(w, _P2)}) % {_M})", 31), _P1)


def xxh64_ascii_ctes(src: str, col: str, seed: int = 42) -> str:
    """CTE chain text: given relation ``src`` with an ASCII (single-byte
    chars, non-NULL) VARCHAR column ``col``, defines
    ``_xxstr({col}, _hash)`` where ``_hash`` equals Spark's
    single-argument ``xxhash64({col})`` as a signed BIGINT — the full
    byte-level xxHash64 (Yann Collet's public spec; Spark's
    ``XXH64.hashUnsafeBytes``): 32-byte stripes into four lanes for
    long inputs, then 8-byte words, one 4-byte chunk, tail bytes, and
    the avalanche mix. Little-endian lane loads become positional
    byte-list arithmetic; the variable-length stripe/word/byte folds —
    inexpressible as a fixed CTE chain — run as ``list_reduce``
    left-folds seeded by prepending the init accumulator (the stripe
    fold's 4-lane state rides as a 4-element HUGEINT list). Splice into
    a WITH list; validated byte-for-byte against ``F.xxhash64`` and
    ``testing/xxh64.spark_xxhash64`` in tests/test_sampling.py.

    This is the twin that makes xxhash64-of-STRING operators (hashed
    classifier features; term/shingle keys) driver-oracle-able — the
    long-lane chains above cover only integer keys."""
    v1i = (seed + _P1 + _P2) & _MASK
    v2i = (seed + _P2) & _MASK
    v3i = seed & _MASK
    v4i = (seed - _P1) & _MASK
    h_small = (seed + _P5) & _MASK

    # stripe fold: acc = [v1, v2, v3, v4]; items = [offset]
    lane_steps = ", ".join(
        _lane_round(f"acc[{i + 1}]", _le_word("_b", f"x[1] + {8 * i}", 8))
        for i in range(4)
    )
    stripe_fold = (
        f"list_reduce([[{v1i}::HUGEINT, {v2i}::HUGEINT, {v3i}::HUGEINT, "
        f"{v4i}::HUGEINT]] || list_transform("
        f"generate_series(0, CAST(_ns - 1 AS BIGINT)), "
        f"k -> [CAST(k * 32 AS HUGEINT)]), (acc, x) -> [{lane_steps}])"
    )

    def merge_round(h: str, v: str) -> str:
        round0 = _mulmod(_rotl(_mulmod(v, _P2), 31), _P1)
        return f"({_mulmod(_xor(h, round0), _P1)} + {_P4}) % {_M}"

    # 8-byte word step: acc = running hash, x = 0-based byte offset
    word_round0 = _mulmod(_rotl(_mulmod(_le_word("_b", "x", 8), _P2), 31), _P1)
    word_step = (
        f"({_mulmod(_rotl(_xor('acc', word_round0), 27), _P1)} + {_P4}) % {_M}"
    )
    word_fold = (
        f"list_reduce([(_h0 + _n) % {_M}] || "
        f"list_transform(generate_series(0, CAST((_n - _o0) // 8 - 1 AS BIGINT)), "
        f"k -> CAST(_o0 + k * 8 AS HUGEINT)), (acc, x) -> {word_step})"
    )

    u32 = _le_word("_b", "_o1", 4)
    four_step = (
        f"({_mulmod(_rotl(_xor('_h1', _mulmod(u32, _P1)), 23), _P2)} "
        f"+ {_P3}) % {_M}"
    )

    byte_step = _mulmod(
        _rotl(
            _xor("acc", _mulmod("_b[CAST(x AS INT)]", _P5)), 11
        ),
        _P1,
    )
    byte_fold = (
        f"list_reduce([_h2] || list_transform("
        f"generate_series(CAST(_o2 + 1 AS BIGINT), CAST(_n AS BIGINT)), "
        f"i -> i), (acc, x) -> {byte_step})"
    )

    steps = [
        (
            "_tb",
            f"SELECT {col}, CAST(length({col}) AS HUGEINT) AS _n, "
            f"list_transform(generate_series(1, length({col})), "
            f"i -> CAST(ascii(substr({col}, i, 1)) AS HUGEINT)) AS _b "
            f"FROM {src}",
        ),
        (
            "_ts",
            f"SELECT {col}, _n, _b, CASE WHEN _n >= 32 "
            f"THEN (_n - 32) // 32 + 1 ELSE 0 END AS _ns FROM _tb",
        ),
        (
            "_tv",
            f"SELECT {col}, _n, _b, _ns, CASE WHEN _n >= 32 "
            f"THEN {stripe_fold} ELSE NULL END AS _v FROM _ts",
        ),
        # merged stripe hash, one merge round per CTE (keeps the
        # generated text linear — inlining all four would square it)
        (
            "_tm0",
            f"SELECT {col}, _n, _b, _ns, _v, CASE WHEN _n >= 32 THEN "
            f"({_rotl('_v[1]', 1)} + {_rotl('_v[2]', 7)} + "
            f"{_rotl('_v[3]', 12)} + {_rotl('_v[4]', 18)}) % {_M} "
            f"ELSE {h_small}::HUGEINT END AS _h FROM _tv",
        ),
        *[
            (
                f"_tm{i + 1}",
                f"SELECT {col}, _n, _b, _ns, _v, CASE WHEN _n >= 32 THEN "
                f"{merge_round('_h', f'_v[{i + 1}]')} ELSE _h END AS _h "
                f"FROM _tm{i}",
            )
            for i in range(4)
        ],
        (
            "_tw",
            f"SELECT {col}, _n, _b, _h AS _h0, "
            f"CASE WHEN _n >= 32 THEN _ns * 32 ELSE 0::HUGEINT END AS _o0 "
            f"FROM _tm4",
        ),
        (
            "_tw2",
            f"SELECT {col}, _n, _b, {word_fold} AS _h1, "
            f"_o0 + ((_n - _o0) // 8) * 8 AS _o1 FROM _tw",
        ),
        (
            "_t4",
            f"SELECT {col}, _n, _b, "
            f"CASE WHEN _o1 + 4 <= _n THEN {four_step} ELSE _h1 END AS _h2, "
            f"CASE WHEN _o1 + 4 <= _n THEN _o1 + 4 ELSE _o1 END AS _o2 "
            f"FROM _tw2",
        ),
        ("_tf0", f"SELECT {col}, {byte_fold} AS v FROM _t4"),
        ("_tf1", f"SELECT {col}, {_xor('v', _shr('v', 33))} AS v FROM _tf0"),
        ("_tf2", f"SELECT {col}, {_mulmod('v', _P2)} AS v FROM _tf1"),
        ("_tf3", f"SELECT {col}, {_xor('v', _shr('v', 29))} AS v FROM _tf2"),
        ("_tf4", f"SELECT {col}, {_mulmod('v', _P3)} AS v FROM _tf3"),
        ("_tf5", f"SELECT {col}, {_xor('v', _shr('v', 32))} AS v FROM _tf4"),
        (
            "_xxstr",
            f"SELECT {col}, CAST(CASE WHEN v >= 9223372036854775808::HUGEINT "
            f"THEN v - {_M}::HUGEINT ELSE v END AS BIGINT) AS _hash FROM _tf5",
        ),
    ]
    return ",\n".join(f"{name} AS ({q})" for name, q in steps)
