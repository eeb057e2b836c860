"""Test-side JPEG ENCODERS: baseline (SOF0) and progressive (SOF2).

Exists purely to round-trip-test the stdlib decoder in
operators/jpeg.py (same pattern as the PNG/GIF/WAV test encoders): it
emits a fully valid SOF0 stream — DQT, SOF0, DHT, SOS, entropy-coded
data with byte stuffing, EOI — that any baseline JPEG decoder accepts.
``encode_jpeg_progressive`` emits a spectral-selection + successive-
approximation SOF2 stream (T.81 Annex G): interleaved DC first/refine
scans, per-component AC first scans (per-block EOB — valid, if less
compressed, EOB-run usage), and AC refinement scans with correction
bits, so every decoder scan type is exercised against the SAME
quantized coefficients the baseline path would carry.

Instead of transcribing the T.81 Annex K "typical" Huffman tables, it
declares its own tables in the DHT segment: all 12 DC category symbols
at code length 5, and the 256 AC run/size symbols as 255 codes at
length 9 plus one at length 10 (a DHT count byte is u8, so one length
can carry at most 255 codes). Both are valid canonical Huffman tables
(the all-ones code is never assigned), and a conforming decoder must
build whatever DHT declares — which doubles as a test that ours does.
"""

from __future__ import annotations

import struct

import numpy as np

from ..operators.jpeg import _A, _ZIGZAG

# DC: symbols 0..11, all at length 5. AC: symbols 0..255, all at length 9.
_DC_COUNTS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS = bytes(range(12))
_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_AC_SYMBOLS = bytes(range(256))


def _canonical_codes(counts, symbols):
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out

_DC_CODES = _canonical_codes(_DC_COUNTS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_COUNTS, _AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per T.81

    def marker(self, b: int) -> None:
        """Emit an unstuffed marker (byte-aligned) into the stream."""
        self.align()
        self.out += bytes([0xFF, b])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _category(v: int) -> int:
    return 0 if v == 0 else int(v).bit_length() if v > 0 else int(-v).bit_length()


def _magnitude_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _encode_block(bw: _BitWriter, coeffs: np.ndarray, pred: int) -> int:
    """coeffs: 64 zigzag-ordered quantized ints. Returns new DC pred."""
    dc = int(coeffs[0])
    diff = dc - pred
    t = _category(diff)
    length, code = _DC_CODES[t]
    bw.write(code, length)
    if t:
        bw.write(_magnitude_bits(diff, t), t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coeffs[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coeffs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = _AC_CODES[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        length, code = _AC_CODES[(run << 4) | s]
        bw.write(code, length)
        bw.write(_magnitude_bits(v, s), s)
        run = 0
    if last_nz < 63:
        length, code = _AC_CODES[0x00]  # EOB
        bw.write(code, length)
    return dc


def _dct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """plane: (H, W) float, already level-shifted. Returns (nblocks, 64)
    zigzag-ordered quantized coefficients (H, W multiples of 8)."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coeffs = np.einsum("ux,nxy,vy->nuv", _A, blocks, _A).reshape(-1, 64)
    quant = np.rint(coeffs / q[_ZIGZAG_RASTER][None, :]).astype(np.int64)
    return quant[:, _ZIGZAG]


# quant tables are declared in zigzag order; build the raster-order view
_ZIGZAG_RASTER = np.zeros(64, dtype=np.int64)
_ZIGZAG_RASTER[_ZIGZAG] = np.arange(64)


def encode_jpeg(
    img: np.ndarray,
    quant: int | np.ndarray = 1,
    subsampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """img: H×W (gray) or H×W×3 (RGB) uint8 → baseline JPEG bytes.

    - ``quant``: a scalar fills the whole table (1 = near-lossless), or
      a 64-entry zigzag-ordered table.
    - ``subsampling``: luma sampling factors (h, v) with chroma at 1×1 —
      (1, 1) is 4:4:4, (2, 1) is 4:2:2, (2, 2) is 4:2:0. Chroma is
      block-averaged down, which is what exercises the decoder's MCU
      interleave + replication-upsample path.
    - ``restart_interval``: if > 0, a DRI segment plus RST markers every
      N MCUs (decoder must byte-align, resync, and reset DC predictors).

    Edges are padded by replication to MCU multiples.
    """
    arr = np.asarray(img)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    hs, vs = subsampling
    if gray:
        hs = vs = 1
    q = (
        np.full(64, int(quant), dtype=np.int32)
        if np.isscalar(quant)
        else np.asarray(quant, dtype=np.int32)
    )

    mcu_w, mcu_h = 8 * hs, 8 * vs
    ph, pw = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w
    mcus_x, mcus_y = pw // mcu_w, ph // mcu_h
    if gray:
        planes = [arr.astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        samps = [(hs, vs), (1, 1), (1, 1)]
    shifted = []
    for p, (chs, cvs) in zip(planes, samps):
        p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        if (chs, cvs) != (hs, vs):  # chroma: block-average downsample
            fy, fx = vs // cvs, hs // chs
            p = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        shifted.append(p - 128.0)

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (table 0, 8-bit, zigzag order)
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes(int(v) for v in q)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid, (chs, cvs) in zip(range(1, ncomp + 1), samps):
        sof += struct.pack(">BBB", cid, (chs << 4) | cvs, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: DC table 0 and AC table 0 (shared by every component)
    for tc, counts, syms in ((0, _DC_COUNTS, _DC_SYMBOLS), (1, _AC_COUNTS, _AC_SYMBOLS)):
        body = bytes([tc << 4]) + bytes(counts) + syms
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    # SOS
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    per_comp = [_dct_quant(p, q) for p in shifted]
    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_index = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.marker(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci, (chs, cvs) in enumerate(samps):
                row_blocks = mcus_x * chs
                for by in range(cvs):
                    for bx in range(chs):
                        bi = (my * cvs + by) * row_blocks + mx * chs + bx
                        preds[ci] = _encode_block(bw, per_comp[ci][bi], preds[ci])
            mcu_index += 1
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive (SOF2) encoder
# ---------------------------------------------------------------------------

def _write_ac_symbol(bw: _BitWriter, r: int, s: int) -> None:
    length, code = _AC_CODES[(r << 4) | s]
    bw.write(code, length)


def _encode_dc_first(bw, coeffs, pred: int, al: int) -> int:
    v = int(coeffs[0]) >> al  # arithmetic shift, per T.81 G.1.2.1
    diff = v - pred
    t = _category(diff)
    length, code = _DC_CODES[t]
    bw.write(code, length)
    if t:
        bw.write(_magnitude_bits(diff, t), t)
    return v


def _encode_ac_first(bw, coeffs, ss: int, se: int, al: int) -> None:
    """Per-block AC first scan; every end-of-band is a plain EOB
    (r=0) — a valid degenerate EOB run the decoder must accept."""
    vals = []
    for k in range(ss, se + 1):
        c = int(coeffs[k])
        mag = abs(c) >> al
        vals.append(mag if c >= 0 else -mag)
    last_nz = -1
    for i, v in enumerate(vals):
        if v:
            last_nz = i
    run = 0
    for i in range(last_nz + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            _write_ac_symbol(bw, 15, 0)  # ZRL
            run -= 16
        s = _category(v)
        _write_ac_symbol(bw, run, s)
        bw.write(_magnitude_bits(v, s), s)
        run = 0
    if last_nz < se - ss:
        _write_ac_symbol(bw, 0, 0)  # EOB (run of exactly 1)


def _encode_ac_refine(bw, coeffs, ss: int, se: int, al: int) -> None:
    """Per-block AC refinement: newly-significant coefficients code
    (run, 1) + sign with run counting only ZERO-HISTORY slots; each
    nonzero-history coefficient crossed contributes a pending
    correction bit emitted after the next symbol; trailing history
    corrections ride behind a plain EOB."""
    absvals = [abs(int(coeffs[k])) >> al for k in range(ss, se + 1)]
    signs = [int(coeffs[k]) >= 0 for k in range(ss, se + 1)]
    last_new = -1
    for i, a in enumerate(absvals):
        if a == 1:
            last_new = i
    run = 0
    pending: list[int] = []
    for i in range(last_new + 1):
        a = absvals[i]
        if a == 0:
            run += 1
            if run == 16:
                _write_ac_symbol(bw, 15, 0)  # ZRL: 16 zero-history slots
                for b in pending:
                    bw.write(b, 1)
                pending = []
                run = 0
        elif a == 1:
            _write_ac_symbol(bw, run, 1)
            bw.write(1 if signs[i] else 0, 1)
            for b in pending:
                bw.write(b, 1)
            pending = []
            run = 0
        else:
            pending.append(a & 1)
    # positions after the last newly-significant coefficient: the
    # decoder reaches them only through an EOB's rest-of-block walk
    if last_new < len(absvals) - 1:
        _write_ac_symbol(bw, 0, 0)  # EOB (degenerate run of 1)
        for i in range(last_new + 1, len(absvals)):
            if absvals[i] > 1:
                bw.write(absvals[i] & 1, 1)


def encode_jpeg_progressive(
    img: np.ndarray,
    quant: int | np.ndarray = 1,
    subsampling: tuple[int, int] = (1, 1),
    dc_split: int = 1,
    ac_split: int = 1,
    band_break: int = 6,
    restart_interval: int = 0,
) -> bytes:
    """img → progressive JPEG (SOF2) with the canonical scan script:

    1. interleaved DC first scan at Al=``dc_split``;
    2. DC refinement scans stepping Al down to 0;
    3. per component: AC first scan of band 1..``band_break``-1 at
       Al=``ac_split``, then band ``band_break``..63 at Al=``ac_split``;
    4. per component: AC refinement scans stepping Al down to 0.

    ``restart_interval`` (in MCUs for the DC scan, blocks for AC
    scans) interleaves RSTn markers, resetting predictors/EOB runs.
    """
    arr = np.asarray(img)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    hs, vs = subsampling
    if gray:
        hs = vs = 1
    q = (
        np.full(64, int(quant), dtype=np.int32)
        if np.isscalar(quant)
        else np.asarray(quant, dtype=np.int32)
    )
    mcu_w, mcu_h = 8 * hs, 8 * vs
    ph, pw = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w
    mcus_x, mcus_y = pw // mcu_w, ph // mcu_h
    if gray:
        planes = [arr.astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        samps = [(hs, vs), (1, 1), (1, 1)]
    shifted = []
    for p, (chs, cvs) in zip(planes, samps):
        p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        if (chs, cvs) != (hs, vs):
            fy, fx = vs // cvs, hs // chs
            p = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        shifted.append(p - 128.0)
    per_comp = [_dct_quant(p, q) for p in shifted]
    ncomp = len(per_comp)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes(int(v) for v in q)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid, (chs, cvs) in zip(range(1, ncomp + 1), samps):
        sof += struct.pack(">BBB", cid, (chs << 4) | cvs, 0)
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, counts, syms in ((0, _DC_COUNTS, _DC_SYMBOLS), (1, _AC_COUNTS, _AC_SYMBOLS)):
        body = bytes([tc << 4]) + bytes(counts) + syms
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    def sos_header(comp_ids, ss, se, ah, al):
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    def comp_blocks(ci):
        chs, cvs = samps[ci]
        hmax = max(s[0] for s in samps)
        vmax = max(s[1] for s in samps)
        comp_w = (w * chs + 8 * hmax - 1) // (8 * hmax)
        comp_h = (h * cvs + 8 * vmax - 1) // (8 * vmax)
        row_blocks = mcus_x * chs
        for byy in range(comp_h):
            for bxx in range(comp_w):
                yield per_comp[ci][byy * row_blocks + bxx]

    # --- scan 1: interleaved DC first at Al=dc_split
    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_index = 0
    rst = 0
    out += sos_header(range(1, ncomp + 1), 0, 0, 0, dc_split)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.marker(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci, (chs, cvs) in enumerate(samps):
                row_blocks = mcus_x * chs
                for by in range(cvs):
                    for bx in range(chs):
                        bi = (my * cvs + by) * row_blocks + mx * chs + bx
                        preds[ci] = _encode_dc_first(
                            bw, per_comp[ci][bi], preds[ci], dc_split
                        )
            mcu_index += 1
    out += bw.flush()

    # --- DC refinement scans stepping Al -> 0 (interleaved)
    for al in range(dc_split - 1, -1, -1):
        bw = _BitWriter()
        out += sos_header(range(1, ncomp + 1), 0, 0, al + 1, al)
        mcu_index = 0
        rst = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                    bw.marker(0xD0 + rst)
                    rst = (rst + 1) % 8
                for ci, (chs, cvs) in enumerate(samps):
                    row_blocks = mcus_x * chs
                    for by in range(cvs):
                        for bx in range(chs):
                            bi = (my * cvs + by) * row_blocks + mx * chs + bx
                            bw.write((int(per_comp[ci][bi][0]) >> al) & 1, 1)
                mcu_index += 1
        out += bw.flush()

    # --- per-component AC first scans (two spectral bands) at ac_split
    bands = [(1, band_break - 1), (band_break, 63)]
    for ci in range(ncomp):
        for ss, se in bands:
            bw = _BitWriter()
            out += sos_header([ci + 1], ss, se, 0, ac_split)
            bi = 0
            rst = 0
            for coeffs in comp_blocks(ci):
                if restart_interval and bi and bi % restart_interval == 0:
                    bw.marker(0xD0 + rst)
                    rst = (rst + 1) % 8
                _encode_ac_first(bw, coeffs, ss, se, ac_split)
                bi += 1
            out += bw.flush()

    # --- per-component AC refinement scans stepping Al -> 0
    for al in range(ac_split - 1, -1, -1):
        for ci in range(ncomp):
            for ss, se in bands:
                bw = _BitWriter()
                out += sos_header([ci + 1], ss, se, al + 1, al)
                bi = 0
                rst = 0
                for coeffs in comp_blocks(ci):
                    if restart_interval and bi and bi % restart_interval == 0:
                        bw.marker(0xD0 + rst)
                        rst = (rst + 1) % 8
                    _encode_ac_refine(bw, coeffs, ss, se, al)
                    bi += 1
                out += bw.flush()

    out += b"\xff\xd9"
    return bytes(out)
