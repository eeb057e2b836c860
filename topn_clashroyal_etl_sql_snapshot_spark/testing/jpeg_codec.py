"""Test-side baseline JPEG ENCODER (gray or RGB 4:4:4, no subsampling).

Exists purely to round-trip-test the stdlib decoder in
operators/jpeg.py (same pattern as the PNG/GIF/WAV test encoders): it
emits a fully valid SOF0 stream — DQT, SOF0, DHT, SOS, entropy-coded
data with byte stuffing, EOI — that any baseline JPEG decoder accepts.

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
