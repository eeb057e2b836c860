"""Test-side animated GIF ENCODER — round-trip fixture generator for
:func:`operators.multimodal.decode_gif_frames` (same pattern as the
JPEG/PNG/WAV test codecs).

Emits valid GIF89a: logical screen + global color table, a graphic
control extension per frame (disposal method, optional transparency
index), image descriptors with offsets, and LZW-compressed index data
using the classic clear-code technique — literal codes only, with a
CLEAR emitted before the decoder's table would force a code-size
increase. Wasteful on bytes, trivially correct, and it exercises the
decoder's table-rebuild path on every clear.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_encode_literals(indices: np.ndarray, min_code_size: int) -> bytes:
    """LZW stream of literal codes with periodic CLEARs so the code
    size never grows past min_code_size + 1."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    # after a CLEAR: first literal adds nothing; each later literal adds
    # one table entry starting at clear+2. Stay strictly below the point
    # where next_code reaches 1 << code_size.
    max_run = (1 << code_size) - (clear + 2)

    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # GIF packs LSB-first
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    run = 0
    for v in indices.ravel():
        if run >= max_run:
            emit(clear)
            run = 0
        emit(int(v))
        run += 1
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: list[dict],
    palette: np.ndarray,
    screen: tuple[int, int] | None = None,
    bg_index: int = 0,
) -> bytes:
    """frames: each ``{"indices": 2-D uint8 array}`` plus optional
    ``"offset": (x, y)``, ``"transparent": int``, ``"disposal": int``.
    ``palette``: (n, 3) uint8, n a power of two ≥ 4. ``screen``
    defaults to the first frame's size."""
    pal = np.asarray(palette, dtype=np.uint8)
    n = len(pal)
    assert n >= 4 and (n & (n - 1)) == 0, "palette must be a power of two >= 4"
    depth = n.bit_length() - 1  # log2
    first = np.asarray(frames[0]["indices"])
    sh, sw = screen[::-1] if screen else first.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | (depth - 1), bg_index, 0])  # GCT flag + size
    out += pal.tobytes()
    min_code_size = max(2, depth)
    for fr in frames:
        idx = np.asarray(fr["indices"], dtype=np.uint8)
        ih, iw = idx.shape
        x, y = fr.get("offset", (0, 0))
        transparent = fr.get("transparent")
        disposal = fr.get("disposal", 0)
        gce_flags = (disposal & 0x07) << 2 | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, gce_flags, 0, 0, transparent or 0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHH", x, y, iw, ih) + bytes([0])
        out += bytes([min_code_size])
        out += _sub_blocks(_lzw_encode_literals(idx, min_code_size))
    out += bytes([0x3B])
    return bytes(out)
