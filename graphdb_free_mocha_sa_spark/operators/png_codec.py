"""Pure-Python PNG codec (stdlib ``zlib`` + numpy) — E4 compressed-image
decode WITHOUT PIL.

The container has no image libraries, but PNG's only compression is zlib
(stdlib) plus five byte-prediction scanline filters — all implementable
exactly. Scope: 8-bit, non-interlaced, color types 0 (gray), 2 (RGB),
4 (gray+alpha), 6 (RGBA); palette (3) and 16-bit stay NotImplementedError.
Correctness-first: filters 3/4 (Average/Paeth) unfilter with a per-pixel
loop — fine for the Arrow-batched test path; a production deployment would
swap in a C decoder behind the same ``decode_image`` seam. Filters 0-2
(None/Sub/Up) are fully vectorized (Sub is a per-lane cumsum mod 256).

The encoder exists to round-trip-test the decoder: it can emit any fixed
scanline filter or cycle through all five (``filter_mode="mixed"``), so
every filter path is exercised by tests.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(img: np.ndarray, filter_mode: str | int = 0) -> bytes:
    """8-bit PNG bytes from (h, w), (h, w, 1|2|3|4) uint8.

    ``filter_mode``: 0-4 fixes that scanline filter; ``"mixed"`` cycles
    row index mod 5 (decoder-exercising round-trip tests)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = ch
    raw = img.reshape(h, w * ch).astype(np.int16)
    lines = []
    prev = np.zeros(w * ch, np.int16)
    for y in range(h):
        f = (y % 5) if filter_mode == "mixed" else int(filter_mode)
        cur = raw[y]
        left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
        pleft = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) >> 1)
        else:
            pred = np.array([_paeth(int(a), int(b), int(c))
                             for a, b, c in zip(left, prev, pleft)],
                            dtype=np.int16)
            filt = cur - pred
        lines.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _chunk(b"IEND", b""))


def decode_png(content: bytes) -> np.ndarray:
    """(h, w, channels) uint8 from an 8-bit non-interlaced PNG."""
    if content[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    color = depth = interlace = None
    idat = bytearray()
    while pos < len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        tag = content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
    if depth != 8 or color not in _CHANNELS:
        raise NotImplementedError(
            f"PNG depth={depth} color_type={color} unsupported "
            "(8-bit gray/RGB/gray+alpha/RGBA only)")
    if interlace:
        raise NotImplementedError("interlaced PNG unsupported")
    ch = _CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, count=stride,
                             offset=y * (stride + 1) + 1).astype(np.int32)
        if f == 0:
            cur = line
        elif f == 1:          # Sub: per-lane cumsum mod 256 (vectorized)
            cur = line.reshape(w, ch).cumsum(axis=0).reshape(stride)
        elif f == 2:          # Up
            cur = line + prev
        elif f in (3, 4):     # Average / Paeth: sequential in x
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0     # already mod 256
                b = prev[x]
                if f == 3:
                    cur[x] = (line[x] + ((int(a) + int(b)) >> 1)) & 0xFF
                else:
                    c = prev[x - ch] if x >= ch else 0
                    cur[x] = (line[x] + _paeth(int(a), int(b), int(c))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        cur = cur & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)


def decode_png_rgb(content: bytes) -> np.ndarray:
    """(h, w, 3) RGB view of any supported PNG (gray replicated, alpha
    dropped — matching the RGB contract of multimodal.decode_image)."""
    px = decode_png(content)
    ch = px.shape[2]
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    if ch == 2:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()
