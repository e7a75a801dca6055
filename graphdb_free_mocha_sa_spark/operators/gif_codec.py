"""Pure-Python GIF codec (stdlib only) — E4 palette-image + animation
decode WITHOUT PIL.

GIF87a/89a: logical screen descriptor, global/local color tables, LZW
image data (variable-width codes, CLEAR/END handling, dictionary growth
to 12 bits), interlace de-weaving, multi-frame animations (full-frame
replacement frames; partial-frame composition with disposal methods is
out of scope — the encoder always writes full frames). The encoder
round-trip-tests the decoder: it takes palette indices + a palette and
performs real LZW compression, so decode(encode(x)) is exact.
"""

from __future__ import annotations

import struct

import numpy as np


# ----------------------------------------------------------- LZW


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits           # GIF packs codes LSB-first
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    size = min_code_size + 1
    emit(clear, size)
    buf = b""
    for b in indices:
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], size)
        table[cand] = next_code
        next_code += 1
        if next_code >= (1 << 12):          # dictionary full: reset
            emit(clear, size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            size = min_code_size + 1
        elif next_code == (1 << size):      # mirror of the decoder's bump
            size += 1
        buf = bytes([b])
    if buf:
        emit(table[buf], size)
    emit(end, size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    size = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    out = bytearray()
    prev: bytes | None = None
    while True:
        while nbits < size:
            if pos >= len(data):
                return bytes(out)              # truncated stream: best effort
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << size) - 1)
        acc >>= size
        nbits -= size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]            # the KwKwK case
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            # the decoder's table lags the encoder's by ONE entry at read
            # time, so it widens one entry earlier than the encoder's
            # next_code == (1 << size) bump
            if len(table) == (1 << size) - 1 and size < 12:
                size += 1
        prev = entry


# ----------------------------------------------------------- encoder


def encode_gif(frames, palette: np.ndarray) -> bytes:
    """GIF89a bytes from palette ``(n<=256, 3) uint8`` and one or more
    ``(h, w) uint8`` index frames (all the same size, full-frame)."""
    if isinstance(frames, np.ndarray) and frames.ndim == 2:
        frames = [frames]
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = frames[0].shape
    depth = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    gct_size = 1 << depth
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    pal = np.zeros((gct_size, 3), np.uint8)
    pal[:len(palette)] = palette
    out += pal.tobytes()
    if len(frames) > 1:
        # NETSCAPE looping extension (animation)
        out += b"\x21\xFF\x0BNETSCAPE2.0\x03\x01\x00\x00\x00"
    for idx in frames:
        if len(frames) > 1:
            out += b"\x21\xF9\x04\x00\x04\x00\x00\x00"   # GCE: 4cs delay
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        mcs = max(2, depth)
        out.append(mcs)
        data = _lzw_encode(np.asarray(idx, np.uint8).tobytes(), mcs)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)                                     # trailer
    return bytes(out)


# ----------------------------------------------------------- decoder


def decode_gif_frames(content: bytes) -> list[np.ndarray]:
    """All frames of a GIF as ``(h, w, 3) uint8`` RGB arrays (full-frame
    rendering; each frame is painted onto the logical screen)."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, _, _ = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    frames: list[np.ndarray] = []
    screen = np.zeros((h, w, 3), np.uint8)
    while pos < len(content):
        b = content[pos]
        if b == 0x3B:                                    # trailer
            break
        if b == 0x21:                                    # extension
            pos += 2
            while content[pos] != 0:
                pos += content[pos] + 1
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        x0, y0, fw, fh, lflags = struct.unpack_from("<HHHHB", content, pos + 1)
        pos += 10
        ct = gct
        if lflags & 0x80:
            n = 2 << (lflags & 0x07)
            ct = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF frame without a color table")
        mcs = content[pos]
        pos += 1
        data = bytearray()
        while content[pos] != 0:
            ln = content[pos]
            data += content[pos + 1:pos + 1 + ln]
            pos += ln + 1
        pos += 1
        idx = np.frombuffer(_lzw_decode(bytes(data), mcs), np.uint8,
                            count=fw * fh).reshape(fh, fw)
        if lflags & 0x40:                                # interlaced
            de = np.zeros_like(idx)
            rows = list(range(0, fh, 8)) + list(range(4, fh, 8)) \
                + list(range(2, fh, 4)) + list(range(1, fh, 2))
            de[rows] = idx
            idx = de
        screen = screen.copy()
        screen[y0:y0 + fh, x0:x0 + fw] = ct[idx]
        frames.append(screen)
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_gif(content: bytes) -> np.ndarray:
    """First frame as (h, w, 3) uint8 RGB."""
    return decode_gif_frames(content)[0]
