"""Pure-Python baseline JPEG codec (numpy + stdlib) — E4 compressed-image
decode WITHOUT PIL.

Baseline sequential DCT JPEG (SOF0): 8-bit, YCbCr, 4:4:4 or 4:2:0
sampling, Huffman entropy coding. The encoder exists to round-trip-test
the decoder: it emits canonical fixed-length Huffman tables in DHT (any
prefix-free table is valid JPEG — the decoder reads tables from the
file), standard-shaped quantization tables scaled by a quality factor,
and optional 2x2 chroma subsampling. The decoder handles any Huffman
tables, any quant tables, any sampling factors Hi,Vi ≤ 2, and restart
markers.

Correctness-first: block DCTs are exact orthonormal matrix products; the
entropy loop is per-symbol Python — fine for the Arrow-batched test
path, a production deployment would swap in a C codec behind the same
``decode_image`` seam (identical to the PNG codec's scope note).

Progressive, arithmetic-coded, 12-bit and CMYK JPEGs raise
NotImplementedError.
"""

from __future__ import annotations

import struct

import numpy as np


# ----------------------------------------------------------- DCT / zigzag

def _zigzag_order() -> list[int]:
    idx = []
    for s in range(15):
        d = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            d = d[::-1]
        idx += d
    return [r * 8 + c for r, c in idx]


ZIGZAG = np.array(_zigzag_order())            # block index -> flat position
UNZIGZAG = np.argsort(ZIGZAG)

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * \
            (np.sqrt(1 / 8) if _k == 0 else 0.5)


def fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def idct(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


# standard-shaped quantization tables (stored in DQT — exact values are a
# quality choice, not a format requirement)
QLUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)
QCHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# ----------------------------------------------------------- bit plumbing

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)             # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1                 # unstuff
                else:
                    self.pos -= 1                 # a marker: stop feeding
                    b = None
            if b is None:
                break
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if self.nbits < n:                        # past the end: zero-pad
            self.acc <<= (n - self.nbits)
            self.nbits = n
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_to_marker(self) -> None:
        """Drop partial bits and skip an RSTn marker if present."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF \
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
            return


# ----------------------------------------------------------- huffman

def _canonical_codes(bits: list[int], symbols: list[int]):
    """(symbol -> (code, length)) from a DHT BITS/HUFFVAL spec."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    def __init__(self, bits: list[int], symbols: list[int]):
        self.lut = {}                              # (length, code) -> symbol
        code = 0
        k = 0
        self.maxlen = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = symbols[k]
                code += 1
                k += 1
                self.maxlen = length
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, self.maxlen + 1):
            code = (code << 1) | br.read(1)
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code in JPEG stream")


#: fixed encoder tables: DC = 12 categories at 4 bits; AC = 162 symbols at
#: 8 bits (canonical, prefix-free by equal length; valid per DHT)
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                           for s in range(1, 11)]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMS), 0, 0, 0, 0, 0, 0, 0, 0]


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# ----------------------------------------------------------- encoder

def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: bool = False) -> bytes:
    """Baseline JPEG bytes from (h, w, 3) uint8 RGB (or (h, w) gray).
    ``subsample=True`` writes 4:2:0 chroma, else 4:4:4."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def down(p):
                ph = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                return (ph[0::2, 0::2] + ph[1::2, 0::2]
                        + ph[0::2, 1::2] + ph[1::2, 1::2]) / 4.0
            planes = [y, down(cb), down(cr)]
        else:
            planes = [y, cb, cr]
    ncomp = len(planes)
    samp = [(2, 2), (1, 1), (1, 1)] if (subsample and not gray) \
        else [(1, 1)] * ncomp
    qtabs = [_scaled_q(QLUMA, quality)] + \
            ([_scaled_q(QCHROMA, quality)] if ncomp > 1 else [])
    qsel = [0] + [1] * (ncomp - 1)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for p, (hi, vi) in zip(planes, samp):
        th, tw = mcuy * vi * 8, mcux * hi * 8
        padded.append(np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                             mode="edge"))

    dc_codes = _canonical_codes(_DC_BITS, _DC_SYMS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_SYMS)
    bw = _BitWriter()
    pred = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                hi, vi = samp[ci]
                q = qtabs[qsel[ci]]
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        block = padded[ci][y0:y0 + 8, x0:x0 + 8] - 128.0
                        coef = np.round(fdct(block) / q).astype(np.int64)
                        zz = coef.flatten()[ZIGZAG]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        size = _category(diff)
                        code, length = dc_codes[size]
                        bw.write(code, length)
                        bw.write(_amplitude_bits(diff, size), size)
                        run = 0
                        last = 63
                        while last > 0 and zz[last] == 0:
                            last -= 1
                        for k in range(1, last + 1):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                c, ln = ac_codes[0xF0]     # ZRL
                                bw.write(c, ln)
                                run -= 16
                            size = _category(v)
                            c, ln = ac_codes[(run << 4) | size]
                            bw.write(c, ln)
                            bw.write(_amplitude_bits(v, size), size)
                            run = 0
                        if last < 63:
                            c, ln = ac_codes[0x00]         # EOB
                            bw.write(c, ln)
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")                           # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qtabs):
        out += seg(0xFFDB, bytes([ti])
                   + bytes(int(x) for x in q.flatten()[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    out += seg(0xFFC0, sof)
    for cls, tid, bits, syms in ((0, 0, _DC_BITS, _DC_SYMS),
                                 (1, 0, _AC_BITS, _AC_SYMS)):
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits)
                   + bytes(syms))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])                       # DC/AC table 0
    sos += b"\x00\x3F\x00"
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xFF\xD9"                                     # EOI
    return bytes(out)


# ----------------------------------------------------------- decoder

def decode_jpeg(content: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB (or (h, w, 1) for grayscale JPEGs) from a
    baseline sequential Huffman JPEG."""
    if content[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    comps = []                     # (id, hi, vi, qsel)
    h = w = None
    restart = 0
    scan = None
    while pos < len(content):
        if content[pos] != 0xFF:
            pos += 1
            continue
        marker = content[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (length,) = struct.unpack_from(">H", content, pos)
        payload = content[pos + 2:pos + length]
        pos += length
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                p += 1
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, np.int32)
                tbl[ZIGZAG] = np.frombuffer(payload, np.uint8, 64, p)
                qt[tq] = tbl.reshape(8, 8)
                p += 64
        elif marker in (0xC0, 0xC1):
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            for ci in range(nc):
                cid, hv, q = payload[6 + ci * 3:9 + ci * 3]
                comps.append((cid, hv >> 4, hv & 0xF, q))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG (progressive/"
                                      "arithmetic/hierarchical)")
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                syms = list(payload[p + 17:p + 17 + n])
                huff[(cls, tid)] = _HuffDecoder(bits, syms)
                p += 17 + n
        elif marker == 0xDD:
            (restart,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:
            ns = payload[0]
            sel = [(payload[1 + i * 2], payload[2 + i * 2] >> 4,
                    payload[2 + i * 2] & 0xF) for i in range(ns)]
            scan = (sel, pos)
            break
    if scan is None or h is None:
        raise ValueError("JPEG missing SOS/SOF")
    sel, data_pos = scan
    end = content.rfind(b"\xFF\xD9")
    br = _BitReader(content[data_pos:end if end > 0 else len(content)])

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {c[0]: np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8), np.float64)
              for c in comps}
    byid = {c[0]: c for c in comps}
    pred = {c[0]: 0 for c in comps}
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and nmcu and nmcu % restart == 0:
                br.align_to_marker()
                for k in pred:
                    pred[k] = 0
            nmcu += 1
            for cid, dctid, actid in sel:
                _, hi, vi, qsel = byid[cid]
                dch = huff[(0, dctid)]
                ach = huff[(1, actid)]
                q = qt[qsel]
                for by in range(vi):
                    for bx in range(hi):
                        zz = np.zeros(64, np.int64)
                        size = dch.decode(br)
                        pred[cid] += _extend(br.read(size), size)
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            sym = ach.decode(br)
                            if sym == 0x00:
                                break
                            if sym == 0xF0:
                                k += 16
                                continue
                            k += sym >> 4
                            size = sym & 0xF
                            if k > 63:
                                break
                            zz[k] = _extend(br.read(size), size)
                            k += 1
                        coef = np.zeros(64, np.int64)
                        coef[ZIGZAG] = zz
                        block = idct(coef.reshape(8, 8) * q) + 128.0
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = block
    full = []
    for cid, hi, vi, _ in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)
