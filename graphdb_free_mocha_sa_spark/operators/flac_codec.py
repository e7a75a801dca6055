"""Pure-Python FLAC codec (subset) — real compressed-audio decode with no
codec libraries (E4; companion to png_codec.py / jpeg_codec.py /
gif_codec.py).

Spec-conformant subset of the FLAC format (RFC 9639):

- encoder: STREAMINFO + fixed-blocksize frames, 16-bit, 1-2 channels,
  subframe types CONSTANT / VERBATIM / FIXED order 0-2 / LPC (Levinson-
  Durbin analysis, error-feedback coefficient quantization, orders
  2/4/8), stereo decorrelation (per-frame best of independent,
  left-side, right-side, mid-side), single-partition Rice residuals,
  correct CRC-8 (header) and CRC-16 (frame) and the STREAMINFO MD5
  signature;
- decoder: STREAMINFO parse, frames with any blocksize/rate/size code,
  CONSTANT / VERBATIM / FIXED order 0-4 / LPC any order 1-32 subframes,
  all four channel assignments (independent + the three decorrelated
  modes, side channel at bits+1), any Rice partition order incl.
  escaped (raw) partitions and wasted bits, CRC-16 verify.

FLAC is lossless, so the test contract is exact: decode(encode(x)) == x
sample-for-sample, plus MD5 verification against the STREAMINFO
signature. Used by operators/multimodal.py synthesize_real_media /
decode_audio for the compressed-audio leg of the E4 pipeline.

Reference parity note: the wrapped engine has no media surface at all
(SURVEY §2.3); this is [EXT] scope.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

MAGIC = b"fLaC"

# ------------------------------------------------------------------- CRCs


def _make_crc8_table(poly: int = 0x07) -> list[int]:
    tbl = []
    for b in range(256):
        r = b
        for _ in range(8):
            r = ((r << 1) ^ poly) & 0xFF if r & 0x80 else (r << 1) & 0xFF
        tbl.append(r)
    return tbl


def _make_crc16_table(poly: int = 0x8005) -> list[int]:
    tbl = []
    for b in range(256):
        r = b << 8
        for _ in range(8):
            r = ((r << 1) ^ poly) & 0xFFFF if r & 0x8000 else (r << 1) & 0xFFFF
        tbl.append(r)
    return tbl


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC16[((r >> 8) ^ b) & 0xFF] ^ ((r << 8) & 0xFFFF)
    return r


# ----------------------------------------------------------------- bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero bits then a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def bytes(self) -> bytes:
        assert self._nbits == 0
        return bytes(self._out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self._data = data
        self._byte = pos
        self._bit = 0

    def read(self, nbits: int) -> int:
        v = 0
        while nbits > 0:
            if self._byte >= len(self._data):
                raise ValueError("FLAC: bitstream truncated")
            avail = 8 - self._bit
            take = min(avail, nbits)
            cur = self._data[self._byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self._bit += take
            nbits -= take
            if self._bit == 8:
                self._bit = 0
                self._byte += 1
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self._bit:
            self._bit = 0
            self._byte += 1

    def tell_bytes(self) -> int:
        return self._byte + (1 if self._bit else 0)


# ------------------------------------------------------------- UTF-8 coder


def _utf8_number(n: int) -> bytes:
    """FLAC frame numbers use UTF-8-style variable-length coding."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (1 + 5 * nbytes)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes) & 0xFF) >> 0
    out.append(lead | (n >> (6 * (nbytes - 1))))
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    if n < 2 or n > 7:
        raise ValueError("FLAC: bad UTF-8 frame number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC: bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


# ------------------------------------------------------------ fixed predict


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _fixed_restore(res: np.ndarray, warmup: np.ndarray) -> np.ndarray:
    """Integrate ``order`` times: inverse of repeated np.diff with the
    warmup samples supplying integration constants."""
    order = len(warmup)
    out = res.astype(np.int64)
    for k in range(order - 1, -1, -1):
        seed = warmup.astype(np.int64)
        for _ in range(k):
            seed = np.diff(seed)
        out = np.concatenate(([seed[0]], out)).cumsum()
    return out


def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r >= 0, r << 1, (np.abs(r) << 1) - 1)


def _best_rice_param(z: np.ndarray) -> int:
    if len(z) == 0:
        return 0
    mean = max(float(z.mean()), 0.1)
    k = max(0, min(14, int(np.log2(mean)) ))
    best_k, best_bits = 0, None
    for kk in (max(0, k - 1), k, k + 1):
        bits = int((z >> kk).sum()) + len(z) * (kk + 1)
        if best_bits is None or bits < best_bits:
            best_k, best_bits = kk, bits
    return best_k


# ------------------------------------------------------------- LPC predict


def _lpc_coeffs(x: np.ndarray, order: int) -> np.ndarray | None:
    """Levinson-Durbin LPC analysis; None when the signal can't support
    the requested order (degenerate autocorrelation)."""
    if len(x) <= order:
        return None
    f = x.astype(np.float64)
    autoc = np.array([np.dot(f[: len(f) - k], f[k:]) for k in range(order + 1)])
    if autoc[0] == 0:
        return None
    err = autoc[0]
    a = np.zeros(order)
    for i in range(order):
        acc = autoc[i + 1] - np.dot(a[:i], autoc[i:0:-1][:i])
        k = acc / err
        a[i] = k
        a[:i] = a[:i] - k * a[:i][::-1]
        err *= 1.0 - k * k
        if err <= 0:
            return None
    return a


def _quantize_lpc(coefs: np.ndarray,
                  precision: int = 12) -> tuple[np.ndarray, int] | None:
    """Error-feedback quantization of LPC coefficients to ``precision``
    signed bits with a non-negative shift (the only shift real decoders
    accept)."""
    cmax = float(np.max(np.abs(coefs)))
    if cmax <= 0:
        return None
    shift = precision - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = max(0, min(15, shift))
    qmax = (1 << (precision - 1)) - 1
    qmin = -(1 << (precision - 1))
    q = np.empty(len(coefs), np.int64)
    err = 0.0
    for i, c in enumerate(coefs):
        v = c * (1 << shift) + err
        qi = int(round(v))
        qi = max(qmin, min(qmax, qi))
        err = v - qi
        q[i] = qi
    return q, shift


def _lpc_residual(x: np.ndarray, q: np.ndarray, shift: int) -> np.ndarray:
    order = len(q)
    n = len(x)
    acc = np.zeros(n - order, np.int64)
    for j in range(order):
        acc += int(q[j]) * x[order - 1 - j: n - 1 - j]
    return x[order:] - (acc >> shift)


def _lpc_restore(res: np.ndarray, warm: np.ndarray, q: list[int],
                 shift: int) -> np.ndarray:
    order = len(warm)
    out = np.empty(order + len(res), np.int64)
    out[:order] = warm
    for i in range(order, len(out)):
        acc = 0
        for j in range(order):
            acc += q[j] * int(out[i - 1 - j])
        out[i] = int(res[i - order]) + (acc >> shift)
    return out


# ---------------------------------------------------------------- encoder


_STEREO_MODES = {"independent": 0b0001, "left_side": 0b1000,
                 "right_side": 0b1001, "mid_side": 0b1010}


def encode_flac(samples: np.ndarray, rate: int, block_size: int = 4096,
                stereo_mode: str | None = None) -> bytes:
    """Encode int16 samples (shape (n,) mono or (n, ch) for 1-2
    channels) into a spec-conformant FLAC stream. Stereo frames pick the
    cheapest of independent / left-side / right-side / mid-side per
    frame unless ``stereo_mode`` pins one."""
    x = np.asarray(samples)
    if x.dtype != np.int16:
        raise ValueError("encode_flac expects int16 samples")
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    if not 1 <= nch <= 2:
        raise NotImplementedError("FLAC subset: 1-2 channels")
    if not 16 <= block_size <= 32768:
        raise ValueError("block_size out of FLAC range")

    md5 = hashlib.md5(x.astype("<i2").tobytes()).digest()
    frames = bytearray()
    min_fs = max_fs = None
    for fi, start in enumerate(range(0, n, block_size)):
        blk = x[start:start + block_size]
        fb = _encode_frame(blk, fi, rate, nch, stereo_mode)
        frames += fb
        min_fs = len(fb) if min_fs is None else min(min_fs, len(fb))
        max_fs = max(max_fs or 0, len(fb))

    # STREAMINFO: all frames share one blocksize except possibly the last
    si = _BitWriter()
    si.write(block_size, 16)               # min blocksize
    si.write(block_size, 16)               # max blocksize
    si.write(min_fs or 0, 24)
    si.write(max_fs or 0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(16 - 1, 5)
    si.write(n, 36)
    info = si.bytes() + md5
    header = MAGIC + bytes([0x80]) + struct.pack(">I", len(info))[1:] + info
    return header + bytes(frames)


def _est_bits(x: np.ndarray) -> int:
    """Cheap per-channel cost estimate (order-2 fixed residual, rice)."""
    if len(x) <= 2 or np.all(x == x[0]):
        return 40
    z = _zigzag(_fixed_residual(x, 2))
    k = _best_rice_param(z)
    return int((z >> k).sum()) + len(z) * (k + 1)


def _encode_frame(blk: np.ndarray, frame_no: int, rate: int,
                  nch: int, stereo_mode: str | None = None) -> bytes:
    bs = len(blk)
    chans: list[tuple[np.ndarray, int]]     # (samples, bit depth)
    if nch == 2:
        l = blk[:, 0].astype(np.int64)
        r = blk[:, 1].astype(np.int64)
        mid = (l + r) >> 1
        side = l - r
        modes = {
            0b0001: ([(l, 16), (r, 16)], _est_bits(l) + _est_bits(r)),
            0b1000: ([(l, 16), (side, 17)], _est_bits(l) + _est_bits(side)),
            0b1001: ([(side, 17), (r, 16)], _est_bits(r) + _est_bits(side)),
            0b1010: ([(mid, 16), (side, 17)],
                     _est_bits(mid) + _est_bits(side)),
        }
        if stereo_mode is not None:
            ch_code = _STEREO_MODES[stereo_mode]
        else:
            ch_code = min(modes, key=lambda c: modes[c][1])
        chans = modes[ch_code][0]
    else:
        ch_code = 0
        chans = [(blk[:, 0].astype(np.int64), 16)]

    hw = _BitWriter()
    hw.write(0b11111111111110, 14)
    hw.write(0, 1)                          # reserved
    hw.write(0, 1)                          # fixed blocksize strategy
    hw.write(0b0111, 4)                     # blocksize: 16-bit at end
    hw.write(0b0000, 4)                     # rate: from STREAMINFO
    hw.write(ch_code, 4)                    # channel assignment
    hw.write(0b100, 3)                      # 16 bits per sample
    hw.write(0, 1)                          # reserved
    head = hw.bytes() + _utf8_number(frame_no) + struct.pack(">H", bs - 1)
    head += bytes([crc8(head)])

    bw = _BitWriter()
    for b in head:
        bw.write(b, 8)
    for x, bits in chans:
        _encode_subframe(bw, x, bits)
    bw.align()
    body = bw.bytes()
    return body + struct.pack(">H", crc16(body))


_LPC_ORDERS = (2, 4, 8)
_LPC_PRECISION = 12


def _rice_bits(res: np.ndarray) -> tuple[int, int]:
    z = _zigzag(res)
    k = _best_rice_param(z)
    return k, int((z >> k).sum()) + len(z) * (k + 1)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bits: int = 16) -> None:
    bs = len(x)
    mask = (1 << bits) - 1
    if np.all(x == x[0]):
        bw.write(0, 1)
        bw.write(0b000000, 6)               # CONSTANT
        bw.write(0, 1)                      # no wasted bits
        bw.write(int(x[0]) & mask, bits)
        return

    # candidates: FIXED order 0-2 and LPC at a few orders; cost in bits
    best = None                             # (bits, kind, order, res, k, extra)
    for order in range(0, 3):
        if bs <= order:
            continue
        res = _fixed_residual(x, order)
        k, rbits = _rice_bits(res)
        cost = bits * order + rbits
        if best is None or cost < best[0]:
            best = (cost, "fixed", order, res, k, None)
    for order in _LPC_ORDERS:
        if bs <= order * 2:
            continue
        coefs = _lpc_coeffs(x, order)
        if coefs is None:
            continue
        qs = _quantize_lpc(coefs, _LPC_PRECISION)
        if qs is None:
            continue
        q, shift = qs
        res = _lpc_residual(x, q, shift)
        k, rbits = _rice_bits(res)
        cost = bits * order + 9 + order * _LPC_PRECISION + rbits
        if best is None or cost < best[0]:
            best = (cost, "lpc", order, res, k, (q, shift))
    verbatim_bits = bits * bs
    if best is None or best[0] >= verbatim_bits:
        bw.write(0, 1)
        bw.write(0b000001, 6)               # VERBATIM
        bw.write(0, 1)
        for v in x:
            bw.write(int(v) & mask, bits)
        return

    _, kind, order, res, k, extra = best
    bw.write(0, 1)
    if kind == "fixed":
        bw.write(0b001000 | order, 6)       # FIXED, order
    else:
        bw.write(0b100000 | (order - 1), 6)  # LPC, order
    bw.write(0, 1)                          # no wasted bits
    for v in x[:order]:
        bw.write(int(v) & mask, bits)       # warmup
    if kind == "lpc":
        q, shift = extra
        bw.write(_LPC_PRECISION - 1, 4)
        bw.write(shift, 5)
        for c in q:
            bw.write(int(c) & ((1 << _LPC_PRECISION) - 1), _LPC_PRECISION)
    bw.write(0b00, 2)                       # residual: 4-bit rice params
    bw.write(0, 4)                          # partition order 0
    if k > 14:
        k = 14
    bw.write(k, 4)
    for z in _zigzag(res):
        zi = int(z)
        bw.write_unary(zi >> k)
        if k:
            bw.write(zi & ((1 << k) - 1), k)


# ---------------------------------------------------------------- decoder


_BLOCKSIZE_TBL = {0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304,
                  0b0101: 4608, 0b1000: 256, 0b1001: 512, 0b1010: 1024,
                  0b1011: 2048, 0b1100: 4096, 0b1101: 8192, 0b1110: 16384,
                  0b1111: 32768}
_RATE_TBL = {0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
             0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
             0b1001: 44100, 0b1010: 48000, 0b1011: 96000}
_SIZE_TBL = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32}


def parse_streaminfo(data: bytes) -> dict:
    if data[:4] != MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        hdr = data[pos:pos + 4]
        last = hdr[0] & 0x80
        btype = hdr[0] & 0x7F
        blen = int.from_bytes(hdr[1:4], "big")
        body = data[pos + 4:pos + 4 + blen]
        if btype == 0:
            br = _BitReader(body)
            info = {
                "min_blocksize": br.read(16), "max_blocksize": br.read(16),
                "min_framesize": br.read(24), "max_framesize": br.read(24),
                "sample_rate": br.read(20),
                "channels": br.read(3) + 1,
                "bits_per_sample": br.read(5) + 1,
                "total_samples": br.read(36),
                "md5": body[18:34],
            }
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")
    info["frames_at"] = pos
    return info


def decode_flac(data: bytes, verify_md5: bool = True) -> tuple[np.ndarray, int]:
    """Decode to (int16 array shape (n,) or (n, ch), sample_rate)."""
    info = parse_streaminfo(data)
    if info["bits_per_sample"] != 16:
        raise NotImplementedError("FLAC subset: 16-bit only")
    nch = info["channels"]
    pos = info["frames_at"]
    chunks = []
    total = 0
    while pos < len(data) and total < info["total_samples"]:
        blk, pos = _decode_frame(data, pos, info)
        chunks.append(blk)
        total += len(blk)
    out = np.concatenate(chunks)[:info["total_samples"]]
    if verify_md5:
        got = hashlib.md5(out.astype("<i2").tobytes()).hexdigest()
        want = info["md5"].hex()
        if want != "0" * 32 and got != want:
            raise ValueError("FLAC: MD5 signature mismatch (corrupt stream)")
    if nch == 1:
        out = out[:, 0]
    return out.astype(np.int16), info["sample_rate"]


def _decode_frame(data: bytes, pos: int, info: dict) -> tuple[np.ndarray, int]:
    br = _BitReader(data, pos)
    if br.read(14) != 0b11111111111110:
        raise ValueError("FLAC: lost frame sync")
    br.read(1)                              # reserved
    br.read(1)                              # blocking strategy
    bs_code = br.read(4)
    rate_code = br.read(4)
    ch_code = br.read(4)
    size_code = br.read(3)
    br.read(1)                              # reserved
    _read_utf8_number(br)
    if bs_code == 0b0110:
        bs = br.read(8) + 1
    elif bs_code == 0b0111:
        bs = br.read(16) + 1
    else:
        bs = _BLOCKSIZE_TBL[bs_code]
    if rate_code == 0b1100:
        br.read(8)
    elif rate_code in (0b1101, 0b1110):
        br.read(16)
    hdr_len = br.tell_bytes() - pos
    if crc8(data[pos:pos + hdr_len]) != br.read(8):
        raise ValueError("FLAC: frame header CRC-8 mismatch")

    bits = info["bits_per_sample"] if size_code == 0 else _SIZE_TBL[size_code]

    if ch_code < 0b1000:                    # independent channels
        nch = ch_code + 1
        chans = [_decode_subframe(br, bs, bits) for _ in range(nch)]
    elif ch_code == 0b1000:                 # left/side
        left = _decode_subframe(br, bs, bits)
        side = _decode_subframe(br, bs, bits + 1)
        chans = [left, left - side]
    elif ch_code == 0b1001:                 # right/side
        side = _decode_subframe(br, bs, bits + 1)
        right = _decode_subframe(br, bs, bits)
        chans = [right + side, right]
    elif ch_code == 0b1010:                 # mid/side
        mid = _decode_subframe(br, bs, bits)
        side = _decode_subframe(br, bs, bits + 1)
        m2 = (mid << 1) | (side & 1)
        chans = [(m2 + side) >> 1, (m2 - side) >> 1]
    else:
        raise ValueError(f"FLAC: reserved channel assignment {ch_code:#06b}")
    br.align()
    body_len = br.tell_bytes() - pos
    if br.tell_bytes() + 2 > len(data):
        raise ValueError("FLAC: bitstream truncated (missing frame CRC)")
    want = struct.unpack(">H", data[br.tell_bytes():br.tell_bytes() + 2])[0]
    if crc16(data[pos:pos + body_len]) != want:
        raise ValueError("FLAC: frame CRC-16 mismatch")
    return np.stack(chans, axis=1), br.tell_bytes() + 2


def _signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


def _decode_subframe(br: _BitReader, bs: int, bits: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("FLAC: bad subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bits - wasted
    if stype == 0:                           # CONSTANT
        x = np.full(bs, _signed(br.read(eff), eff), np.int64)
    elif stype == 1:                         # VERBATIM
        x = np.array([_signed(br.read(eff), eff) for _ in range(bs)],
                     np.int64)
    elif 8 <= stype <= 12:                   # FIXED order 0-4
        order = stype - 8
        warm = np.array([_signed(br.read(eff), eff) for _ in range(order)],
                        np.int64)
        res = _decode_residual(br, bs, order)
        x = _fixed_restore(res, warm) if order else res.astype(np.int64)
    elif stype >= 32:                        # LPC, order 1-32
        order = (stype & 0x1F) + 1
        warm = np.array([_signed(br.read(eff), eff) for _ in range(order)],
                        np.int64)
        prec = br.read(4)
        if prec == 0b1111:
            raise ValueError("FLAC: invalid LPC precision code")
        prec += 1
        shift = _signed(br.read(5), 5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        q = [_signed(br.read(prec), prec) for _ in range(order)]
        res = _decode_residual(br, bs, order)
        x = _lpc_restore(res, warm, q, shift)
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    return x << wasted


def _decode_residual(br: _BitReader, bs: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    po = br.read(4)
    out = []
    nparts = 1 << po
    for p in range(nparts):
        cnt = (bs >> po) - (order if p == 0 else 0)
        k = br.read(pbits)
        if k == esc:
            raw = br.read(5)
            vals = [_signed(br.read(raw), raw) if raw else 0
                    for _ in range(cnt)]
            out.extend(vals)
        else:
            for _ in range(cnt):
                q = br.read_unary()
                z = (q << k) | (br.read(k) if k else 0)
                out.append((z >> 1) ^ -(z & 1))
    return np.array(out, np.int64)
