"""FLAC codec from scratch (RFC 9639 / the published FLAC format spec):
lossless audio via fixed linear predictors + Rice-coded residuals.

Like codec/jpeg.py and codec/shp.py, this exists to make a compressed
media format REAL in an environment with no codec libraries — pure
integer math off the public spec. Scope (the compact profile every FLAC
reader accepts):

  encoder: 16-bit PCM, independent channels, fixed blocksize 4096,
           CONSTANT / FIXED(0..2) subframes chosen by trial cost,
           single-partition Rice residuals (escape to raw when cheaper);
  decoder: CONSTANT / VERBATIM / FIXED(0..4) subframes, both Rice
           methods (4- and 5-bit parameters), any partition order,
           Rice escapes, UTF-8 frame numbers, CRC-8 header and CRC-16
           frame verification. LPC subframes (types 32..63) raise
           NotImplementedError — this encoder never emits them.

Bit layout references (RFC 9639): §9.1 frame header (14-bit sync
0b11111111111110, blocking strategy, coded block size / sample rate,
channel assignment, sample size), §9.2 subframe headers, §9.2.7 coded
residual (partition order, Rice parameter, escape), §8.2 STREAMINFO.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"fLaC"

# fixed predictor coefficients per order (RFC 9639 §9.2.5):
# residual_o(n) = o-th forward difference of the signal
_FIXED_ORDERS = 5


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        return bytes(self.buf)


class _BitReader:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            if self.byte >= len(self.buf):
                raise ValueError("FLAC bitstream truncated")
            v = (v << 1) | ((self.buf[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_coded(n: int) -> bytes:
    """RFC 9639 §9.1.5: frame numbers use UTF-8-style variable coding."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    n_bytes = 2
    while bits > 5 * n_bytes + 1 and n_bytes < 7:  # k bytes carry 5k+1 bits
        n_bytes += 1
    head_bits = 7 - n_bytes
    out.append((0xFF00 >> n_bytes & 0xFF) | (n >> (6 * (n_bytes - 1)) & ((1 << head_bits) - 1)))
    for i in range(n_bytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _read_utf8_coded(r: "_BitReader") -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n_bytes = 0
    mask = 0x80
    while b0 & mask:
        n_bytes += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(n_bytes - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad UTF-8-coded frame number")
        v = (v << 6) | (b & 0x3F)
    return v


def _zigzag(res: np.ndarray) -> np.ndarray:
    return np.where(res >= 0, res << 1, ((-res) << 1) - 1).astype(np.int64)


def _rice_cost(z: np.ndarray, param: int) -> int:
    return int((z >> param).sum()) + len(z) * (1 + param)


def _best_rice(z: np.ndarray) -> int:
    mean = z.mean() if len(z) else 0.0
    guess = max(0, int(np.log2(mean + 1)))
    best_p, best_c = 0, None
    for p in range(max(0, guess - 2), min(15, guess + 3)):
        c = _rice_cost(z, p)
        if best_c is None or c < best_c:
            best_p, best_c = p, c
    return best_p


def encode_flac(samples: np.ndarray, sample_rate: int, block_size: int = 4096) -> bytes:
    """Encode int16 PCM (shape (n,) or (n, channels)) to a FLAC stream.
    Lossless: parse_flac returns the identical integers."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.dtype != np.int16:
        raise ValueError("encode_flac expects int16 samples")
    n, n_ch = s.shape
    if not 1 <= n_ch <= 8:
        raise ValueError("1..8 channels")

    out = bytearray(MAGIC)
    # STREAMINFO, last-metadata flag set (RFC 9639 §8.2)
    si = _BitWriter()
    si.write(block_size, 16)  # min block size
    si.write(block_size, 16)  # max block size
    si.write(0, 24)           # min frame size (unknown)
    si.write(0, 24)           # max frame size (unknown)
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(16 - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16  # MD5 unset (all zero = unknown)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    x = s.astype(np.int64)
    for frame_idx, start in enumerate(range(0, n, block_size)):
        blk = x[start : start + block_size]
        out += _encode_frame(blk, frame_idx, block_size, sample_rate, n_ch)
    return bytes(out)


_BLOCKSIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                    8192: 13, 16384: 14, 32768: 15}


def _encode_frame(blk: np.ndarray, frame_idx: int, block_size: int,
                  sample_rate: int, n_ch: int) -> bytes:
    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 1)  # reserved
    w.write(0, 1)  # fixed blocking strategy (frame number = frame index)
    nb = len(blk)
    bs_code = _BLOCKSIZE_CODES.get(nb, 7)  # 7: 16-bit value at end of header
    w.write(bs_code, 4)
    w.write(0, 4)   # sample rate: from STREAMINFO
    w.write(n_ch - 1, 4)  # independent channels
    w.write(0b100, 3)     # 16 bits per sample
    w.write(0, 1)   # reserved
    for b in _utf8_coded(frame_idx):
        w.write(b, 8)
    if bs_code == 7:
        w.write(nb - 1, 16)
    header = w.bytes()
    assert w.nbits == 0
    header += bytes([_crc8(header)])

    body = _BitWriter()
    for ch in range(n_ch):
        _encode_subframe(body, blk[:, ch])
    body.align()
    frame = header + body.bytes()
    return frame + struct.pack(">H", _crc16(frame))


def _encode_subframe(w: "_BitWriter", sig: np.ndarray) -> None:
    if (sig == sig[0]).all():
        w.write(0, 1); w.write(0, 6); w.write(0, 1)  # CONSTANT
        w.write(int(sig[0]) & 0xFFFF, 16)
        return
    # choose the cheapest fixed order 0..2 by rice cost of residuals
    best = None
    for order in range(0, 3):
        if len(sig) <= order:
            continue
        res = np.diff(sig, n=order) if order else sig.copy()
        z = _zigzag(res)
        p = _best_rice(z)
        cost = order * 16 + _rice_cost(z, p)
        if best is None or cost < best[0]:
            best = (cost, order, res, z, p)
    _, order, res, z, p = best
    w.write(0, 1)
    w.write(0b001000 | order, 6)  # FIXED subframe, given order
    w.write(0, 1)  # no wasted bits
    for v in sig[:order]:  # warm-up samples, verbatim at sample size
        w.write(int(v) & 0xFFFF, 16)
    # coded residual: method 0 (4-bit rice), partition order 0
    w.write(0, 2)
    w.write(0, 4)
    raw_bits = int(z.max()).bit_length() + 1 if len(z) else 1
    if _rice_cost(z, p) > len(z) * raw_bits + 5:
        w.write(0b1111, 4)  # escape: raw residuals
        w.write(raw_bits, 5)
        for v in res:
            w.write(int(v) & ((1 << raw_bits) - 1), raw_bits)
    else:
        w.write(p, 4)
        for v in z:
            w.write_unary(int(v) >> p)
            if p:
                w.write(int(v) & ((1 << p) - 1), p)


def parse_flac(buf: bytes) -> dict:
    """Decode a FLAC stream -> {sample_rate, n_channels, bits,
    samples(float64 (n, ch) in [-1, 1]), samples_int(int32 (n, ch))}.
    Verifies CRC-8 of every frame header and CRC-16 of every frame."""
    if buf[:4] != MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(buf):
            raise ValueError("FLAC metadata truncated")
        head = buf[pos]
        size = int.from_bytes(buf[pos + 1 : pos + 4], "big")
        btype = head & 0x7F
        if btype == 0:
            r = _BitReader(buf, pos + 4)
            r.read(16); r.read(16); r.read(24); r.read(24)
            rate = r.read(20)
            n_ch = r.read(3) + 1
            bits = r.read(5) + 1
            total = r.read(36)
            info = (rate, n_ch, bits, total)
        pos += 4 + size
        if head & 0x80:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, n_ch, bits, total = info
    if bits != 16:
        raise NotImplementedError(f"FLAC bit depth {bits} (this decoder: 16)")

    chunks = []
    got = 0
    while got < total:
        blk, pos = _decode_frame(buf, pos, n_ch, bits)
        chunks.append(blk)
        got += len(blk)
    samples = np.vstack(chunks)[:total]
    return {
        "sample_rate": rate,
        "n_channels": n_ch,
        "bits": bits,
        "samples_int": samples.astype(np.int32),
        "samples": samples.astype(np.float64) / 32768.0,
    }


_BS_FROM_CODE = {v: k for k, v in _BLOCKSIZE_CODES.items()}


def _decode_frame(buf: bytes, pos: int, n_ch: int, bits: int) -> tuple[np.ndarray, int]:
    r = _BitReader(buf, pos)
    if r.read(14) != 0b11111111111110:
        raise ValueError("bad frame sync")
    r.read(1)
    r.read(1)  # blocking strategy
    bs_code = r.read(4)
    sr_code = r.read(4)
    ch_asgn = r.read(4)
    r.read(3)  # sample size code (STREAMINFO governs here)
    r.read(1)
    _read_utf8_coded(r)
    if bs_code == 6:
        nb = r.read(8) + 1
    elif bs_code == 7:
        nb = r.read(16) + 1
    else:
        nb = _BS_FROM_CODE.get(bs_code)
        if nb is None:
            raise ValueError(f"reserved block size code {bs_code}")
    if sr_code == 12:
        r.read(8)
    elif sr_code in (13, 14):
        r.read(16)
    r.align()
    header_end = r.byte
    if _crc8(buf[pos:header_end]) != buf[header_end]:
        raise ValueError("frame header CRC-8 mismatch")
    r = _BitReader(buf, header_end + 1)
    if ch_asgn >= 8:
        raise NotImplementedError("stereo decorrelation modes not emitted by this encoder")
    chans = []
    for _ in range(ch_asgn + 1):
        chans.append(_decode_subframe(r, nb, bits))
    r.align()
    frame_end = r.byte
    (crc,) = struct.unpack_from(">H", buf, frame_end)
    if _crc16(buf[pos:frame_end]) != crc:
        raise ValueError("frame CRC-16 mismatch")
    return np.column_stack(chans), frame_end + 2


def _signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v >> (bits - 1) else v


def _decode_subframe(r: "_BitReader", nb: int, bits: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    eff = bits - wasted
    if stype == 0:  # CONSTANT
        v = _signed(r.read(eff), eff) << wasted
        return np.full(nb, v, dtype=np.int64)
    if stype == 1:  # VERBATIM
        return np.array(
            [_signed(r.read(eff), eff) << wasted for _ in range(nb)], dtype=np.int64
        )
    if 8 <= stype <= 12:  # FIXED, order = stype & 7
        order = stype & 7
        warm = [_signed(r.read(eff), eff) for _ in range(order)]
        res = _decode_residual(r, nb, order)
        sig = np.empty(nb, dtype=np.int64)
        if order == 0:
            sig = res
        else:
            # invert the order-th forward difference via the recurrence
            sig[:order] = warm
            for i in range(order, nb):
                if order == 1:
                    sig[i] = res[i - order] + sig[i - 1]
                elif order == 2:
                    sig[i] = res[i - order] + 2 * sig[i - 1] - sig[i - 2]
                elif order == 3:
                    sig[i] = res[i - order] + 3 * sig[i - 1] - 3 * sig[i - 2] + sig[i - 3]
                else:
                    sig[i] = (
                        res[i - order] + 4 * sig[i - 1] - 6 * sig[i - 2]
                        + 4 * sig[i - 3] - sig[i - 4]
                    )
        return sig << wasted
    raise NotImplementedError(f"subframe type {stype} (LPC) not emitted by this encoder")


def _decode_residual(r: "_BitReader", nb: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = r.read(4)
    n_parts = 1 << part_order
    out = []
    for part in range(n_parts):
        count = (nb >> part_order) - (order if part == 0 else 0)
        p = r.read(pbits)
        if p == escape:
            raw = r.read(5)
            vals = np.array(
                [_signed(r.read(raw), raw) if raw else 0 for _ in range(count)],
                dtype=np.int64,
            )
        else:
            vs = np.empty(count, dtype=np.int64)
            for i in range(count):
                q = r.read_unary()
                v = (q << p) | (r.read(p) if p else 0)
                vs[i] = (v >> 1) ^ -(v & 1)  # unzigzag
            vals = vs
        out.append(vals)
    return np.concatenate(out) if out else np.empty(0, dtype=np.int64)
