"""FLAC codec — stdlib+numpy, no libFLAC (RFC 9639 bitstream).

Implements the public FLAC format: fLaC marker + STREAMINFO, frame
headers with UTF-8-style coded numbers and CRC-8, subframes
(CONSTANT / VERBATIM / FIXED orders 0–4 / LPC up to order 32), Rice
and Rice2 residual coding with partitions and raw-bits escapes, wasted
bits, the four channel assignments (independent, left/side,
right/side, mid/side), frame CRC-16, and the STREAMINFO MD5 of the
unencoded samples.

Scope (documented subset):

- encoder: always writes a spec-valid stream — 16-bit, constant block
  size, independent channels, per-subframe best-of FIXED orders 0–2
  (or CONSTANT for flat blocks), single-partition Rice with escape
  fallback, correct CRCs and MD5.
- decoder: reads everything above plus LPC subframes, multi-partition
  residuals, Rice2, wasted bits and the stereo decorrelation modes —
  i.e. the full lossless layer; only non-16-bit depths beyond 8/16/24
  and multi-channel (>2) streams raise NotImplementedError.

Round-trip equality is pinned by the ``flac_roundtrip`` query oracle
and hypothesis fuzz tests.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


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


class _BitWriter:
    """MSB-first bit packer (FLAC convention)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def pad_to_byte(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos_bytes: int = 0) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = pos_bytes * 8

    def read(self, nbits: int) -> int:
        v = 0
        for b in self.bits[self.pos : self.pos + nbits]:
            v = (v << 1) | int(b)
        self.pos += nbits
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v & (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        nz = np.argmax(self.bits[self.pos :])
        if not self.bits[self.pos + nz]:
            raise ValueError("unterminated unary code")
        self.pos += int(nz) + 1
        return int(nz)

    def align_byte(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _utf8_coded(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame/sample index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for k in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_coded(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        v = (v << 6) | (br.read(8) & 0x3F)
    return v


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _zigzag(res: np.ndarray) -> np.ndarray:
    return np.where(res >= 0, res.astype(np.int64) << 1, ((-res.astype(np.int64)) << 1) - 1)


def _rice_cost(u: np.ndarray, param: int) -> int:
    return int((u >> param).sum()) + len(u) * (param + 1)


def encode_flac(samples: np.ndarray, rate: int, block_size: int = 4096) -> bytes:
    """int16 samples (n,) or (n, channels≤2) → FLAC bytes (16-bit,
    fixed block size, independent channels, FIXED-predictor Rice)."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, nch = samples.shape
    if nch > 2:
        raise ValueError("encode_flac supports mono/stereo")
    if n == 0:
        raise ValueError("no samples")
    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    tail = (rate << 44) | ((nch - 1) << 41) | ((16 - 1) << 36) | n
    si += tail.to_bytes(8, "big")
    si += md5
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    for fi, start in enumerate(range(0, n, block_size)):
        blk = samples[start : start + block_size]
        out += _encode_frame(blk, fi, rate, nch, full_block=block_size)
    return bytes(out)


def _encode_frame(blk: np.ndarray, frame_idx: int, rate: int, nch: int, full_block: int) -> bytes:
    bs = len(blk)
    bw = _BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)  # reserved
    bw.write(0, 1)  # fixed block size strategy
    bw.write(0b0111, 4)  # block size: 16-bit value follows header number
    bw.write(0b0000, 4)  # sample rate: from STREAMINFO
    bw.write(nch - 1, 4)  # independent channels
    bw.write(0b100, 3)  # 16 bits per sample
    bw.write(0, 1)  # reserved
    header = bytes(bw.buf)  # 4 bytes so far
    header += _utf8_coded(frame_idx)
    header += struct.pack(">H", bs - 1)
    header += bytes([_crc8(header)])
    body = _BitWriter()
    for c in range(nch):
        _encode_subframe(body, blk[:, c].astype(np.int64))
    body.pad_to_byte()
    frame = header + body.bytes()
    return frame + struct.pack(">H", _crc16(frame))


def _encode_subframe(bw: _BitWriter, x: np.ndarray) -> None:
    bw.write(0, 1)  # padding
    if (x == x[0]).all():
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)  # no wasted bits
        bw.write(int(x[0]) & 0xFFFF, 16)
        return
    # pick the cheapest FIXED order 0-2 (full search over the residual)
    best = None
    for order in range(0, min(3, len(x))):
        res = x.copy()
        for _ in range(order):
            res = np.diff(res)
        warm = x[:order]
        u = _zigzag(res)
        # rice parameter search
        mean = max(1.0, float(u.mean()) if len(u) else 1.0)
        p0 = max(0, int(np.log2(mean)))
        lo = min(14, max(0, p0 - 1))  # param 15 is the escape code
        cand = list(range(lo, min(14, p0 + 2) + 1)) or [lo]
        costs = [(p, _rice_cost(u, p)) for p in cand]
        p, cost = min(costs, key=lambda t: t[1])
        total = order * 16 + cost
        if best is None or total < best[0]:
            best = (total, order, warm, u, p, res)
    _total, order, warm, u, p, res = best
    bw.write(0b001000 | order, 6)  # FIXED order
    bw.write(0, 1)  # no wasted bits
    for w in warm:
        bw.write(int(w) & 0xFFFF, 16)
    bw.write(0, 2)  # residual method: rice 4-bit
    bw.write(0, 4)  # partition order 0 → one partition
    # escape if any quotient would be huge (pathological residuals)
    if len(u) and int((u >> p).max()) > 1 << 12:
        bw.write(0b1111, 4)  # escape
        nbits = max(1, int(max(res.max(), -res.min() - 1)).bit_length() + 1) if len(res) else 1
        nbits = min(31, nbits)
        bw.write(nbits, 5)
        for r in res:
            bw.write(int(r) & ((1 << nbits) - 1), nbits)
        return
    bw.write(p, 4)
    for val in u:
        bw.write_unary(int(val) >> p)
        bw.write(int(val) & ((1 << p) - 1), p)


def decode_flac(data: bytes):
    """FLAC bytes → (int16 samples (n, channels), rate). Verifies frame
    CRCs and the STREAMINFO MD5."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC file")
    pos = 4
    streaminfo = None
    while True:
        hdr = data[pos : pos + 4]
        last = hdr[0] & 0x80
        btype = hdr[0] & 0x7F
        ln = int.from_bytes(hdr[1:4], "big")
        if btype == 0:
            streaminfo = data[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        if last:
            break
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")
    tail = int.from_bytes(streaminfo[10:18], "big")
    rate = tail >> 44
    nch = ((tail >> 41) & 0x7) + 1
    bps = ((tail >> 36) & 0x1F) + 1
    total = tail & ((1 << 36) - 1)
    if nch > 2:
        raise NotImplementedError("more than 2 channels needs an injected decoder")
    if bps not in (8, 16, 24):
        raise NotImplementedError(f"{bps}-bit FLAC needs an injected decoder")
    md5_expect = streaminfo[18:34]

    br = _BitReader(data, pos)
    chans = [[] for _ in range(nch)]
    got = 0
    while total == 0 or got < total:
        if br.pos + 16 > len(br.bits):
            break
        frame_start_bit = br.pos
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _num = _read_utf8_coded(br)
        if bs_code == 0b0110:
            bs = br.read(8) + 1
        elif bs_code == 0b0111:
            bs = br.read(16) + 1
        elif bs_code == 0b0001:
            bs = 192
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 0b1100:
            br.read(8)
        elif sr_code in (0b1101, 0b1110):
            br.read(16)
        _ss_map = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b000: bps}
        fr_bps = _ss_map.get(ss_code)
        if fr_bps is None:
            raise ValueError("bad sample-size code")
        # CRC-8 covers the header bytes (bit-aligned by construction)
        hdr_bytes = np.packbits(br.bits[frame_start_bit : br.pos]).tobytes()
        crc8 = br.read(8)
        if _crc8(hdr_bytes) != crc8:
            raise ValueError("frame header CRC-8 mismatch")
        if ch_code < 8:
            fr_nch = ch_code + 1
            modes = [0] * fr_nch
        else:
            fr_nch = 2
            modes = {8: [0, 1], 9: [1, 0], 10: [0, 2]}[ch_code]  # side gets +1 bit
        sub = []
        for c in range(fr_nch):
            extra = 1 if (ch_code == 8 and c == 1) or (ch_code == 9 and c == 0) or (
                ch_code == 10 and c == 1
            ) else 0
            sub.append(_decode_subframe(br, bs, fr_bps + extra))
        br.align_byte()
        frame_bytes = np.packbits(br.bits[frame_start_bit : br.pos]).tobytes()
        crc16 = br.read(16)
        if _crc16(frame_bytes) != crc16:
            raise ValueError("frame CRC-16 mismatch")
        # stereo decorrelation
        if ch_code == 8:  # left/side
            left = sub[0]
            right = left - sub[1]
            sub = [left, right]
        elif ch_code == 9:  # right/side: sub[0]=side, sub[1]=right? no: side,right
            right = sub[1]
            left = right + sub[0]
            sub = [left, right]
        elif ch_code == 10:  # mid/side
            mid, side = sub
            lr2 = (mid.astype(np.int64) << 1) | (side & 1)
            sub = [(lr2 + side) >> 1, (lr2 - side) >> 1]
        for c in range(nch):
            chans[c].append(np.asarray(sub[c], dtype=np.int64))
        got += bs
    arr = np.stack([np.concatenate(ch)[: total or None] for ch in chans], axis=1)
    out = arr.astype(np.int16) if bps == 16 else arr.astype(np.int32)
    # STREAMINFO MD5 is over little-endian interleaved samples at bps;
    # verify for the 16-bit layout (a zeroed md5 field means unset)
    if bps == 16 and md5_expect != b"\x00" * 16:
        if hashlib.md5(out.astype("<i2").tobytes()).digest() != md5_expect:
            raise ValueError("decoded sample MD5 mismatch")
    return out, rate


def _decode_subframe(br: _BitReader, bs: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("bad subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        x = np.full(bs, br.read_signed(bps), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        x = np.array([br.read_signed(bps) for _ in range(bs)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _decode_residual(br, bs, order)
        x = np.empty(bs, dtype=np.int64)
        x[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, bs):
            x[i] = res[i - order] + sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
    elif stype >= 32:  # LPC
        order = (stype & 31) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid qlp precision")
        shift = br.read_signed(5)
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, bs, order)
        x = np.empty(bs, dtype=np.int64)
        x[:order] = warm
        for i in range(order, bs):
            acc = sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
            x[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    return x << wasted


def _decode_residual(br: _BitReader, bs: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    out = []
    for p in range(nparts):
        cnt = (bs >> porder) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            nbits = br.read(5)
            vals = np.array(
                [br.read_signed(nbits) if nbits else 0 for _ in range(cnt)], dtype=np.int64
            )
        else:
            vals = np.empty(cnt, dtype=np.int64)
            for i in range(cnt):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                vals[i] = (u >> 1) if not (u & 1) else -((u + 1) >> 1)
        out.append(vals)
    return np.concatenate(out) if out else np.array([], dtype=np.int64)
