"""Hand-built FLAC frames exercising decoder features the encoder
never emits: LPC subframes, Rice2 + multi-partition residuals, wasted
bits, VERBATIM, and the three stereo decorrelation modes."""

import struct

import numpy as np

from hydra_ray.sources.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_coded,
    _zigzag,
    decode_flac,
)


def _streaminfo(bs, rate, nch, total):
    si = bytearray()
    si += struct.pack(">HH", bs, bs)
    si += b"\x00\x00\x00" * 2
    tail = (rate << 44) | ((nch - 1) << 41) | (15 << 36) | total
    si += tail.to_bytes(8, "big")
    si += b"\x00" * 16  # md5 unset
    return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)


def _frame_header(bs, ch_code, idx):
    bw = _BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(0b0111, 4)
    bw.write(0b0000, 4)
    bw.write(ch_code, 4)
    bw.write(0b100, 3)  # 16-bit
    bw.write(0, 1)
    hdr = bytes(bw.buf) + _utf8_coded(idx) + struct.pack(">H", bs - 1)
    return hdr + bytes([_crc8(hdr)])


def _write_rice(bw, res, param, pbits):
    bw.write(param, pbits)
    for u in _zigzag(np.asarray(res, np.int64)):
        bw.write_unary(int(u) >> param)
        bw.write(int(u) & ((1 << param) - 1), param)


def _finish(hdr, body):
    body.pad_to_byte()
    frame = hdr + body.bytes()
    return frame + struct.pack(">H", _crc16(frame))


def test_lpc_rice2_partitions_and_wasted_bits():
    bs = 8
    hdr = _frame_header(bs, ch_code=0, idx=0)
    body = _BitWriter()
    # LPC order 1: x[i] = res[i] + ((4 * x[i-1]) >> 2)  == res + x[i-1]
    # with 1 wasted bit: decoded samples are shifted left by 1
    want_half = np.array([10, 11, 13, 16, 20, 25, 31, 38], np.int64)
    res = np.diff(want_half)  # order-1 residuals
    body.write(0, 1)
    body.write(0b100000, 6)  # LPC order 1
    body.write(1, 1)  # wasted bits flag
    body.write_unary(0)  # count-1 = 0 → 1 wasted bit
    body.write(int(want_half[0]) & 0x7FFF, 15)  # warmup at bps-1
    body.write(5 - 1, 4)  # precision 5
    body.write(2, 5)  # shift 2
    body.write(4, 5)  # coef = 4
    body.write(1, 2)  # residual method: rice2
    body.write(1, 4)  # partition order 1 → 2 partitions
    _write_rice(body, res[:3], 2, 5)  # first partition: bs/2 - order
    _write_rice(body, res[3:], 3, 5)
    blob = _streaminfo(bs, 8000, 1, bs) + _finish(hdr, body)
    out, rate = decode_flac(blob)
    assert rate == 8000
    assert (out[:, 0] == (want_half << 1).astype(np.int16)).all()


def test_verbatim_subframe():
    bs = 5
    vals = np.array([7, -3, 32767, -32768, 0], np.int64)
    hdr = _frame_header(bs, ch_code=0, idx=0)
    body = _BitWriter()
    body.write(0, 1)
    body.write(1, 6)  # VERBATIM
    body.write(0, 1)
    for v in vals:
        body.write(int(v) & 0xFFFF, 16)
    blob = _streaminfo(bs, 16000, 1, bs) + _finish(hdr, body)
    out, _ = decode_flac(blob)
    assert (out[:, 0] == vals.astype(np.int16)).all()


def _const_subframe(body, v, bits):
    body.write(0, 1)
    body.write(0, 6)
    body.write(0, 1)
    body.write(int(v) & ((1 << bits) - 1), bits)


def test_stereo_decorrelation_modes():
    bs = 4
    # target: left = 100, right = 40 everywhere
    mid, side = (100 + 40) >> 1, 100 - 40
    for ch_code, (a, b, bits_a, bits_b) in {
        8: (100, side, 16, 17),   # left/side
        9: (side, 40, 17, 16),    # side/right
        10: (mid, side, 16, 17),  # mid/side
    }.items():
        hdr = _frame_header(bs, ch_code=ch_code, idx=0)
        body = _BitWriter()
        _const_subframe(body, a, bits_a)
        _const_subframe(body, b, bits_b)
        blob = _streaminfo(bs, 8000, 2, bs) + _finish(hdr, body)
        out, _ = decode_flac(blob)
        assert (out[:, 0] == 100).all() and (out[:, 1] == 40).all(), ch_code


def test_escape_partition_raw_bits():
    bs = 4
    vals = np.array([1000, -2000, 3000, -4000], np.int64)
    hdr = _frame_header(bs, ch_code=0, idx=0)
    body = _BitWriter()
    body.write(0, 1)
    body.write(0b001000, 6)  # FIXED order 0
    body.write(0, 1)
    body.write(0, 2)  # rice 4-bit
    body.write(0, 4)  # one partition
    body.write(0b1111, 4)  # escape
    body.write(13, 5)  # 13 raw bits per residual
    for v in vals:
        body.write(int(v) & 0x1FFF, 13)
    blob = _streaminfo(bs, 8000, 1, bs) + _finish(hdr, body)
    out, _ = decode_flac(blob)
    assert (out[:, 0] == vals.astype(np.int16)).all()
