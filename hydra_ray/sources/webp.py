"""WebP lossless (VP8L) codec — stdlib+numpy, no libwebp.

Implements the public VP8L bitstream format (the "WebP Lossless
Bitstream Specification"): RIFF/WEBP/VP8L container, LSB-first bit
packing, canonical prefix codes in the DEFLATE bit convention, the
code-length meta-code with 17/18 zero-run repeats, simple (1–2 symbol)
codes, the subtract-green transform, and per-pixel G-R-B-A literal
coding.

Scope (documented subset, mirrors the reference's outsource-to-libwebp
posture — the reference never decodes media itself):

- encoder: always writes a spec-valid stream — subtract-green
  transform, no color cache, single prefix-code group, literal-only
  coding (no LZ77 backward references, which are an optional encoder
  choice per the spec).
- decoder: reads everything the encoder can produce plus general
  code-length codes; LZ77 backward references, color cache and the
  predictor / color / color-indexing transforms raise
  NotImplementedError (inject a full decoder for wild WebP files, the
  stages/multimodal.py seam).

Round-trip equality is pinned by the ``webp_roundtrip`` query oracle
and property-fuzz tests (tests/test_analysis/test_codecs_property.py
pattern).
"""

from __future__ import annotations

import struct
from collections import Counter

import numpy as np

# code-length symbols appear in the stream header in this fixed order
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
_GREEN_ALPHABET = 256 + 24  # literals + LZ77 length codes (cache off)


class _BitWriter:
    """LSB-first bit packer (VP8L convention)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, nbits: int) -> None:
        """Emit a canonical prefix code MSB-first (DEFLATE convention)."""
        for i in range(nbits - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytes(self.buf)
        if self.n:
            out += bytes([self.acc & 0xFF])
        return out


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, nbits: int) -> int:
        v = 0
        for i in range(nbits):
            byte = self.data[(self.pos + i) >> 3]
            v |= ((byte >> ((self.pos + i) & 7)) & 1) << i
        self.pos += nbits
        return v

    def read_symbol(self, tree: "_PrefixCode") -> int:
        if tree.single is not None:
            return tree.single
        code = 0
        length = 0
        while True:
            code = (code << 1) | self.read(1)
            length += 1
            sym = tree.table.get((length, code))
            if sym is not None:
                return sym
            if length > 15:
                raise ValueError("invalid prefix code in VP8L stream")


class _PrefixCode:
    """Canonical prefix code from per-symbol lengths (DEFLATE
    canonicalization: codes assigned in (length, symbol) order)."""

    def __init__(self, lengths: dict[int, int]) -> None:
        used = sorted((ln, s) for s, ln in lengths.items() if ln > 0)
        self.single = None
        self.table: dict[tuple[int, int], int] = {}
        self.codes: dict[int, tuple[int, int]] = {}
        if not used:
            raise ValueError("empty prefix code")
        code = 0
        prev_len = used[0][0]
        for ln, s in used:
            code <<= ln - prev_len
            prev_len = ln
            self.table[(ln, code)] = s
            self.codes[s] = (code, ln)
            code += 1
        if code != (1 << prev_len) and len(used) > 1:
            raise ValueError("over- or under-subscribed prefix code")

    @classmethod
    def single_symbol(cls, sym: int) -> "_PrefixCode":
        pc = cls.__new__(cls)
        pc.single = sym
        pc.table = {}
        pc.codes = {sym: (0, 0)}
        return pc


def _limited_lengths(freqs: dict[int, int], limit: int) -> dict[int, int]:
    """Length-limited prefix-code lengths via boundary package-merge."""
    syms = sorted(freqs)
    n = len(syms)
    if n == 0:
        return {}
    if n == 1:
        return {syms[0]: 1}  # one-symbol codes get an explicit 1-bit code
    items = sorted((freqs[s], (s,)) for s in syms)
    prev: list[tuple[int, tuple]] = []
    for _ in range(limit):
        pkgs = [
            (prev[i][0] + prev[i + 1][0], prev[i][1] + prev[i + 1][1])
            for i in range(0, len(prev) - 1, 2)
        ]
        prev = sorted(items + pkgs)
    counts: Counter = Counter()
    for _, ids in prev[: 2 * n - 2]:
        counts.update(ids)
    return dict(counts)


def _write_prefix_code(bw: _BitWriter, freqs: dict[int, int], alphabet: int) -> _PrefixCode:
    """Serialize one prefix code (simple when ≤2 symbols fit the 8-bit
    fields, else the normal code-length-coded form) and return the
    code for subsequent symbol emission."""
    used = sorted(freqs)
    if 1 <= len(used) <= 2 and all(s < 256 for s in used):
        bw.write(1, 1)  # simple code
        bw.write(len(used) - 1, 1)
        bw.write(1, 1)  # first symbol in 8 bits
        bw.write(used[0], 8)
        if len(used) == 2:
            bw.write(used[1], 8)
            return _PrefixCode({used[0]: 1, used[1]: 1})
        return _PrefixCode.single_symbol(used[0])

    bw.write(0, 1)  # normal code
    lengths = _limited_lengths(freqs, 15)
    code = _PrefixCode(lengths)
    # code-length sequence with 17/18 zero runs (trailing zeros included
    # — we do not use the max_symbol shortcut)
    seq: list[tuple[int, int, int]] = []  # (cl symbol, extra value, extra bits)
    i = 0
    while i < alphabet:
        if lengths.get(i, 0) == 0:
            j = i
            while j < alphabet and lengths.get(j, 0) == 0:
                j += 1
            run = j - i
            while run:
                if run >= 11:
                    r = min(run, 138)
                    seq.append((18, r - 11, 7))
                    run -= r
                elif run >= 3:
                    seq.append((17, run - 3, 3))
                    run = 0
                else:
                    seq.extend((0, 0, 0) for _ in range(run))
                    run = 0
            i = j
        else:
            seq.append((lengths[i], 0, 0))
            i += 1
    cl_freq = Counter(s for s, _, _ in seq)
    cl_lengths = _limited_lengths(dict(cl_freq), 7)
    cl_code = _PrefixCode(cl_lengths)
    num = max(4, max(_CLC_ORDER.index(s) for s in cl_lengths) + 1)
    bw.write(num - 4, 4)
    for k in range(num):
        bw.write(cl_lengths.get(_CLC_ORDER[k], 0), 3)
    bw.write(0, 1)  # no max_symbol shortcut
    for s, extra, en in seq:
        c, ln = cl_code.codes[s]
        bw.write_code(c, ln)
        if en:
            bw.write(extra, en)
    return code


def _read_prefix_code(br: _BitReader, alphabet: int) -> _PrefixCode:
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        if br.read(1):
            first = br.read(8)
        else:
            first = br.read(1)
        if num_symbols == 2:
            second = br.read(8)
            return _PrefixCode({first: 1, second: 1})
        return _PrefixCode.single_symbol(first)
    num = 4 + br.read(4)
    cl_lengths: dict[int, int] = {}
    for k in range(num):
        ln = br.read(3)
        if ln:
            cl_lengths[_CLC_ORDER[k]] = ln
    cl_code = _PrefixCode(cl_lengths)
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths: dict[int, int] = {}
    symbol = 0
    prev_len = 8
    while symbol < alphabet and max_symbol > 0:
        max_symbol -= 1
        s = br.read_symbol(cl_code)
        if s < 16:
            if s:
                lengths[symbol] = s
                prev_len = s
            symbol += 1
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if symbol < alphabet:
                    lengths[symbol] = prev_len
                symbol += 1
        elif s == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    return _PrefixCode(lengths)


def encode_webp_lossless(img: np.ndarray) -> bytes:
    """uint8 image (H,W) / (H,W,3) / (H,W,4) → WebP lossless bytes
    (subtract-green transform, literal-only, single code group)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w = img.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions must be 1..16384")
    r = img[:, :, 0].astype(np.int16)
    g = img[:, :, 1].astype(np.int16)
    b = img[:, :, 2].astype(np.int16)
    a = img[:, :, 3] if img.shape[2] == 4 else np.full((h, w), 255, np.uint8)
    # subtract-green transform
    rt = ((r - g) & 0xFF).astype(np.uint8).ravel()
    bt = ((b - g) & 0xFF).astype(np.uint8).ravel()
    gt = g.astype(np.uint8).ravel()
    at = np.asarray(a, dtype=np.uint8).ravel()

    bw = _BitWriter()
    bw.write(0x2F, 8)  # VP8L signature
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if img.shape[2] == 4 else 0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(1, 1)
    bw.write(2, 2)  # transform: subtract green (no payload)
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    codes = [
        _write_prefix_code(bw, dict(Counter(gt.tolist())), _GREEN_ALPHABET),
        _write_prefix_code(bw, dict(Counter(rt.tolist())), 256),
        _write_prefix_code(bw, dict(Counter(bt.tolist())), 256),
        _write_prefix_code(bw, dict(Counter(at.tolist())), 256),
        _write_prefix_code(bw, {0: 1}, 40),  # distance code: unused
    ]
    for i in range(h * w):
        for code, val in (
            (codes[0], int(gt[i])),
            (codes[1], int(rt[i])),
            (codes[2], int(bt[i])),
            (codes[3], int(at[i])),
        ):
            c, ln = code.codes[val]
            if ln:
                bw.write_code(c, ln)
    payload = bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_webp_lossless(data: bytes) -> np.ndarray:
    """WebP lossless bytes → uint8 (H,W,3) (or (H,W,4) when alpha is
    non-trivial). Subset decoder — see module docstring."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        ln = struct.unpack_from("<I", data, pos + 4)[0]
        if tag == b"VP8L":
            payload = data[pos + 8 : pos + 8 + ln]
            break
        if tag in (b"VP8 ", b"VP8X"):
            raise NotImplementedError("lossy/extended WebP needs an injected decoder")
        pos += 8 + ln + (ln & 1)
    if payload is None:
        raise ValueError("no VP8L chunk in WebP file")
    br = _BitReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    subtract_green = False
    while br.read(1):
        ttype = br.read(2)
        if ttype == 2:
            subtract_green = True
        else:
            raise NotImplementedError(
                "predictor/color/color-indexing transforms need an injected decoder"
            )
    if br.read(1):
        raise NotImplementedError("VP8L color cache needs an injected decoder")
    if br.read(1):
        raise NotImplementedError("VP8L meta prefix codes need an injected decoder")
    green_code = _read_prefix_code(br, _GREEN_ALPHABET)
    red_code = _read_prefix_code(br, 256)
    blue_code = _read_prefix_code(br, 256)
    alpha_code = _read_prefix_code(br, 256)
    _read_prefix_code(br, 40)  # distance code (unused by this subset)
    n = h * w
    g = np.empty(n, np.uint8)
    r = np.empty(n, np.uint8)
    b = np.empty(n, np.uint8)
    a = np.empty(n, np.uint8)
    for i in range(n):
        s = br.read_symbol(green_code)
        if s >= 256:
            raise NotImplementedError(
                "VP8L LZ77 backward references need an injected decoder"
            )
        g[i] = s
        r[i] = br.read_symbol(red_code)
        b[i] = br.read_symbol(blue_code)
        a[i] = br.read_symbol(alpha_code)
    if subtract_green:
        r = ((r.astype(np.int16) + g) & 0xFF).astype(np.uint8)
        b = ((b.astype(np.int16) + g) & 0xFF).astype(np.uint8)
    rgb = np.stack([r, g, b], axis=-1).reshape(h, w, 3)
    if bool((a == 255).all()):
        return rgb
    return np.concatenate([rgb, a.reshape(h, w, 1)], axis=-1)
