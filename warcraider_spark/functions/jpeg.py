"""Dependency-free baseline JPEG (JFIF, grayscale) encoder + decoder.

Retires the last stubbed codec branch (VERDICT r2 "missing" #4 / "next
round" #5): like the PNG codec (multimodal.py, q151), everything here is
the real format — marker segments, the Annex K.1 luminance quantization
table, Annex K.3 canonical Huffman tables, zigzag scan, byte-stuffed
entropy-coded data, forward/inverse DCT — implemented from the public
JPEG specification (ITU-T T.81). Baseline sequential only: one 8-bit
grayscale component, no progressive scans, no restart markers.

Determinism story (what makes a lossy codec hash-verifiable):

- The synthetic images are CONSTANT PER 8x8 BLOCK. A constant block has
  only a DC coefficient (the AC sums cancel), so the whole lossy pipeline
  collapses to integer arithmetic DuckDB can replay exactly:
  ``d = v - 128;  S = round_half_away(8d / 16) = sign(d) * (|d|+1) // 2;
  decoded = clamp(2S + 128)`` (DC quant step 16 from K.1; the IDCT of a
  DC-only block is the constant ``16S/8 = 2S`` — an exact integer, so no
  float-rounding boundary exists anywhere on this path).
- The float fDCT lands within ~1e-11 of the exact coefficient with a
  noise sign that depends on accumulation order, so the quantizer's
  half-away rounding carries a 1e-8 guard (see ``_round_half_away``):
  for integer-derived content, DC/16 is always an exact multiple of 0.5,
  so the guard deterministically resolves every half-boundary the
  half-away way — quantized DC matches the integer formula for every
  d in [-128, 127] (exhaustively asserted in tests).
- General content (exercised by the property test, not the oracle) uses
  the full AC path: run-length coding, ZRL, EOB, magnitude categories.

The encoder/decoder pair is general baseline JPEG — the block-constant
rule is a property of the test IMAGES, not of the codec.
"""

from __future__ import annotations

import struct as _struct

__all__ = [
    "encode_jpeg_gray",
    "decode_jpeg_gray",
    "jpeg_dims",
    "jpeg_block_value",
    "encode_jpeg_pixels",
    "decode_jpeg_pixels",
]

# Annex K.1 luminance quantization table (row-major)
QTABLE = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# zigzag position -> row-major index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3.1: luminance DC — BITS (codes per length 1..16) and values
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# Annex K.3.2: luminance AC
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: value -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: (length, code) -> value."""
    return {(ln, c): v for v, (c, ln) in _build_codes(bits, vals).items()}


_DC_ENC = _build_codes(DC_BITS, DC_VALS)
_AC_ENC = _build_codes(AC_BITS, AC_VALS)
_DC_DEC = _build_decode(DC_BITS, DC_VALS)
_AC_DEC = _build_decode(AC_BITS, AC_VALS)


def _dct_matrix():
    import numpy as np

    d = np.zeros((8, 8))
    for u in range(8):
        c = (0.5 ** 0.5) if u == 0 else 1.0
        for x in range(8):
            d[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)
    return d


_DCT = None


def _dct():
    global _DCT
    if _DCT is None:
        _DCT = _dct_matrix()
    return _DCT


def _round_half_away(x: float) -> int:
    """Round half away from zero with a 1e-8 guard: the float fDCT lands
    within ~1e-11 of the true coefficient and the error SIGN varies with
    accumulation order, so an unguarded floor can fall either side of an
    exact .5 boundary run-to-run/platform-to-platform. The guard absorbs
    that noise; it can only matter within 1e-8 of a boundary, far below
    half a quantization step."""
    import math

    return (
        int(math.floor(x + 0.5 + 1e-8))
        if x >= 0
        else -int(math.floor(-x + 0.5 + 1e-8))
    )


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing inside entropy-coded data
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("entropy data exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1  # stuffed 0xFF
            else:
                raise ValueError("unexpected marker inside entropy data")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid Huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category, appended bits) per F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _extend(bits: int, s: int) -> int:
    """Appended bits -> signed value (F.2.2.1 EXTEND)."""
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def encode_jpeg_pixels(pixels, qtable: list[int] = QTABLE) -> bytes:
    """General baseline encoder: ``pixels`` is an (h, w) array-like of
    0..255 grays with 8-divisible dims. Real fDCT (numpy, separable),
    quantization, zigzag, Huffman, byte stuffing."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.float64)
    h, w = px.shape
    if h % 8 or w % 8:
        raise ValueError("dims must be multiples of 8")
    d = _dct()
    q = np.asarray(qtable, dtype=np.float64).reshape(8, 8)

    wr = _BitWriter()
    prev_dc = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            block = px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = d @ block @ d.T
            zz = []
            for i in range(64):
                r, c = divmod(ZIGZAG[i], 8)
                zz.append(_round_half_away(coef[r, c] / q[r, c]))
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            s, bits = _magnitude(diff)
            code, ln = _DC_ENC[s]
            wr.write(code, ln)
            if s:
                wr.write(bits, s)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, 64):
                if i > last_nz:
                    code, ln = _AC_ENC[0x00]  # EOB
                    wr.write(code, ln)
                    break
                v = zz[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = _AC_ENC[0xF0]  # ZRL
                    wr.write(code, ln)
                    run -= 16
                s, bits = _magnitude(v)
                code, ln = _AC_ENC[(run << 4) | s]
                wr.write(code, ln)
                wr.write(bits, s)
                run = 0
    scan = wr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return _struct.pack(">HH", marker, len(payload) + 2) + payload

    zz_q = bytes(int(qtable[ZIGZAG[i]]) for i in range(64))
    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + zz_q)
    out += seg(0xFFC0, _struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    out += scan
    out += b"\xff\xd9"  # EOI
    return out


def decode_jpeg_pixels(payload: bytes):
    """General baseline decoder: marker walk, DQT/DHT/SOF0/SOS parse,
    Huffman + EXTEND, dequantize, inverse zigzag, float IDCT, level
    shift, clamp. Returns an (h, w) numpy uint8-valued int array.

    Rounding: ``floor(x + 0.5 + 1e-7)`` — the 1e-7 guard absorbs the
    ~1e-13 float-IDCT noise at exact .5 boundaries so results are
    deterministic across platforms (documented; the guard is far below
    half a quantization step, so it can never flip a non-boundary value).
    """
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    dc_dec = ac_dec = None
    w = h = None
    comp_tq = 0
    scan_start = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = _struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT
            if body[0] >> 4 != 0:
                raise ValueError("16-bit quant tables not baseline")
            tq = body[0] & 0x0F
            zz = list(body[1:65])
            tbl = [0] * 64
            for i in range(64):
                tbl[ZIGZAG[i]] = zz[i]
            qtables[tq] = tbl
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, ncomp = _struct.unpack_from(">BHHB", body, 0)
            if precision != 8 or ncomp != 1:
                raise ValueError("only 8-bit single-component baseline supported")
            if body[7] != 0x11:
                raise ValueError("subsampling not supported for grayscale")
            comp_tq = body[8]
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("not baseline sequential")
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(body[off + 17 : off + 17 + nvals])
                tbl = _build_decode(bits, vals)
                if tc == 0:
                    dc_dec = tbl
                else:
                    ac_dec = tbl
                off += 17 + nvals
                del th
        elif marker == 0xDA:  # SOS
            scan_start = pos + 2 + length
            break
        pos += 2 + length
    if None in (w, h, scan_start) or dc_dec is None or ac_dec is None:
        raise ValueError("incomplete JPEG stream")
    q = np.asarray(qtables[comp_tq], dtype=np.float64).reshape(8, 8)

    scan_end = payload.rfind(b"\xff\xd9")
    rd = _BitReader(payload[scan_start:scan_end])
    d = _dct()
    out = np.zeros((h, w), dtype=np.int64)
    prev_dc = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            zz = [0] * 64
            s = rd.huff(dc_dec)
            diff = _extend(rd.bits(s), s) if s else 0
            prev_dc += diff
            zz[0] = prev_dc
            i = 1
            while i < 64:
                rs = rd.huff(ac_dec)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    i += 16
                    continue
                i += rs >> 4
                s = rs & 0x0F
                if i > 63:
                    raise ValueError("AC index overflow")
                zz[i] = _extend(rd.bits(s), s)
                i += 1
            coef = np.zeros((8, 8))
            for k in range(64):
                r, c = divmod(ZIGZAG[k], 8)
                coef[r, c] = zz[k] * q[r, c]
            block = d.T @ coef @ d
            px = np.floor(block + 128.0 + 0.5 + 1e-7).astype(np.int64)
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(px, 0, 255)
    return out


# ---------------------------------------------------------------------------
# Analytic test-image rule (block-constant; see module docstring)
# ---------------------------------------------------------------------------


def jpeg_dims(doc_id: int) -> tuple[int, int]:
    """(width, height), multiples of 8: 16..56 x 16..40."""
    return (doc_id % 6 + 2) * 8, (doc_id % 4 + 2) * 8


def jpeg_block_value(doc_id: int, bx: int, by: int) -> int:
    return (doc_id + 5 * bx + 11 * by) % 256


def encode_jpeg_gray(doc_id: int) -> bytes:
    """Block-constant analytic image -> real JPEG bytes."""
    import numpy as np

    w, h = jpeg_dims(doc_id)
    px = np.zeros((h, w), dtype=np.float64)
    for by in range(h // 8):
        for bx in range(w // 8):
            px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = jpeg_block_value(
                doc_id, bx, by
            )
    return encode_jpeg_pixels(px)


def decode_jpeg_gray(payload: bytes) -> dict:
    """Decode + content stats for the oracle comparison."""
    px = decode_jpeg_pixels(payload)
    h, w = px.shape
    total = int(px.sum())
    return {
        "width": w,
        "height": h,
        "n_blocks": (w // 8) * (h // 8),
        "pixel_sum": total,
        "mean_milli": total * 1000 // (w * h),
    }
