"""Baseline JPEG codec, pure stdlib — the r8 close of the multimodal
compressed-format boundary (VERDICT r7 ask #6: "decide the JPEG
question explicitly"; decision: IN scope, same precedent as the r7
PNG codec — ITU-T T.81 baseline sequential DCT is public spec, and a
training-data pipeline meets JPEG far more often than PNG).

Scope: baseline sequential DCT (SOF0), 8-bit, Huffman entropy coding,
1-component grayscale and 3-component YCbCr at 4:4:4 or 4:2:0, restart
markers, JFIF APP0 tolerated and ignored. Progressive (SOF2),
arithmetic coding, 12-bit, and hierarchical modes raise
``NotImplementedError`` at the marked boundary — the integration point
where libjpeg-turbo/PIL plugs in on a real cluster image.

Exactness contract (what makes driver-gated oracles possible for a
LOSSY codec): an 8x8 block that is CONSTANT has energy only in its DC
coefficient — FDCT gives F(0,0) = 8·(v−128) and every AC exactly 0, so
with any DC quantizer that divides it the encode→decode roundtrip is
BIT-EXACT, no matter the quantization table's AC entries. The catalog
entry synthesizes closed-form constant-block images, which a plain SQL
oracle can replay without running a decoder (the
closed_form_pixel_bytes precedent in operators/multimodal.py).

Decoder structure per the spec: marker walk → DQT/DHT/SOF0/SOS parse →
entropy-coded segment with 0xFF00 byte-unstuffing and RSTn resets →
canonical Huffman decode (BITS/HUFFVAL) → DC prediction + AC run-length
→ dequant → separable 2-D IDCT → level shift/clamp → chroma upsample →
YCbCr→RGB. The encoder is the exact mirror and exists so tests and
testdata never depend on an image library being present.

Performance note: this decoder is the CORRECTNESS reference that runs
inside Arrow-batched ``mapInPandas`` on synthetic-scale payloads; at
100 TB the same operator swaps in a native decoder behind the
identical (payload) → (w, h, pixels) signature — the Spark-side plan
(pruned binary column, batch streaming, repartition-before-decode)
is the part this repo owns.
"""

from __future__ import annotations

import math
import struct

# Zig-zag scan order: index i of the scan → (row, col) flattened offset.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K standard Huffman tables (BITS counts for lengths 1..16, then
# HUFFVAL symbol lists) — the tables every baseline encoder ships.
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Near-lossless quantization table: DC=8 keeps constant blocks exact
# for any level (8·(v−128) is divisible by 8); AC=1 keeps arbitrary
# content within ±2 after FDCT/IDCT double rounding.
QTABLE_FINE = [8] + [1] * 63

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)] for x in range(8)
]
_CU = [1 / math.sqrt(2)] + [1.0] * 7


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the spec's canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, the decoder-side view."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


class _BitReader:
    """Entropy-segment reader: unstuffs 0xFF00 and stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via sync()
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker inside entropy segment")
        else:
            self.pos += 1
        # Truncate consumed high bits (r10): an unmasked accumulator
        # grows 8 bits per byte read, so every <<8 shifts an
        # ever-longer Python int — O(stream²) over a long scan. No
        # consumer looks back more than `n` (< 64) bits.
        self.acc = ((self.acc << 8) | b) & 0xFFFFFFFFFFFFFFFF
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        # batched read (r10): fill whole bytes, then one shift+mask —
        # the per-bit loop paid method-call overhead per BIT
        while self.n < k:
            self._fill()
        self.n -= k
        return (self.acc >> self.n) & ((1 << k) - 1)

    def sync_restart(self, expected: int | None = None) -> None:
        """Consume the RSTn marker and byte-align (called between
        restart intervals). Validates the marker is actually an RSTn
        and — when ``expected`` is given — that its modulo-8 sequence
        number is the right one (T.81 E.1.4: markers cycle RST0–RST7),
        so a desynced or truncated entropy stream raises instead of
        silently eating two data bytes."""
        self.acc = 0
        self.n = 0
        if self.pos + 1 >= len(self.data):
            raise ValueError(
                f"truncated entropy stream at RSTn boundary (offset {self.pos})"
            )
        if self.data[self.pos] != 0xFF or not 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            raise ValueError(
                f"expected RSTn at offset {self.pos}, found "
                f"{self.data[self.pos:self.pos + 2].hex()}"
            )
        if expected is not None and self.data[self.pos + 1] != 0xD0 + (expected % 8):
            raise ValueError(
                f"RSTn sequence error at offset {self.pos}: expected "
                f"RST{expected % 8}, found RST{self.data[self.pos + 1] - 0xD0}"
            )
        self.pos += 2  # 0xFF 0xDn


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _extend(v: int, size: int) -> int:
    """EXTEND from the spec: map a raw ``size``-bit magnitude to the
    signed coefficient."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """Inverse of _extend for the encoder: (size, raw bits)."""
    size = 0
    a = abs(v)
    while a:
        size += 1
        a >>= 1
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _fdct(block: list[int]) -> list[int]:
    """Separable 2-D forward DCT of a level-shifted 8x8 block, rounded
    to integer coefficients."""
    tmp = [0.0] * 64
    for y in range(8):
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += block[y * 8 + x] * _COS[x][u]
            tmp[y * 8 + u] = s
    out = [0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                s += tmp[y * 8 + u] * _COS[y][v]
            out[v * 8 + u] = round(s * _CU[u] * _CU[v] / 4.0)
    return out


def _idct_scalar(coefs: list[float]) -> list[int]:
    """Separable 2-D inverse DCT → level-shifted, clamped samples.
    Pure-Python reference; the decode hot path runs ``_idct_batch``
    (same math, numpy float64), pinned equivalent in tests/test_jpeg."""
    tmp = [0.0] * 64
    for v in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _CU[u] * coefs[v * 8 + u] * _COS[x][u]
            tmp[v * 8 + x] = s
    out = [0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += _CU[v] * tmp[v * 8 + x] * _COS[y][v]
            val = round(s / 4.0) + 128
            out[y * 8 + x] = 0 if val < 0 else 255 if val > 255 else val
    return out


_IDCT_A = None  # lazy: A[u, x] = CU[u] * cos((2x+1)uπ/16), float64


def _idct_mat():
    global _IDCT_A
    if _IDCT_A is None:
        import numpy as np

        _IDCT_A = np.array(
            [[_CU[u] * _COS[x][u] for x in range(8)] for u in range(8)], dtype=np.float64
        )
    return _IDCT_A


def _idct_batch(nat):
    """Vectorized IDCT over N blocks at once (r10, the VERDICT r9 #4
    stretch): ``nat`` is an (N, 64) float64 array of dequantized
    coefficients in NATURAL (row-major) order; returns (N, 64) int64
    level-shifted clamped samples. out = Aᵀ · coefs · A — identical
    float64 separable math as ``_idct_scalar`` (summation order may
    differ in the last ulp; integer outputs are pinned equal in
    tests/test_jpeg.py::test_idct_batch_matches_scalar). np.rint and
    Python round() are both half-even."""
    import numpy as np

    A = _idct_mat()
    m = nat.reshape(-1, 8, 8)  # m[n, v, u]
    out = np.einsum("vy,nvu,ux->nyx", A, m, A, optimize=True)
    vals = np.rint(out / 4.0).astype(np.int64) + 128
    return np.clip(vals, 0, 255).reshape(-1, 64)


def _idct(coefs: list[float]) -> list[int]:
    """Single-block IDCT through the batch kernel (one code path)."""
    import numpy as np

    return _idct_batch(np.array([coefs], dtype=np.float64))[0].tolist()


def _encode_block(
    wr: _BitWriter,
    coefs: list[int],
    qtab: list[int],
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    pred: int,
) -> int:
    def quant(v: int, q: int) -> int:
        # round-half-away-from-zero, truncating division (Python's //
        # floors, which would bias negative coefficients downward)
        if q == 1:
            return v
        return (v + q // 2) // q if v >= 0 else -((-v + q // 2) // q)

    q = [quant(coefs[ZIGZAG[i]], qtab[i]) for i in range(64)]
    diff = q[0] - pred
    size, raw = _magnitude(diff)
    code, ln = dc_codes[size]
    wr.write(code, ln)
    if size:
        wr.write(raw, size)
    run = 0
    for i in range(1, 64):
        if q[i] == 0:
            run += 1
            continue
        while run > 15:
            zrl, zln = ac_codes[0xF0]
            wr.write(zrl, zln)
            run -= 16
        size, raw = _magnitude(q[i])
        code, ln = ac_codes[(run << 4) | size]
        wr.write(code, ln)
        wr.write(raw, size)
        run = 0
    if run:
        eob, eln = ac_codes[0x00]
        wr.write(eob, eln)
    return q[0]


def _huff(rd: _BitReader, tab: dict[tuple[int, int], int]) -> int:
    """Decode one Huffman symbol from the bit stream (canonical
    (length, code) → symbol table) — shared by the baseline block
    decoder and the progressive scan decoders. The walk keeps the
    reader state in locals (r10): one attribute round-trip per SYMBOL
    instead of three per BIT."""
    code, ln = 0, 0
    acc, n = rd.acc, rd.n
    get = tab.get
    while ln < 17:
        if n == 0:
            rd.acc, rd.n = acc, n
            rd._fill()  # may raise _RestartMarker/EOFError with state synced
            acc, n = rd.acc, rd.n
        n -= 1
        code = (code << 1) | ((acc >> n) & 1)
        ln += 1
        sym = get((ln, code))
        if sym is not None:
            rd.acc, rd.n = acc, n
            return sym
    rd.acc, rd.n = acc, n
    raise ValueError("invalid Huffman code")


def _decode_block_zz(
    rd: _BitReader,
    dc_tab: dict[tuple[int, int], int],
    ac_tab: dict[tuple[int, int], int],
    pred: int,
) -> tuple[list[int], int]:
    """Entropy-decode one block to its zig-zag quantized coefficients
    (the inherently-sequential Huffman walk); dequantize + IDCT run
    batched over the whole scan afterwards (r10 vectorization)."""
    zz = [0] * 64
    size = _huff(rd, dc_tab)
    diff = _extend(rd.bits(size), size) if size else 0
    dc = pred + diff
    zz[0] = dc
    i = 1
    while i < 64:
        rs = _huff(rd, ac_tab)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:  # ZRL
                i += 16
                continue
            break  # EOB
        i += run
        if i > 63:
            raise ValueError("AC run past block end")
        zz[i] = _extend(rd.bits(size), size)
        i += 1
    return zz, dc


def _dequant_idct_blocks(zzs: list[list[int]], qtab: list[int]):
    """(N blocks of zig-zag coefficients, zig-zag-ordered qtab) →
    (N, 8, 8) int64 samples via one batched dequantize + IDCT."""
    import numpy as np

    zz = np.asarray(zzs, dtype=np.float64).reshape(-1, 64)
    nat = np.zeros_like(zz)
    nat[:, ZIGZAG] = zz * np.asarray(qtab, dtype=np.float64)
    return _idct_batch(nat).reshape(-1, 8, 8)


def _crop_upsample(plane, width: int, height: int, sx: int, sy: int) -> list[int]:
    """Crop the padded block plane to image size, nearest-neighbour
    upsampling subsampled chroma — numpy fancy indexing, no per-pixel
    Python."""
    import numpy as np

    if sx == 1 and sy == 1:
        out = plane[:height, :width]
    else:
        out = plane[np.arange(height) // sy][:, np.arange(width) // sx]
    return out.reshape(-1).tolist()


def _block_of(plane: list[int], w: int, h: int, bx: int, by: int) -> list[int]:
    """8x8 block at block coords (bx, by), edge-replicated past the
    image border, level-shifted by −128."""
    out = [0] * 64
    for y in range(8):
        sy = min(h - 1, by * 8 + y)
        base = sy * w
        for x in range(8):
            sx = min(w - 1, bx * 8 + x)
            out[y * 8 + x] = plane[base + sx] - 128
    return out


def synthesize_jpeg_gray(
    width: int, height: int, pixels: bytes, qtable: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Encode a grayscale image (row-major ``width*height`` bytes) as a
    baseline sequential JPEG (SOF0, one component, no subsampling)."""
    if len(pixels) != width * height:
        raise ValueError("pixel byte count does not match dimensions")
    qtab = qtable or QTABLE_FINE
    plane = list(pixels)
    dc_codes = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    wr = _BitWriter()
    segs: list[bytes] = []
    pred = 0
    n_mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                segs.append(wr.flush())
                wr = _BitWriter()
                pred = 0
            pred = _encode_block(
                wr, _fdct(_block_of(plane, width, height, bx, by)),
                qtab, dc_codes, ac_codes, pred,
            )
            n_mcu += 1
    segs.append(wr.flush())
    scan = bytearray(segs[0])
    for k, seg in enumerate(segs[1:]):
        scan += bytes((0xFF, 0xD0 + (k % 8)))
        scan += seg
    return b"".join(
        [
            b"\xff\xd8",  # SOI
            _seg(0xDB, bytes([0]) + bytes(qtab[i] for i in range(64))),  # DQT id 0
            _seg(
                0xC0,
                struct.pack(">BHHB", 8, height, width, 1) + bytes((1, 0x11, 0)),
            ),  # SOF0: 1 component, 1x1 sampling, qtable 0
            _seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)),
            _seg(0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS)),
        ]
        + ([_seg(0xDD, struct.pack(">H", restart_interval))] if restart_interval else [])
        + [
            _seg(0xDA, bytes((1, 1, 0x00, 0, 63, 0))),  # SOS
            bytes(scan),
            b"\xff\xd9",  # EOI
        ]
    )


def synthesize_jpeg_gray_progressive(
    width: int, height: int, pixels: bytes, qtable: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Encode a grayscale image as a PROGRESSIVE JPEG (SOF2): four
    scans exercising spectral selection, EOB-run coding, DC successive
    approximation, and per-scan restart intervals —

      1. DC first       (Ss=0 Se=0  Ah=0 Al=1)
      2. AC band 1–5    (Ss=1 Se=5  Ah=0 Al=0, EOB-run coded)
      3. AC band 6–63   (Ss=6 Se=63 Ah=0 Al=0)
      4. DC refinement  (Ss=0 Se=0  Ah=1 Al=0, one raw bit per block)

    The coefficients are identical to the baseline encoder's (same
    FDCT, same quantization), so ``decode_jpeg`` of the progressive
    stream equals ``decode_jpeg`` of ``synthesize_jpeg_gray`` of the
    same pixels bit-for-bit."""
    if len(pixels) != width * height:
        raise ValueError("pixel byte count does not match dimensions")
    qtab = qtable or QTABLE_FINE
    plane = list(pixels)
    dc_codes = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    # Progressive AC scans need EOBn symbols (RRRR<<4 with SSSS=0 for
    # run lengths 2^1..2^14), which the baseline Annex K table does not
    # define. Ship a flat canonical table instead: all 176 run/size
    # symbols — EOB0..EOB14 (0x00..0xE0), ZRL (0xF0), and every
    # (run, size 1..10) pair — at code length 8 (176 < 255, so the
    # reserved all-ones code never occurs). Suboptimal compression,
    # fully valid, and the decoder reads it from the DHT like any table.
    ac_prog_vals = [(r << 4) | s for r in range(16) for s in range(11)]
    ac_prog_bits = [0] * 16
    ac_prog_bits[7] = len(ac_prog_vals)
    ac_codes = _canonical_codes(ac_prog_bits, ac_prog_vals)
    bw = (width + 7) // 8
    bh = (height + 7) // 8

    def quant(v: int, q: int) -> int:
        if q == 1:
            return v
        return (v + q // 2) // q if v >= 0 else -((-v + q // 2) // q)

    blocks = []
    for by in range(bh):
        for bx in range(bw):
            coefs = _fdct(_block_of(plane, width, height, bx, by))
            blocks.append([quant(coefs[ZIGZAG[i]], qtab[i]) for i in range(64)])

    def join_rst(segs: list[bytes]) -> bytes:
        scan = bytearray(segs[0])
        for k, seg in enumerate(segs[1:]):
            scan += bytes((0xFF, 0xD0 + (k % 8)))
            scan += seg
        return bytes(scan)

    def dc_scan(ah: int, al: int) -> bytes:
        wr = _BitWriter()
        segs: list[bytes] = []
        pred = 0
        for n, zz in enumerate(blocks):
            if restart_interval and n and n % restart_interval == 0:
                segs.append(wr.flush())
                wr = _BitWriter()
                pred = 0
            if ah == 0:  # first scan: diffs of the point-transformed DC
                v = zz[0] >> al  # arithmetic shift (T.81 A.4)
                size, raw = _magnitude(v - pred)
                pred = v
                code, ln = dc_codes[size]
                wr.write(code, ln)
                if size:
                    wr.write(raw, size)
            else:  # refinement: the next lower bit, raw
                wr.write((zz[0] >> al) & 1, 1)
        segs.append(wr.flush())
        return join_rst(segs)

    def ac_first_scan(ss: int, se: int, al: int) -> bytes:
        wr = _BitWriter()
        segs: list[bytes] = []
        eob = 0

        def flush_eob() -> None:
            nonlocal eob
            if eob:
                r = eob.bit_length() - 1
                code, ln = ac_codes[r << 4]
                wr.write(code, ln)
                if r:
                    wr.write(eob - (1 << r), r)
                eob = 0

        for n, zz in enumerate(blocks):
            if restart_interval and n and n % restart_interval == 0:
                flush_eob()
                segs.append(wr.flush())
                wr = _BitWriter()
            # AC point transform rounds toward zero (G.1.1.1.2)
            band = [
                (zz[k] >> al) if zz[k] >= 0 else -((-zz[k]) >> al)
                for k in range(ss, se + 1)
            ]
            nz = [i for i, v in enumerate(band) if v]
            if not nz:
                eob += 1
                if eob == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for i in range(nz[-1] + 1):
                v = band[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    wr.write(code, ln)
                    run -= 16
                size, raw = _magnitude(v)
                code, ln = ac_codes[(run << 4) | size]
                wr.write(code, ln)
                wr.write(raw, size)
                run = 0
            if nz[-1] < len(band) - 1:
                eob += 1  # trailing zeros: merge into a forward EOB run
        flush_eob()
        segs.append(wr.flush())
        return join_rst(segs)

    def sos(ss: int, se: int, ah: int, al: int) -> bytes:
        return _seg(0xDA, bytes((1, 1, 0x00, ss, se, (ah << 4) | al)))

    return b"".join(
        [
            b"\xff\xd8",
            _seg(0xDB, bytes([0]) + bytes(qtab[i] for i in range(64))),
            _seg(
                0xC2,
                struct.pack(">BHHB", 8, height, width, 1) + bytes((1, 0x11, 0)),
            ),  # SOF2: 1 component, 1x1 sampling, qtable 0
            _seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)),
            _seg(0xC4, bytes([0x10]) + bytes(ac_prog_bits) + bytes(ac_prog_vals)),
        ]
        + ([_seg(0xDD, struct.pack(">H", restart_interval))] if restart_interval else [])
        + [
            sos(0, 0, 0, 1), dc_scan(0, 1),
            sos(1, 5, 0, 0), ac_first_scan(1, 5, 0),
            sos(6, 63, 0, 0), ac_first_scan(6, 63, 0),
            sos(0, 0, 1, 0), dc_scan(1, 0),
            b"\xff\xd9",
        ]
    )


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes((0xFF, marker)) + struct.pack(">H", len(payload) + 2) + payload


def _rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[int, int, int]:
    y = round(0.299 * r + 0.587 * g + 0.114 * b)
    cb = round(128 - 0.168735892 * r - 0.331264108 * g + 0.5 * b)
    cr = round(128 + 0.5 * r - 0.418687589 * g - 0.081312411 * b)
    clamp = lambda v: 0 if v < 0 else 255 if v > 255 else v  # noqa: E731
    return clamp(y), clamp(cb), clamp(cr)


def _ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    r = round(y + 1.402 * (cr - 128))
    g = round(y - 0.344136286 * (cb - 128) - 0.714136286 * (cr - 128))
    b = round(y + 1.772 * (cb - 128))
    clamp = lambda v: 0 if v < 0 else 255 if v > 255 else v  # noqa: E731
    return clamp(r), clamp(g), clamp(b)


def synthesize_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    subsampling: str = "4:2:0",
    qtable: list[int] | None = None,
) -> bytes:
    """Encode an RGB image (top-down rows, 3 bytes/px) as a baseline
    YCbCr JPEG at 4:4:4 or 4:2:0 subsampling."""
    if len(rgb) != width * height * 3:
        raise ValueError("pixel byte count does not match dimensions")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling}")
    qtab = qtable or QTABLE_FINE
    n = width * height
    yp = [0] * n
    cbp = [0] * n
    crp = [0] * n
    for i in range(n):
        y, cb, cr = _rgb_to_ycbcr(rgb[i * 3], rgb[i * 3 + 1], rgb[i * 3 + 2])
        yp[i], cbp[i], crp[i] = y, cb, cr
    sub = subsampling == "4:2:0"
    if sub:
        cw, ch = (width + 1) // 2, (height + 1) // 2
        cbs = [0] * (cw * ch)
        crs = [0] * (cw * ch)
        for cy in range(ch):
            for cx in range(cw):
                acc_b = acc_r = cnt = 0
                for dy in range(2):
                    for dx in range(2):
                        sx, sy = cx * 2 + dx, cy * 2 + dy
                        if sx < width and sy < height:
                            acc_b += cbp[sy * width + sx]
                            acc_r += crp[sy * width + sx]
                            cnt += 1
                cbs[cy * cw + cx] = (acc_b + cnt // 2) // cnt
                crs[cy * cw + cx] = (acc_r + cnt // 2) // cnt
    else:
        cw, ch = width, height
        cbs, crs = cbp, crp

    dc_l = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_l = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_c = _canonical_codes(_DC_CHR_BITS, _DC_CHR_VALS)
    ac_c = _canonical_codes(_AC_CHR_BITS, _AC_CHR_VALS)
    wr = _BitWriter()
    hmax = 2 if sub else 1
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * hmax - 1) // (8 * hmax)
    preds = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for dy in range(hmax):
                for dx in range(hmax):
                    preds[0] = _encode_block(
                        wr,
                        _fdct(_block_of(yp, width, height, mx * hmax + dx, my * hmax + dy)),
                        qtab, dc_l, ac_l, preds[0],
                    )
            preds[1] = _encode_block(
                wr, _fdct(_block_of(cbs, cw, ch, mx, my)), qtab, dc_c, ac_c, preds[1]
            )
            preds[2] = _encode_block(
                wr, _fdct(_block_of(crs, cw, ch, mx, my)), qtab, dc_c, ac_c, preds[2]
            )
    samp = 0x22 if sub else 0x11
    sof = struct.pack(">BHHB", 8, height, width, 3) + bytes(
        (1, samp, 0, 2, 0x11, 0, 3, 0x11, 0)
    )
    return b"".join(
        [
            b"\xff\xd8",
            _seg(0xDB, bytes([0]) + bytes(qtab[i] for i in range(64))),
            _seg(0xC0, sof),
            _seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)),
            _seg(0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS)),
            _seg(0xC4, bytes([0x01]) + bytes(_DC_CHR_BITS) + bytes(_DC_CHR_VALS)),
            _seg(0xC4, bytes([0x11]) + bytes(_AC_CHR_BITS) + bytes(_AC_CHR_VALS)),
            _seg(0xDA, bytes((3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))),
            wr.flush(),
            b"\xff\xd9",
        ]
    )


def decode_jpeg(payload: bytes):
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG →
    (width, height, component planes).

    Grayscale returns ``[y_plane]``; color returns ``[y, cb, cr]``
    planes each already upsampled to full resolution. Progressive
    streams accumulate coefficients across scans (spectral selection,
    successive approximation, EOB runs — see the G.2 block below) and
    reconstruct once at EOI. Raises ``NotImplementedError`` for the
    remaining modes (arithmetic coding, hierarchical, 12-bit) — the
    marked library-integration boundary."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    dc_tabs: dict[int, dict[tuple[int, int], int]] = {}
    ac_tabs: dict[int, dict[tuple[int, int], int]] = {}
    width = height = None
    comps: list[dict] = []
    restart = 0
    progressive = False
    prog_ready = False  # coefficient arrays allocated (first SOS seen)
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        # T.81 B.1.1.2: any marker may be preceded by optional 0xFF
        # fill bytes — real encoders pad with them (ADVICE r8).
        while payload[pos + 1] == 0xFF and pos + 4 < len(payload):
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack_from(">H", payload, pos + 2)[0]
        data = payload[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02X} unsupported: baseline (SOF0) and "
                "progressive (SOF2) only — arithmetic/hierarchical need libjpeg"
            )
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                qtabs[tq] = list(data[p + 1 : p + 65])
                p += 65
        elif marker in (0xC0, 0xC2):  # SOF0 / SOF2 (same segment layout)
            progressive = marker == 0xC2
            prec, height, width, nc = struct.unpack_from(">BHHB", data, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            for c in range(nc):
                cid, samp, tq = data[6 + c * 3 : 9 + c * 3]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(data):
                tc, th = data[p] >> 4, data[p] & 0xF
                bits = list(data[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(data[p + 17 : p + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", data, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = data[0]
            scan_sel = []
            for s in range(ns):
                cs, tabs = data[1 + s * 2], data[2 + s * 2]
                scan_sel.append((cs, tabs >> 4, tabs & 0xF))
            if not progressive:
                return _decode_scan(
                    payload, pos, width, height, comps, scan_sel,
                    qtabs, dc_tabs, ac_tabs, restart,
                )
            if not prog_ready:
                _prog_alloc(width, height, comps)
                prog_ready = True
            ss, se = data[1 + ns * 2], data[2 + ns * 2]
            ahal = data[3 + ns * 2]
            pos = _decode_progressive_scan(
                payload, pos, comps, scan_sel, dc_tabs, ac_tabs,
                restart, ss, se, ahal >> 4, ahal & 0xF,
            )
        # APPn/COM/others: skipped
    if progressive and prog_ready:
        return _prog_reconstruct(width, height, comps, qtabs)
    raise ValueError("no SOS marker found")


def _decode_scan(
    payload, pos, width, height, comps, scan_sel, qtabs, dc_tabs, ac_tabs, restart
):
    import numpy as np

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["_zzs"] = []  # entropy-decoded blocks, MCU order
        c["_bx"] = []
        c["_by"] = []
        sel = next(s for s in scan_sel if s[0] == c["id"])
        c["dc"] = dc_tabs[sel[1]]
        c["ac"] = ac_tabs[sel[2]]
        c["q"] = qtabs[c["tq"]]
    rd = _BitReader(payload, pos)
    preds = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                rd.sync_restart(expected=n_mcu // restart - 1)
                preds = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    for dy in range(c["v"]):
                        for dx in range(c["h"]):
                            zz, preds[ci] = _decode_block_zz(
                                rd, c["dc"], c["ac"], preds[ci]
                            )
                            c["_zzs"].append(zz)
                            c["_bx"].append(mx * c["h"] + dx)
                            c["_by"].append(my * c["v"] + dy)
            except _RestartMarker as exc:
                # A restart marker INSIDE an MCU means the entropy
                # stream desynced (or the encoder put RSTn off the
                # interval boundary): the MCU's already-written blocks
                # would be kept and the rest silently left zero, so
                # fail instead of resyncing to wrong pixels (ADVICE
                # r8). Well-formed streams never hit this — the
                # boundary handler above consumes every on-schedule
                # RSTn before the MCU starts.
                raise ValueError(
                    f"restart marker RST{exc.marker - 0xD0} inside MCU "
                    f"{n_mcu} — corrupt or desynced entropy stream"
                ) from exc
            n_mcu += 1
    planes = []
    for c in comps:
        blocks = _dequant_idct_blocks(c["_zzs"], c["q"])
        plane = np.zeros((c["bh"] * 8, c["bw"] * 8), dtype=np.int64)
        bys = np.asarray(c["_by"])
        bxs = np.asarray(c["_bx"])
        rows = bys[:, None, None] * 8 + np.arange(8)[None, :, None]
        cols = bxs[:, None, None] * 8 + np.arange(8)[None, None, :]
        plane[rows, cols] = blocks
        for k in ("_zzs", "_bx", "_by"):
            c.pop(k)
        planes.append(
            _crop_upsample(plane, width, height, hmax // c["h"], vmax // c["v"])
        )
    return width, height, planes


# --- Progressive (SOF2) decoding — T.81 G.2 / G.1.2 -----------------------
#
# A progressive stream carries the SAME quantized DCT coefficients as a
# baseline stream, split across several scans: each scan covers a
# zig-zag band [Ss, Se] (spectral selection) at a bit precision window
# [Ah, Al] (successive approximation). Decoding therefore accumulates
# per-block coefficient arrays across scans and runs dequantize + IDCT
# once at the end — the reconstruction math is shared with baseline.
# DC scans (Ss = 0) may interleave components in MCU order; AC scans
# cover exactly one component in its own block-raster order (G.1.2.2).
# First scans (Ah = 0) Huffman-code magnitudes shifted left by Al; AC
# first scans add EOB-run codes (RRRR with SSSS = 0: 2^R + ext bits
# all-zero-band blocks). Refinement scans (Ah > 0) append one bit of
# precision per coefficient: a raw bit for DC, and for AC the
# correction-bit discipline of G.1.2.3 (every already-nonzero
# coefficient crossed by the scan consumes one bit; newly-nonzero
# coefficients arrive as ±2^Al).


def _prog_alloc(width: int, height: int, comps: list[dict]) -> None:
    """Allocate per-component coefficient storage (zig-zag order, one
    64-slot row per block, padded to whole-MCU dimensions so interleaved
    and single-component scans index the same arrays)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = [0] * (c["bw"] * c["bh"] * 64)
        # single-component scan block grid: ceil(component samples / 8)
        c["nbw"] = (width * c["h"] + 8 * hmax - 1) // (8 * hmax)
        c["nbh"] = (height * c["v"] + 8 * vmax - 1) // (8 * vmax)
    comps[0]["_mcux"] = mcux
    comps[0]["_mcuy"] = mcuy


def _next_marker_pos(payload: bytes, p: int) -> int:
    """Position of the next real marker at/after ``p``: skips entropy
    bytes, 0xFF00 stuffing, and 0xFF fill padding."""
    n = len(payload)
    while p + 1 < n:
        if payload[p] != 0xFF:
            p += 1
        elif payload[p + 1] == 0x00:
            p += 2
        elif payload[p + 1] == 0xFF:
            p += 1
        else:
            return p
    raise ValueError("unterminated entropy-coded segment")


def _refine_nonzero(rd: _BitReader, coef: list[int], at: int, p1: int) -> None:
    """AC refinement correction bit for an already-nonzero coefficient
    (G.1.2.3): if the appended bit is 1 and the 2^Al position is still
    empty, grow the magnitude away from zero."""
    if rd.bit() and (coef[at] & p1) == 0:
        coef[at] += p1 if coef[at] > 0 else -p1


def _decode_progressive_scan(
    payload, pos, comps, scan_sel, dc_tabs, ac_tabs, restart, ss, se, ah, al
):
    """Decode one progressive scan into the components' coefficient
    arrays; returns the payload offset of the next marker."""
    rd = _BitReader(payload, pos)
    in_scan = [next(c for c in comps if c["id"] == cs) for cs, _, _ in scan_sel]
    for (cs, td, ta), c in zip(scan_sel, in_scan):
        if ss == 0:
            c["_dc"] = dc_tabs[td]
        else:
            c["_ac"] = ac_tabs[ta]
    if ss > 0 and len(in_scan) != 1:
        raise ValueError("progressive AC scan must cover exactly one component")
    mcux, mcuy = comps[0]["_mcux"], comps[0]["_mcuy"]
    interleaved = len(in_scan) > 1

    # Per-MCU work list: (comp, block offset) in scan order. For a
    # single-component scan the MCU is ONE block in the component's own
    # raster (G.1.2.2), with row stride bw (the padded interleaved width).
    if interleaved:
        n_units = mcux * mcuy

        def unit_blocks(u: int):
            mx, my = u % mcux, u // mcux
            for c in in_scan:
                for dy in range(c["v"]):
                    for dx in range(c["h"]):
                        yield c, ((my * c["v"] + dy) * c["bw"] + mx * c["h"] + dx) * 64
    else:
        c0 = in_scan[0]
        n_units = c0["nbw"] * c0["nbh"]

        def unit_blocks(u: int):
            yield c0, ((u // c0["nbw"]) * c0["bw"] + u % c0["nbw"]) * 64

    preds = {id(c): 0 for c in in_scan}
    eobrun = 0
    p1 = 1 << al
    for u in range(n_units):
        if restart and u and u % restart == 0:
            rd.sync_restart(expected=u // restart - 1)
            preds = {id(c): 0 for c in in_scan}
            eobrun = 0
        for c, off in unit_blocks(u):
            coef = c["coef"]
            if ss == 0 and ah == 0:  # DC first
                size = _huff(rd, c["_dc"])
                diff = _extend(rd.bits(size), size) if size else 0
                preds[id(c)] += diff
                coef[off] = preds[id(c)] << al
            elif ss == 0:  # DC refinement: one raw bit per block
                if rd.bit():
                    coef[off] |= p1
            elif ah == 0:  # AC first (EOB-run coded band)
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _huff(rd, c["_ac"])
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += rd.bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC run past spectral band end")
                    coef[off + k] = _extend(rd.bits(s), s) << al
                    k += 1
            else:  # AC refinement (G.1.2.3 correction bits)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _huff(rd, c["_ac"])
                        r, s = rs >> 4, rs & 0xF
                        val = 0
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += rd.bits(r)
                                break
                            # ZRL: r = 15 zero-history coefficients skipped
                        else:
                            if s != 1:
                                raise ValueError("AC refinement size must be 1")
                            val = p1 if rd.bit() else -p1
                        while k <= se:
                            at = off + k
                            if coef[at] != 0:
                                _refine_nonzero(rd, coef, at, p1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val:
                            if k > se:
                                raise ValueError("AC refinement run past band end")
                            coef[off + k] = val
                        k += 1
                if eobrun:
                    while k <= se:  # EOB region: correction bits only
                        at = off + k
                        if coef[at] != 0:
                            _refine_nonzero(rd, coef, at, p1)
                        k += 1
                    eobrun -= 1
    return _next_marker_pos(payload, rd.pos)


def _prog_reconstruct(width, height, comps, qtabs):
    """Dequantize + IDCT the accumulated coefficient arrays — the same
    batched math and crop/upsample tail as the baseline path. The
    per-component ``coef`` array is already in block-raster order, so
    the scatter is a pure reshape/transpose."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        blocks = _dequant_idct_blocks(
            [c["coef"][i : i + 64] for i in range(0, len(c["coef"]), 64)],
            qtabs[c["tq"]],
        )
        plane = (
            blocks.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        planes.append(
            _crop_upsample(plane, width, height, hmax // c["h"], vmax // c["v"])
        )
    return width, height, planes


def decode_jpeg_pixels(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """JPEG counterpart of decode_bmp_pixels/decode_png_pixels:
    (width, height, top-down rows of (r, g, b)). Grayscale replicates
    the luma into all three channels."""
    w, h, planes = decode_jpeg(payload)
    if len(planes) == 1:
        yp = planes[0]
        rows = [[(yp[y * w + x],) * 3 for x in range(w)] for y in range(h)]
        return w, h, rows
    # Vectorized YCbCr→RGB: elementwise float64 expressions in the
    # SAME operation order as the scalar _ycbcr_to_rgb, so every sum
    # is bit-identical and np.rint (half-even, like round()) lands on
    # the same integer.
    import numpy as np

    y = np.asarray(planes[0], dtype=np.float64)
    cb = np.asarray(planes[1], dtype=np.float64)
    cr = np.asarray(planes[2], dtype=np.float64)
    r = np.clip(np.rint(y + 1.402 * (cr - 128)), 0, 255).astype(np.int64)
    g = np.clip(
        np.rint(y - 0.344136286 * (cb - 128) - 0.714136286 * (cr - 128)), 0, 255
    ).astype(np.int64)
    b = np.clip(np.rint(y + 1.772 * (cb - 128)), 0, 255).astype(np.int64)
    rgb = np.stack([r, g, b], axis=-1).reshape(h, w, 3).tolist()
    rows = [[tuple(px) for px in row] for row in rgb]
    return w, h, rows
