"""GIF87a/89a codec, pure stdlib — third compressed image container
after PNG (r7) and baseline JPEG (r8). GIF is LOSSLESS (palette
indices through LZW), so unlike JPEG no exactness trick is needed:
every synthesized pixel replays bit-for-bit, the PNG situation with a
different (and older) compression stack.

Scope: logical screen + global color table, image descriptor,
variable-width LSB-first GIF-LZW (clear/EOI codes, 4096-entry
dictionary with reset, the KwKwK case), optional interlacing
(4-pass row order), graphic-control/comment/application extensions
skipped. Animation (multiple image descriptors) decodes as its frame
list; local color tables and transparency raise at the marked
boundary — the libimage integration point, same convention as
operators/jpeg.py.

The encoder exists so tests and testdata never need an image library;
it emits a global palette built from the distinct colors (≤256
required) and resets the LZW dictionary on overflow exactly as the
spec prescribes.
"""

from __future__ import annotations

import struct

_GIF_SIGS = (b"GIF87a", b"GIF89a")

# Interlace pass structure: (first row, step) per GIF89a appendix E.
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


class _LSBBitWriter:
    """LSB-first bit packer (GIF's orientation — PNG/JPEG are MSB)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.buf)


class _LSBBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, width: int) -> int:
        while self.n < width:
            if self.pos >= len(self.data):
                raise EOFError("LZW stream exhausted")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.n -= width
        return v


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable width starting min+1, clear code
    emitted first and on dictionary overflow (4096), EOI last."""
    clear = 1 << min_code_size
    eoi = clear + 1
    wr = _LSBBitWriter()

    def reset() -> tuple[dict[bytes, int], int, int]:
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    wr.write(clear, width)
    w = b""
    for ch in indices:
        wk = w + bytes([ch])
        if wk in table:
            w = wk
            continue
        wr.write(table[w], width)
        table[wk] = next_code
        next_code += 1
        # width pairing (the unique consistent pair over an exhaustive
        # rule matrix; decoder side additionally validated against a
        # foreign-encoded fixture): encoder widens when the NEXT free
        # code no longer fits; the decoder mirrors one entry EARLY
        # (len == 2^w − 1) because it learns each entry one code later.
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            wr.write(clear, width)
            table, next_code, width = reset()
        w = bytes([ch])
    if w:
        wr.write(table[w], width)
    wr.write(eoi, width)
    return wr.flush()


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    rd = _LSBBitReader(data)

    def reset() -> tuple[list[bytes], int]:
        return [bytes([i]) for i in range(clear)] + [b"", b""], min_code_size + 1

    table, width = reset()
    out = bytearray()
    prev: bytes | None = None
    while True:
        try:
            code = rd.read(width)
        except EOFError:
            break  # many real GIFs omit the EOI code; EOF ends the stream
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"invalid LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
        prev = entry
    return bytes(out)


def _deinterlace(rows: list[bytes], height: int) -> list[bytes]:
    out: list[bytes | None] = [None] * height
    it = iter(rows)
    for first, step in _INTERLACE_PASSES:
        for y in range(first, height, step):
            out[y] = next(it)
    return list(out)  # type: ignore[arg-type]


def _interlace_order(height: int) -> list[int]:
    return [y for first, step in _INTERLACE_PASSES for y in range(first, height, step)]


def synthesize_gif(
    width: int,
    height: int,
    rgb_rows: list[list[tuple[int, int, int]]],
    interlace: bool = False,
) -> bytes:
    """Encode top-down (r, g, b) rows as a GIF89a with a global color
    table (distinct colors must fit 256 — the format's contract)."""
    palette: dict[tuple[int, int, int], int] = {}
    for row in rgb_rows:
        for px in row:
            if px not in palette:
                palette[px] = len(palette)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} colors exceed GIF's 256-entry palette")
    bits = max(1, (len(palette) - 1).bit_length())
    size = 1 << bits
    table = bytearray()
    inv = {i: c for c, i in palette.items()}
    for i in range(size):
        r, g, b = inv.get(i, (0, 0, 0))
        table += bytes((r, g, b))
    order = _interlace_order(height) if interlace else range(height)
    indices = bytes(palette[px] for y in order for px in rgb_rows[y])
    mcs = max(2, bits)
    lzw = lzw_encode(indices, mcs)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    screen = struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    img = struct.pack(
        "<BHHHHB", 0x2C, 0, 0, width, height, 0x40 if interlace else 0
    )
    return (
        b"GIF89a" + screen + bytes(table) + img + bytes([mcs]) + bytes(blocks) + b"\x3b"
    )


def decode_gif_pixels(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode the FIRST image of a GIF to top-down (r, g, b) rows
    (global color table, optional interlace; extensions skipped).
    Local color tables / transparency raise at the marked boundary."""
    if payload[:6] not in _GIF_SIGS:
        raise NotImplementedError("not a GIF payload")
    width, height, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct: list[tuple[int, int, int]] = []
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        for i in range(n):
            r, g, b = payload[pos + i * 3 : pos + i * 3 + 3]
            gct.append((r, g, b))
        pos += n * 3
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            _, ix, iy, iw, ih, iflags = struct.unpack_from("<BHHHHB", payload, pos)
            pos += 10
            if iflags & 0x80:
                raise NotImplementedError("local color tables unsupported")
            if (ix, iy, iw, ih) != (0, 0, width, height):
                raise NotImplementedError("sub-rectangle frames unsupported")
            if not gct:
                raise NotImplementedError("GIF without a global color table")
            mcs = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = lzw_decode(bytes(lzw), mcs)
            if len(idx) < iw * ih:
                raise ValueError("LZW stream shorter than the image")
            raw_rows = [idx[y * iw : (y + 1) * iw] for y in range(ih)]
            if iflags & 0x40:
                raw_rows = _deinterlace(raw_rows, ih)
            return width, height, [[gct[i] for i in row] for row in raw_rows]
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02X}")
    raise NotImplementedError("GIF contains no image descriptor")


def synthesize_gif_animation(
    width: int,
    height: int,
    frames: list[list[list[tuple[int, int, int]]]],
    delay_cs: int = 10,
) -> bytes:
    """Multi-frame GIF89a: one GLOBAL palette over all frames, a
    graphic-control extension + full-rect image descriptor per frame,
    NETSCAPE2.0 loop extension — the animation layout every frame
    sampler meets in the wild (full-rect, disposal 'none')."""
    palette: dict[tuple[int, int, int], int] = {}
    for fr in frames:
        for row in fr:
            for px in row:
                if px not in palette:
                    palette[px] = len(palette)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} colors exceed GIF's 256-entry palette")
    bits = max(1, (len(palette) - 1).bit_length())
    size = 1 << bits
    table = bytearray()
    inv = {i: c for c, i in palette.items()}
    for i in range(size):
        r, g, b = inv.get(i, (0, 0, 0))
        table += bytes((r, g, b))
    mcs = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    out += table
    # NETSCAPE looping extension (loop forever)
    out += bytes([0x21, 0xFF, 11]) + b"NETSCAPE2.0" + bytes([3, 1, 0, 0, 0])
    for fr in frames:
        out += bytes([0x21, 0xF9, 4, 0]) + struct.pack("<H", delay_cs) + bytes([0, 0])
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
        indices = bytes(palette[px] for row in fr for px in row)
        lzw = lzw_encode(indices, mcs)
        out += bytes([mcs])
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(
    payload: bytes,
) -> tuple[int, int, list[list[list[tuple[int, int, int]]]]]:
    """Decode EVERY full-rect frame of a (possibly animated) GIF to
    top-down (r, g, b) rows per frame. Same support boundary as
    decode_gif_pixels (global palette, optional interlace, extensions
    skipped; sub-rectangle frames / local tables raise)."""
    if payload[:6] not in _GIF_SIGS:
        raise NotImplementedError("not a GIF payload")
    width, height, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct: list[tuple[int, int, int]] = []
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        for i in range(n):
            r, g, b = payload[pos + i * 3 : pos + i * 3 + 3]
            gct.append((r, g, b))
        pos += n * 3
    frames: list[list[list[tuple[int, int, int]]]] = []
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:
            _, ix, iy, iw, ih, iflags = struct.unpack_from("<BHHHHB", payload, pos)
            pos += 10
            if iflags & 0x80:
                raise NotImplementedError("local color tables unsupported")
            if (ix, iy, iw, ih) != (0, 0, width, height):
                raise NotImplementedError("sub-rectangle frames unsupported")
            mcs = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = lzw_decode(bytes(lzw), mcs)
            if len(idx) < iw * ih:
                raise ValueError("LZW stream shorter than the frame")
            raw_rows = [idx[y * iw : (y + 1) * iw] for y in range(ih)]
            if iflags & 0x40:
                raw_rows = _deinterlace(raw_rows, ih)
            frames.append([[gct[i] for i in row] for row in raw_rows])
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02X}")
    if not frames:
        raise NotImplementedError("GIF contains no image descriptor")
    return width, height, frames
