"""Baseline JPEG codec (operators/jpeg.py): exactness on DC-only
blocks, independently-verified IDCT, roundtrip error bounds, restart
markers, subsampling, and the explicit non-baseline boundary."""

from __future__ import annotations

import math
import random

import pytest

from graphql_api_etl_spark.operators.jpeg import (
    QTABLE_FINE,
    ZIGZAG,
    _idct,
    decode_jpeg,
    decode_jpeg_pixels,
    synthesize_jpeg,
    synthesize_jpeg_gray,
)


def _naive_idct(coefs: list[float]) -> list[int]:
    """Spec-literal 2-D IDCT (T.81 A.3.3) written as the direct double
    sum — independent of the codec's separable implementation."""
    out = []
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coefs[v * 8 + u]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            val = round(s / 4.0) + 128
            out.append(min(255, max(0, val)))
    return out


def test_idct_matches_spec_literal_double_sum():
    rng = random.Random(42)
    for _ in range(5):
        coefs = [0.0] * 64
        for _ in range(8):
            coefs[rng.randrange(64)] = float(rng.randint(-512, 512))
        assert _idct(coefs) == _naive_idct(coefs)


def test_idct_batch_matches_scalar():
    """r10 vectorization contract: the numpy batch IDCT (einsum —
    float64 summation/FMA order may differ from the scalar loops in
    the last ulp) must agree with the pure-Python separable reference
    within the rounding tie: |diff| <= 1, and differences may occur
    ONLY where the scalar sum lands within an ulp of an exact .5
    boundary (both integers are then valid roundings of the same real
    value; measured rate ~1 block in 400). DC-ONLY blocks — the
    property every driver-gated oracle relies on — must be EXACT."""
    import numpy as np

    from graphql_api_etl_spark.operators.jpeg import _idct_batch, _idct_scalar

    rng = random.Random(1234)
    blocks = []
    for i in range(400):
        coefs = [0.0] * 64
        n_nz = (1, 4, 16, 64)[i % 4]
        for _ in range(n_nz):
            coefs[rng.randrange(64)] = float(rng.randint(-1024, 1024))
        blocks.append(coefs)
    got = _idct_batch(np.array(blocks, dtype=np.float64))
    n_diff = 0
    for i, coefs in enumerate(blocks):
        ref = _idct_scalar(coefs)
        diffs = [j for j in range(64) if got[i, j] != ref[j]]
        n_diff += len(diffs)
        assert all(abs(int(got[i, j]) - ref[j]) <= 1 for j in diffs), f"block {i}"
    assert n_diff <= 64  # ties are RARE; a systematic offset trips this

    # DC-only population: exact at every level (the oracle property)
    dc = []
    for c0 in range(-1024, 1025, 8):
        coefs = [0.0] * 64
        coefs[0] = float(c0)
        dc.append(coefs)
    got_dc = _idct_batch(np.array(dc, dtype=np.float64))
    for i, coefs in enumerate(dc):
        assert got_dc[i].tolist() == _idct_scalar(coefs), f"dc block {i}"


def test_constant_block_dc_only_exact():
    """An 8x8 constant tile decodes bit-exactly (DC-only; the property
    the driver-gated oracles rely on) — every level, not just a few."""
    for v in (0, 1, 77, 128, 200, 255):
        j = synthesize_jpeg_gray(8, 8, bytes([v] * 64))
        w, h, planes = decode_jpeg(j)
        assert (w, h) == (8, 8)
        assert planes[0] == [v] * 64


def test_multiblock_closed_form_exact_and_positional():
    rng = random.Random(7)
    W, H = 24, 16
    tiles = {
        (bx, by): rng.randrange(256) for by in range(H // 8) for bx in range(W // 8)
    }
    px = bytes(tiles[(x // 8, y // 8)] for y in range(H) for x in range(W))
    j = synthesize_jpeg_gray(W, H, px)
    w, h, planes = decode_jpeg(j)
    assert (w, h) == (W, H)
    assert bytes(planes[0]) == px  # exact AND in position


def test_restart_markers_reset_dc_prediction():
    rng = random.Random(9)
    W, H = 32, 8
    px = bytes(rng.randrange(256) // 8 * 8 for _ in range(W * H))
    plain = decode_jpeg(synthesize_jpeg_gray(W, H, px))[2][0]
    rst = decode_jpeg(synthesize_jpeg_gray(W, H, px, restart_interval=1))[2][0]
    assert plain == rst  # same pixels through a different entropy layout


def test_random_gray_roundtrip_near_lossless():
    rng = random.Random(3)
    px = bytes(rng.randrange(256) for _ in range(16 * 24))
    w, h, planes = decode_jpeg(synthesize_jpeg_gray(16, 24, px))
    assert max(abs(a - b) for a, b in zip(planes[0], px)) <= 2


def test_odd_dimensions_crop():
    rng = random.Random(5)
    for w0, h0 in ((13, 9), (17, 23), (8, 3)):
        px = bytes(rng.randrange(256) for _ in range(w0 * h0))
        w, h, planes = decode_jpeg(synthesize_jpeg_gray(w0, h0, px))
        assert (w, h) == (w0, h0)
        assert len(planes[0]) == w0 * h0


def test_gray_rgb_color_is_conversion_fixed_point():
    """r=g=b payloads survive YCbCr 4:2:0 bit-exactly (luma weights sum
    to 1, chroma rows sum to 0) — the mm_jpeg_color_420 contract."""
    for v in (0, 5, 77, 130, 255):
        rgb = bytes([v, v, v]) * (16 * 16)
        w, h, rows = decode_jpeg_pixels(synthesize_jpeg(16, 16, rgb, "4:2:0"))
        assert all(px == (v, v, v) for row in rows for px in row)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
def test_random_color_roundtrip_bounded(sub):
    rng = random.Random(11)
    rgb = bytes(rng.randrange(256) for _ in range(24 * 16 * 3))
    w, h, rows = decode_jpeg_pixels(synthesize_jpeg(24, 16, rgb, sub))
    assert (w, h) == (24, 16)
    if sub == "4:4:4":  # chroma not averaged → tight bound
        flat = [c for row in rows for px in row for c in px]
        assert max(abs(a - b) for a, b in zip(flat, rgb)) <= 6


def test_non_baseline_modes_raise_at_the_boundary():
    j = bytearray(synthesize_jpeg_gray(8, 8, bytes(64)))
    sof = j.find(b"\xff\xc0")
    j[sof + 1] = 0xC9  # rewrite SOF0 → SOF9 (arithmetic sequential)
    with pytest.raises(NotImplementedError, match="SOF.*0xC9"):
        decode_jpeg(bytes(j))
    with pytest.raises(NotImplementedError, match="not a JPEG"):
        decode_jpeg(b"GIF89a")


def test_dispatch_and_thumbnail_cover_jpeg():
    from graphql_api_etl_spark.operators.multimodal import (
        decode_image_pixels,
        thumbnail_gray,
    )

    j = synthesize_jpeg_gray(16, 16, bytes([99] * 256))
    w, h, rows = decode_image_pixels(j)
    assert (w, h) == (16, 16) and rows[0][0] == (99, 99, 99)
    assert thumbnail_gray(j, 2, 2) == [99 / 256.0] * 4


def test_quant_table_roundtrips_through_dqt():
    """The encoder's DQT segment is what the decoder dequantizes with:
    a coarser table must still decode (values shift, dims survive)."""
    coarse = [8] + [4] * 63
    px = bytes([50] * 64)
    w, h, planes = decode_jpeg(synthesize_jpeg_gray(8, 8, px, qtable=coarse))
    assert (w, h) == (8, 8)
    assert planes[0] == [50] * 64  # constant block: AC quant is moot


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG) == list(range(64))
    assert QTABLE_FINE[0] == 8 and all(q == 1 for q in QTABLE_FINE[1:])


# --- Foreign-encoder fixtures (VERDICT r8 ask #5) -------------------------
# Generated once with OpenJDK 17's javax.imageio JPEG plugin (an encoder
# and decoder wholly independent of this codec): a 16x16 grayscale
# gradient ((x*13 + y*7) % 256) and a 16x16 RGB ramp (r=x*16, g=y*16,
# b=((x+y)*8)%256) written with default quality — JFIF APP0 segment,
# standard Annex-K-shaped tables, and 4:2:0 chroma on the color one.
# The *_JAVA_DEC references are what Java's OWN decoder returns for the
# same bytes, so the assertion is decoder-vs-decoder on a stream our
# encoder did not produce (a mirrored encoder/decoder Huffman bug cannot
# survive this, unlike the roundtrip tests above).

_FOREIGN_GRAY_HEX = (
    "ffd8ffe000104a46494600010200000100010000ffdb00430008060607060508070707090908"
    "0a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20242e2720222c231c1c2837292c303134"
    "34341f27393d38323c2e333432ffc0000b080010001001011100ffc4001f0000010501010101"
    "010100000000000000000102030405060708090a0bffc400b510000201030302040305050404"
    "0000017d01020300041105122131410613516107227114328191a1082342b1c11552d1f02433"
    "627282090a161718191a25262728292a3435363738393a434445464748494a53545556575859"
    "5a636465666768696a737475767778797a838485868788898a92939495969798999aa2a3a4a5"
    "a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6"
    "e7e8e9eaf1f2f3f4f5f6f7f8f9faffda0008010100003f00e17c2fa57dcf96bda3c2fa57dcf9"
    "6b8ff0be95f73e5aea3c75aeff00c221e0697ecd2797a9ea19b5b4dad874c8f9e41860c36af4"
    "619c33267ad7ffd9"
)
_FOREIGN_GRAY_JAVA_DEC = [
    1, 12, 27, 40, 52, 66, 81, 91, 105, 116, 131, 144, 156, 170, 185, 195, 7,
    18, 33, 46, 58, 71, 86, 97, 111, 122, 137, 150, 162, 175, 190, 201, 15,
    26, 41, 54, 66, 79, 95, 105, 119, 130, 145, 158, 170, 183, 199, 209, 22,
    33, 48, 61, 73, 86, 101, 112, 126, 137, 152, 165, 177, 190, 205, 216, 28,
    39, 54, 67, 79, 92, 107, 118, 132, 143, 158, 171, 183, 196, 211, 222, 35,
    45, 61, 74, 86, 99, 114, 125, 139, 149, 165, 178, 190, 203, 218, 229, 43,
    54, 69, 82, 94, 107, 122, 133, 147, 158, 173, 186, 198, 211, 226, 237, 49,
    59, 74, 88, 100, 113, 128, 139, 153, 163, 178, 192, 204, 217, 232, 243,
    57, 68, 83, 96, 108, 122, 137, 147, 163, 173, 182, 202, 208, 220, 241,
    251, 63, 74, 89, 102, 114, 127, 142, 153, 149, 194, 191, 211, 215, 236,
    244, 0, 71, 82, 97, 110, 122, 135, 151, 161, 197, 174, 197, 221, 220, 252,
    248, 8, 78, 89, 104, 117, 129, 142, 157, 168, 172, 199, 210, 214, 231,
    235, 9, 13, 84, 95, 110, 123, 135, 148, 163, 174, 195, 211, 205, 224, 255,
    251, 8, 24, 91, 101, 117, 130, 142, 155, 170, 181, 196, 185, 233, 229,
    230, 9, 30, 27, 99, 110, 125, 138, 150, 163, 178, 189, 206, 214, 228, 250,
    255, 0, 24, 33, 105, 115, 130, 144, 156, 169, 184, 195, 209, 228, 226,
    253, 0, 24, 33, 45
]
_FOREIGN_COLOR_HEX = (
    "ffd8ffe000104a46494600010200000100010000ffdb00430008060607060508070707090908"
    "0a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20242e2720222c231c1c2837292c303134"
    "34341f27393d38323c2e333432ffdb0043010909090c0b0c180d0d1832211c21323232323232"
    "3232323232323232323232323232323232323232323232323232323232323232323232323232"
    "323232323232ffc00011080010001003012200021101031101ffc4001f000001050101010101"
    "0100000000000000000102030405060708090a0bffc400b51000020103030204030505040400"
    "00017d01020300041105122131410613516107227114328191a1082342b1c11552d1f0243362"
    "7282090a161718191a25262728292a3435363738393a434445464748494a535455565758595a"
    "636465666768696a737475767778797a838485868788898a92939495969798999aa2a3a4a5a6"
    "a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7"
    "e8e9eaf1f2f3f4f5f6f7f8f9faffc4001f010003010101010101010101000000000000010203"
    "0405060708090a0bffc400b51100020102040403040705040400010277000102031104052131"
    "061241510761711322328108144291a1b1c109233352f0156272d10a162434e125f11718191a"
    "262728292a35363738393a434445464748494a535455565758595a636465666768696a737475"
    "767778797a82838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7"
    "b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae2e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8f9"
    "faffda000c03010002110311003f00f37d3b40e9f2575da7681d3e4fd2ba4d3b40e9f27e95d7"
    "69da074f928a554321cfb6d4ffd9"
)
# (r, g, b) triples flattened row-major
_FOREIGN_COLOR_JAVA_DEC = [
    2, 2, 2, 10, 4, 6, 23, 6, 14, 39, 7, 20, 57, 5, 28, 74, 5, 36, 90, 5, 44,
    104, 5, 52, 123, 6, 61, 137, 4, 69, 154, 4, 76, 171, 4, 84, 187, 2, 93,
    203, 3, 99, 217, 5, 108, 226, 6, 112, 7, 13, 11, 15, 15, 15, 29, 16, 23,
    44, 18, 29, 61, 16, 36, 79, 16, 43, 96, 16, 53, 110, 15, 59, 131, 20, 73,
    144, 18, 79, 162, 18, 88, 179, 18, 96, 195, 17, 103, 211, 18, 111, 225,
    19, 119, 233, 21, 123, 12, 29, 21, 19, 32, 25, 33, 33, 33, 49, 34, 41, 66,
    32, 48, 82, 33, 55, 99, 32, 65, 113, 31, 71, 131, 33, 82, 146, 31, 88,
    162, 31, 97, 179, 31, 105, 198, 31, 113, 214, 31, 121, 227, 34, 127, 235,
    35, 131, 12, 44, 31, 19, 47, 35, 33, 48, 41, 49, 49, 49, 67, 47, 56, 82,
    48, 64, 100, 47, 73, 114, 47, 80, 130, 47, 89, 145, 45, 95, 161, 46, 105,
    179, 46, 112, 197, 45, 120, 213, 46, 128, 226, 48, 134, 234, 50, 138, 7,
    59, 37, 17, 62, 42, 31, 63, 48, 45, 65, 56, 63, 63, 63, 80, 63, 71, 97,
    63, 80, 111, 61, 86, 131, 66, 100, 145, 64, 105, 162, 64, 115, 179, 64,
    123, 197, 64, 130, 212, 64, 138, 227, 66, 144, 235, 68, 148, 7, 76, 45,
    15, 78, 49, 30, 79, 57, 44, 81, 64, 62, 79, 71, 79, 79, 79, 96, 79, 89,
    110, 77, 94, 129, 81, 107, 143, 79, 113, 160, 79, 122, 177, 79, 130, 194,
    79, 138, 210, 80, 144, 225, 81, 151, 233, 83, 155, 9, 94, 55, 16, 96, 59,
    31, 98, 67, 46, 99, 73, 64, 97, 80, 80, 97, 87, 97, 97, 97, 111, 96, 103,
    128, 97, 113, 143, 95, 119, 159, 95, 129, 176, 95, 136, 193, 93, 143, 209,
    94, 151, 222, 96, 159, 231, 98, 163, 8, 107, 60, 15, 111, 65, 30, 112, 72,
    46, 113, 80, 62, 112, 87, 79, 112, 95, 96, 111, 104, 110, 110, 110, 130,
    114, 124, 144, 113, 129, 161, 113, 139, 178, 113, 147, 194, 111, 153, 210,
    112, 159, 225, 114, 167, 231, 116, 171, 9, 124, 69, 15, 126, 73, 30, 128,
    81, 46, 129, 87, 62, 127, 93, 79, 127, 101, 96, 127, 111, 110, 126, 116,
    130, 130, 130, 144, 129, 136, 161, 128, 145, 178, 128, 153, 194, 127, 160,
    210, 128, 168, 225, 129, 175, 232, 133, 180, 9, 142, 77, 18, 144, 81, 31,
    146, 89, 47, 147, 97, 64, 145, 104, 81, 145, 111, 97, 145, 121, 112, 143,
    127, 129, 144, 137, 143, 143, 143, 160, 143, 153, 176, 143, 160, 194, 141,
    167, 209, 142, 173, 224, 144, 181, 231, 146, 185, 7, 157, 85, 15, 159, 89,
    30, 160, 96, 46, 161, 102, 63, 161, 110, 80, 161, 118, 97, 161, 127, 111,
    159, 133, 130, 163, 146, 144, 161, 151, 161, 161, 161, 178, 161, 169, 196,
    159, 176, 210, 161, 183, 225, 162, 191, 233, 164, 195, 5, 172, 92, 13,
    174, 96, 28, 176, 102, 43, 176, 110, 61, 176, 117, 78, 176, 125, 95, 176,
    135, 109, 174, 140, 129, 179, 154, 143, 177, 160, 160, 177, 169, 177, 177,
    177, 195, 175, 184, 209, 177, 192, 223, 178, 198, 233, 181, 203, 6, 190,
    102, 14, 192, 106, 27, 194, 112, 43, 195, 120, 61, 194, 128, 79, 194, 135,
    95, 195, 145, 110, 193, 151, 126, 193, 160, 140, 193, 167, 158, 192, 176,
    173, 193, 184, 191, 191, 191, 207, 192, 199, 221, 193, 205, 228, 196, 209,
    5, 205, 109, 13, 206, 113, 26, 209, 119, 42, 209, 127, 61, 209, 135, 78,
    209, 143, 94, 209, 152, 109, 207, 158, 127, 209, 169, 141, 208, 175, 158,
    207, 185, 174, 208, 192, 191, 206, 199, 207, 207, 207, 221, 208, 215, 228,
    211, 219, 7, 219, 117, 15, 221, 121, 29, 222, 129, 45, 223, 137, 61, 222,
    144, 78, 222, 152, 96, 222, 161, 109, 220, 167, 130, 225, 181, 144, 224,
    187, 161, 224, 197, 179, 224, 204, 196, 222, 211, 211, 224, 217, 225, 225,
    225, 233, 227, 229, 14, 234, 128, 23, 235, 132, 37, 237, 141, 53, 238,
    147, 69, 236, 156, 86, 236, 164, 103, 236, 171, 117, 234, 179, 136, 235,
    188, 150, 235, 196, 166, 235, 204, 183, 235, 212, 201, 233, 220, 217, 234,
    226, 230, 236, 234, 238, 238, 238
]


def test_foreign_encoded_gray_jpeg_decodes():
    """Decode a grayscale baseline JPEG from an independent encoder:
    dims exact; samples within +-1 of the foreign decoder (T.81 allows
    per-sample IDCT rounding variance; both decoders are conformant)."""
    payload = bytes.fromhex(_FOREIGN_GRAY_HEX)
    w, h, planes = decode_jpeg(payload)
    assert (w, h) == (16, 16) and len(planes) == 1
    diffs = [abs(a - b) for a, b in zip(planes[0], _FOREIGN_GRAY_JAVA_DEC)]
    assert max(diffs) <= 1
    assert sum(diffs) / len(diffs) < 0.05  # near-all samples exact


def test_foreign_encoded_color_420_jpeg_decodes():
    """Decode a 4:2:0 color baseline JPEG from an independent encoder.
    Wider tolerance than gray: Java upsamples chroma bilinearly while
    this codec uses nearest-neighbour (both spec-legal), so chroma
    ramps differ by a few codes at block edges — bounded, not drifting."""
    payload = bytes.fromhex(_FOREIGN_COLOR_HEX)
    w, h, rows = decode_jpeg_pixels(payload)
    assert (w, h) == (16, 16)
    flat = [v for row in rows for px in row for v in px]
    diffs = [abs(a - b) for a, b in zip(flat, _FOREIGN_COLOR_JAVA_DEC)]
    assert max(diffs) <= 16
    assert sum(diffs) / len(diffs) < 4.0


def test_fill_bytes_before_marker_tolerated():
    """T.81 B.1.1.2 permits 0xFF fill bytes before any marker; real
    encoders pad with them (ADVICE r8)."""
    j = synthesize_jpeg_gray(8, 8, bytes([90] * 64))
    padded = j[:2] + b"\xff\xff" + j[2:]  # fill bytes before DQT
    w, h, planes = decode_jpeg(padded)
    assert (w, h) == (8, 8) and planes[0] == [90] * 64


def test_rstn_sequence_error_raises():
    """A wrong RSTn sequence number (RST5 where RST0 belongs) means the
    stream lost sync — must fail, not decode wrong pixels."""
    j = bytearray(synthesize_jpeg_gray(16, 16, bytes(range(256)), restart_interval=1))
    at = j.index(b"\xff\xd0", j.index(b"\xff\xda"))
    j[at + 1] = 0xD5
    with pytest.raises(ValueError, match="RSTn sequence"):
        decode_jpeg(bytes(j))


def test_unscheduled_restart_marker_raises():
    """An RSTn the decoder wasn't expecting (here: DRI stripped, so the
    markers the encoder emitted are all off-schedule) used to be
    silently tolerated mid-MCU, yielding a half-written block (ADVICE
    r8); it must raise."""
    j = synthesize_jpeg_gray(16, 16, bytes(range(256)), restart_interval=1)
    dri_at = j.index(b"\xff\xdd")
    stripped = j[:dri_at] + j[dri_at + 6 :]  # drop the 6-byte DRI segment
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg(stripped)


def test_truncated_at_restart_boundary_raises_valueerror():
    """A stream cut exactly at an RSTn boundary must raise the
    ValueError the rest of the validation path produces, not an
    IndexError from the marker peek (ADVICE r10)."""
    j = synthesize_jpeg_gray(16, 16, bytes(range(256)), restart_interval=1)
    at = j.index(b"\xff\xd0", j.index(b"\xff\xda"))
    for cut in (at, at + 1):  # before the 0xFF, and between 0xFF and 0xD0
        with pytest.raises(ValueError, match="truncated entropy stream"):
            decode_jpeg(j[:cut])


# --- Progressive (SOF2) decoding ------------------------------------------


def test_progressive_roundtrip_equals_baseline_decode():
    """The progressive encoder emits the SAME quantized coefficients as
    the baseline encoder across 4 scans (spectral selection + DC
    successive approximation + EOB runs), so progressive decode must be
    bit-identical to baseline decode of the same pixels — sizes off the
    block grid and restart intervals included."""
    from graphql_api_etl_spark.operators.jpeg import synthesize_jpeg_gray_progressive

    rng = random.Random(7)
    for (w, h) in [(8, 8), (24, 8), (17, 19), (16, 24)]:
        for ri in (0, 2, 3):
            px = bytes(rng.randrange(256) for _ in range(w * h))
            base = decode_jpeg(synthesize_jpeg_gray(w, h, px))
            prog = decode_jpeg(
                synthesize_jpeg_gray_progressive(w, h, px, restart_interval=ri)
            )
            assert prog == base, (w, h, ri)


# Foreign progressive fixtures: OpenJDK 17 javax.imageio with
# MODE_DEFAULT progressive mode — its scan script uses successive
# approximation on AC bands (the refinement path our own encoder does
# not emit), so these streams exercise G.1.2.3 correction-bit decoding
# against an independent implementation. References are Java's own
# decode of the same bytes.

_FOREIGN_PROG_GRAY_HEX = (
    "ffd8ffe000104a46494600010200000100010000ffdb00430008060607060508070707090908"
    "0a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20242e2720222c231c1c2837292c303134"
    "34341f27393d38323c2e333432ffc2000b080010001801011100ffc400160001010100000000"
    "000000000000000000050406ffda000801010000000191d0112b43ffc4001910000301010100"
    "00000000000000000000020304130005ffda00080101000105029a1e6630a595d14b28f43130"
    "41b9aa98161fffc4002210000201020505000000000000000000000102000311041213213122"
    "41425261ffda0008010100063f02e267a96bf8afb1834c9a48a4db26c48fb3470c9d68d66661"
    "b4352a5d9cf26677608a3b9da7ffc4001f100100020104030100000000000000000001003111"
    "41516181217191b1ffda0008010100013f213c0b1aa78ef815c7be65f8e12c55efc7ecb85b06"
    "ac0e933f378b9a3949a8943e0773ffda0008010100000010a7ffc4001c100101000203010100"
    "0000000000000000011100213141517161ffda0008010100013f1066bff39c21103a55030831"
    "60a21179336025da034128071a17d64eeb68966fab546923b5077a71faf87810008010819a12"
    "b975a05502a87efdcfffd9"
)
_FOREIGN_PROG_GRAY_JAVA_DEC = [
    3, 9, 19, 31, 44, 56, 67, 74, 90, 95, 121, 122, 132, 131, 162, 155, 180,
    178, 205, 209, 218, 238, 241, 250, 18, 28, 42, 53, 62, 74, 89, 101, 108,
    128, 141, 130, 179, 179, 184, 209, 213, 235, 210, 255, 0, 15, 29, 44, 32,
    46, 63, 75, 82, 95, 114, 129, 139, 154, 163, 187, 172, 213, 214, 218, 206,
    224, 243, 247, 6, 20, 40, 36, 49, 62, 80, 93, 104, 118, 136, 149, 160,
    177, 183, 174, 194, 176, 237, 233, 233, 7, 25, 27, 44, 24, 35, 48, 71, 81,
    97, 113, 129, 144, 157, 165, 145, 182, 192, 204, 220, 239, 241, 5, 247, 3,
    8, 30, 56, 72, 91, 104, 88, 98, 114, 133, 149, 162, 171, 176, 188, 196,
    200, 219, 255, 234, 236, 5, 23, 40, 54, 59, 37, 62, 89, 92, 104, 118, 138,
    155, 167, 176, 184, 189, 213, 215, 255, 226, 236, 4, 20, 43, 15, 58, 50,
    67, 107, 88, 100, 123, 119, 138, 161, 177, 184, 189, 198, 206, 229, 215,
    238, 255, 16, 27, 40, 28, 68, 51, 79, 83, 94, 117, 126, 123, 129, 156,
    178, 199, 178, 195, 209, 240, 225, 255, 15, 15, 17, 33, 41, 81, 68, 67,
    101, 125, 95, 127, 153, 160, 162, 173, 183, 216, 191, 237, 251, 229, 255,
    0, 25, 48, 33, 82, 57, 65, 89, 132, 99, 115, 144, 135, 143, 162, 164, 216,
    204, 229, 228, 232, 16, 244, 38, 40, 51, 48, 65, 56, 74, 116, 98, 92, 145,
    127, 147, 178, 148, 191, 170, 217, 214, 234, 246, 23, 0, 39, 27, 47, 48,
    75, 82, 87, 121, 106, 137, 135, 147, 160, 154, 160, 201, 193, 226, 228,
    255, 234, 2, 33, 26, 45, 42, 62, 95, 72, 113, 87, 109, 147, 123, 155, 144,
    178, 197, 190, 216, 207, 208, 243, 5, 23, 31, 18, 46, 69, 55, 94, 81, 91,
    112, 122, 153, 130, 160, 164, 196, 206, 189, 223, 218, 246, 249, 0, 20,
    36, 51, 42, 77, 62, 92, 85, 100, 133, 123, 153, 139, 169, 168, 183, 174,
    216, 198, 236, 235, 247, 252, 20, 63, 40, 69, 63, 96, 89, 115, 105, 141,
    130, 160, 147, 178, 174, 191, 204, 212, 212, 243, 242, 0, 9
]
_FOREIGN_PROG_COLOR_HEX = (
    "ffd8ffe000104a46494600010200000100010000ffdb00430008060607060508070707090908"
    "0a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20242e2720222c231c1c2837292c303134"
    "34341f27393d38323c2e333432ffdb0043010909090c0b0c180d0d1832211c21323232323232"
    "3232323232323232323232323232323232323232323232323232323232323232323232323232"
    "323232323232ffc20011080010001003012200021101031101ffc40015000101000000000000"
    "00000000000000000506ffc40014010100000000000000000000000000000000ffda000c0301"
    "00021003100000019b5d25cfffc4001510010100000000000000000000000000000300ffda00"
    "08010100010502308c2308c2ffc4001511010100000000000000000000000000000400ffda00"
    "08010301013f0103efffc4001511010100000000000000000000000000000200ffda00080102"
    "01013f012affc40014100100000000000000000000000000000020ffda0008010100063f021f"
    "ffc4001510010100000000000000000000000000000061ffda0008010100013f218a28a2ffda"
    "000c0301000200030000001003ffc400161100030000000000000000000000000000002131ff"
    "da0008010301013f10833fffc40014110100000000000000000000000000000000ffda000801"
    "0201013f107fffc4001610010101000000000000000000000000000031c1ffda000801010001"
    "3f109b3ca794dfffd9"
)
_FOREIGN_PROG_COLOR_JAVA_DEC = [
    2, 2, 2, 10, 4, 6, 23, 6, 14, 39, 7, 20, 57, 5, 28, 74, 5, 36, 90, 5, 44,
    104, 5, 52, 123, 6, 61, 137, 4, 69, 154, 4, 76, 171, 4, 84, 187, 2, 93,
    203, 3, 99, 217, 5, 108, 226, 6, 112, 7, 13, 11, 15, 15, 15, 29, 16, 23,
    44, 18, 29, 61, 16, 36, 79, 16, 43, 96, 16, 53, 110, 15, 59, 131, 20, 73,
    144, 18, 79, 162, 18, 88, 179, 18, 96, 195, 17, 103, 211, 18, 111, 225,
    19, 119, 233, 21, 123, 12, 29, 21, 19, 32, 25, 33, 33, 33, 49, 34, 41, 66,
    32, 48, 82, 33, 55, 99, 32, 65, 113, 31, 71, 131, 33, 82, 146, 31, 88,
    162, 31, 97, 179, 31, 105, 198, 31, 113, 214, 31, 121, 227, 34, 127, 235,
    35, 131, 12, 44, 31, 19, 47, 35, 33, 48, 41, 49, 49, 49, 67, 47, 56, 82,
    48, 64, 100, 47, 73, 114, 47, 80, 130, 47, 89, 145, 45, 95, 161, 46, 105,
    179, 46, 112, 197, 45, 120, 213, 46, 128, 226, 48, 134, 234, 50, 138, 7,
    59, 37, 17, 62, 42, 31, 63, 48, 45, 65, 56, 63, 63, 63, 80, 63, 71, 97,
    63, 80, 111, 61, 86, 131, 66, 100, 145, 64, 105, 162, 64, 115, 179, 64,
    123, 197, 64, 130, 212, 64, 138, 227, 66, 144, 235, 68, 148, 7, 76, 45,
    15, 78, 49, 30, 79, 57, 44, 81, 64, 62, 79, 71, 79, 79, 79, 96, 79, 89,
    110, 77, 94, 129, 81, 107, 143, 79, 113, 160, 79, 122, 177, 79, 130, 194,
    79, 138, 210, 80, 144, 225, 81, 151, 233, 83, 155, 9, 94, 55, 16, 96, 59,
    31, 98, 67, 46, 99, 73, 64, 97, 80, 80, 97, 87, 97, 97, 97, 111, 96, 103,
    128, 97, 113, 143, 95, 119, 159, 95, 129, 176, 95, 136, 193, 93, 143, 209,
    94, 151, 222, 96, 159, 231, 98, 163, 8, 107, 60, 15, 111, 65, 30, 112, 72,
    46, 113, 80, 62, 112, 87, 79, 112, 95, 96, 111, 104, 110, 110, 110, 130,
    114, 124, 144, 113, 129, 161, 113, 139, 178, 113, 147, 194, 111, 153, 210,
    112, 159, 225, 114, 167, 231, 116, 171, 9, 124, 69, 15, 126, 73, 30, 128,
    81, 46, 129, 87, 62, 127, 93, 79, 127, 101, 96, 127, 111, 110, 126, 116,
    130, 130, 130, 144, 129, 136, 161, 128, 145, 178, 128, 153, 194, 127, 160,
    210, 128, 168, 225, 129, 175, 232, 133, 180, 9, 142, 77, 18, 144, 81, 31,
    146, 89, 47, 147, 97, 64, 145, 104, 81, 145, 111, 97, 145, 121, 112, 143,
    127, 129, 144, 137, 143, 143, 143, 160, 143, 153, 176, 143, 160, 194, 141,
    167, 209, 142, 173, 224, 144, 181, 231, 146, 185, 7, 157, 85, 15, 159, 89,
    30, 160, 96, 46, 161, 102, 63, 161, 110, 80, 161, 118, 97, 161, 127, 111,
    159, 133, 130, 163, 146, 144, 161, 151, 161, 161, 161, 178, 161, 169, 196,
    159, 176, 210, 161, 183, 225, 162, 191, 233, 164, 195, 5, 172, 92, 13,
    174, 96, 28, 176, 102, 43, 176, 110, 61, 176, 117, 78, 176, 125, 95, 176,
    135, 109, 174, 140, 129, 179, 154, 143, 177, 160, 160, 177, 169, 177, 177,
    177, 195, 175, 184, 209, 177, 192, 223, 178, 198, 233, 181, 203, 6, 190,
    102, 14, 192, 106, 27, 194, 112, 43, 195, 120, 61, 194, 128, 79, 194, 135,
    95, 195, 145, 110, 193, 151, 126, 193, 160, 140, 193, 167, 158, 192, 176,
    173, 193, 184, 191, 191, 191, 207, 192, 199, 221, 193, 205, 228, 196, 209,
    5, 205, 109, 13, 206, 113, 26, 209, 119, 42, 209, 127, 61, 209, 135, 78,
    209, 143, 94, 209, 152, 109, 207, 158, 127, 209, 169, 141, 208, 175, 158,
    207, 185, 174, 208, 192, 191, 206, 199, 207, 207, 207, 221, 208, 215, 228,
    211, 219, 7, 219, 117, 15, 221, 121, 29, 222, 129, 45, 223, 137, 61, 222,
    144, 78, 222, 152, 96, 222, 161, 109, 220, 167, 130, 225, 181, 144, 224,
    187, 161, 224, 197, 179, 224, 204, 196, 222, 211, 211, 224, 217, 225, 225,
    225, 233, 227, 229, 14, 234, 128, 23, 235, 132, 37, 237, 141, 53, 238,
    147, 69, 236, 156, 86, 236, 164, 103, 236, 171, 117, 234, 179, 136, 235,
    188, 150, 235, 196, 166, 235, 204, 183, 235, 212, 201, 233, 220, 217, 234,
    226, 230, 236, 234, 238, 238, 238
]


def test_foreign_progressive_gray_jpeg_decodes():
    payload = bytes.fromhex(_FOREIGN_PROG_GRAY_HEX)
    assert b"\xff\xc2" in payload  # really SOF2
    w, h, planes = decode_jpeg(payload)
    assert (w, h) == (24, 16) and len(planes) == 1
    diffs = [abs(a - b) for a, b in zip(planes[0], _FOREIGN_PROG_GRAY_JAVA_DEC)]
    assert max(diffs) <= 1
    assert sum(diffs) / len(diffs) < 0.05


def test_foreign_progressive_color_420_jpeg_decodes():
    payload = bytes.fromhex(_FOREIGN_PROG_COLOR_HEX)
    assert b"\xff\xc2" in payload
    w, h, rows = decode_jpeg_pixels(payload)
    assert (w, h) == (16, 16)
    flat = [v for row in rows for px in row for v in px]
    diffs = [abs(a - b) for a, b in zip(flat, _FOREIGN_PROG_COLOR_JAVA_DEC)]
    assert max(diffs) <= 16
    assert sum(diffs) / len(diffs) < 4.0
