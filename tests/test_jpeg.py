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
    j[sof + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="SOF.*0xC2"):
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
