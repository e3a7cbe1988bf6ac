"""GIF codec (operators/gif.py): LZW roundtrips with dictionary
resets, interlacing, palette handling, dispatch, and the explicit
unsupported-feature boundary."""

from __future__ import annotations

import random

import pytest

from graphql_api_etl_spark.operators.gif import (
    decode_gif_pixels,
    lzw_decode,
    lzw_encode,
    synthesize_gif,
)


@pytest.mark.parametrize("mcs", [2, 4, 8])
def test_lzw_roundtrip_through_dictionary_reset(mcs):
    rng = random.Random(mcs)
    data = bytes(rng.randrange(1 << mcs) for _ in range(20000))
    assert lzw_decode(lzw_encode(data, mcs), mcs) == data


def test_lzw_kwkwk_case():
    """The code-equals-next-entry case (prev + prev[0]) the naive
    decoder misses — 'aaaa…' triggers it immediately."""
    data = b"\x00" * 50
    assert lzw_decode(lzw_encode(data, 2), 2) == data


def test_plain_and_interlaced_roundtrip_match():
    rng = random.Random(7)
    rows = [
        [((rng.randrange(4)) * 64, (rng.randrange(4)) * 64, (rng.randrange(4)) * 64)
         for _ in range(13)]
        for _ in range(9)
    ]
    for interlace in (False, True):
        w, h, back = decode_gif_pixels(synthesize_gif(13, 9, rows, interlace=interlace))
        assert (w, h) == (13, 9)
        assert back == rows


def test_single_color_and_full_palette():
    rows1 = [[(7, 8, 9)] * 5 for _ in range(4)]
    assert decode_gif_pixels(synthesize_gif(5, 4, rows1))[2] == rows1
    # 256 distinct colors exactly fills the palette
    rows256 = [[(i, 255 - i, i ^ 0x5A) for i in range(r * 16, r * 16 + 16)]
               for r in range(16)]
    assert decode_gif_pixels(synthesize_gif(16, 16, rows256))[2] == rows256
    with pytest.raises(ValueError, match="exceed"):
        big = [[(x, y, (x + y) % 256) for x in range(32)] for y in range(32)]
        synthesize_gif(32, 32, big)


def test_extension_blocks_are_skipped():
    rows = [[(1, 2, 3)] * 4 for _ in range(4)]
    g = bytearray(synthesize_gif(4, 4, rows))
    # splice a comment extension between screen+palette and the image
    img_at = g.index(0x2C, 13)
    ext = bytes([0x21, 0xFE, 5]) + b"hello" + bytes([0])
    g2 = bytes(g[:img_at]) + ext + bytes(g[img_at:])
    assert decode_gif_pixels(g2)[2] == rows


def test_boundary_raises():
    with pytest.raises(NotImplementedError, match="not a GIF"):
        decode_gif_pixels(b"BM\x00\x00\x00\x00")


def test_dispatch_covers_gif():
    from graphql_api_etl_spark.operators.multimodal import (
        decode_image_pixels,
        thumbnail_gray,
    )

    rows = [[(99, 99, 99)] * 8 for _ in range(8)]
    g = synthesize_gif(8, 8, rows)
    w, h, back = decode_image_pixels(g)
    assert (w, h) == (8, 8) and back == rows
    assert thumbnail_gray(g, 2, 2) == [99 / 256.0] * 4


def test_foreign_encoded_gif_decodes():
    """A standard-encoder fixture (the classic 1x1 GIF, GCE extension
    included, EOI code OMITTED — common in the wild): validates the
    decoder's width pairing and EOF tolerance against an encoder that
    is not ours."""
    import base64

    g = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    assert decode_gif_pixels(g) == (1, 1, [[(0, 0, 0)]])


def test_animation_roundtrip_every_frame():
    from graphql_api_etl_spark.operators.gif import (
        decode_gif_frames,
        synthesize_gif_animation,
    )

    frames = [
        [[((f * 50 + (x // 8) * 30) % 256,) * 3 for x in range(16)] for _ in range(8)]
        for f in range(4)
    ]
    w, h, back = decode_gif_frames(synthesize_gif_animation(16, 8, frames))
    assert (w, h) == (16, 8)
    assert back == frames  # every frame, in order, from fresh LZW streams
