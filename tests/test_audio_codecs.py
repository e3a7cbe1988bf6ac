"""G.711 mu-law codec (operators/multimodal.py): code-point identity,
quantization bounds, WAV format-7 container, and the format boundary."""

from __future__ import annotations

import pytest

from graphql_api_etl_spark.operators.multimodal import (
    closed_form_samples,
    synthesize_ulaw_wav,
    ulaw_decode_byte,
    ulaw_encode_sample,
    wav_ulaw_samples,
)


def test_codepoint_identity_encode_of_decode():
    """encode(decode(b)) == b for every code point except 0x7F
    (negative zero folds onto positive zero 0xFF) — the exactness
    property that makes the SQL oracle possible."""
    for b in range(256):
        back = ulaw_encode_sample(ulaw_decode_byte(b))
        assert back == (0xFF if b == 0x7F else b), b


def test_quantization_error_bounded_by_segment():
    """|decode(encode(x)) − x| < 2^seg · 8 in-range (log companding's
    contract: absolute error grows with amplitude), and clipping at
    ±32635 is the only unbounded region."""
    for x in list(range(-32768, 32768, 517)) + [0, 1, -1, 32635, -32635, 32767]:
        d = ulaw_decode_byte(ulaw_encode_sample(x))
        cl = max(-32635, min(32635, x))
        a = min(abs(cl), 32635) + 132
        seg = max(0, a.bit_length() - 8)
        assert abs(d - cl) <= (8 << seg), (x, d, seg)
        assert (d >= 0) == (x >= 0) or d == 0


def test_monotone_on_magnitudes():
    prev = -1
    for x in range(0, 32636, 97):
        d = ulaw_decode_byte(ulaw_encode_sample(x))
        assert d >= prev, x
        prev = d


def test_wav_format7_roundtrip_and_boundary():
    samples = closed_form_samples(11, 700)
    payload = synthesize_ulaw_wav(samples)
    decoded = wav_ulaw_samples(payload)
    assert len(decoded) == 700
    assert decoded == [ulaw_decode_byte(ulaw_encode_sample(s)) for s in samples]
    from graphql_api_etl_spark.operators.multimodal import synthesize_wav

    with pytest.raises(NotImplementedError, match="format 7.*got 1"):
        wav_ulaw_samples(synthesize_wav(100))


def test_alaw_codepoint_identity_all_256():
    """A-law has NO negative-zero fold: encode(decode(b)) == b for
    every code point — stronger than mu-law's 255/256."""
    from graphql_api_etl_spark.operators.multimodal import (
        alaw_decode_byte,
        alaw_encode_sample,
    )

    assert all(
        alaw_encode_sample(alaw_decode_byte(b)) == b for b in range(256)
    )


def test_alaw_wav_roundtrip_and_boundary():
    from graphql_api_etl_spark.operators.multimodal import (
        alaw_decode_byte,
        alaw_encode_sample,
        synthesize_alaw_wav,
        synthesize_ulaw_wav,
        wav_alaw_samples,
    )

    samples = closed_form_samples(13, 650)
    decoded = wav_alaw_samples(synthesize_alaw_wav(samples))
    assert decoded == [alaw_decode_byte(alaw_encode_sample(s)) for s in samples]
    with pytest.raises(NotImplementedError, match="format 6.*got 7"):
        wav_alaw_samples(synthesize_ulaw_wav(samples[:10]))


def test_alaw_segment_error_bound():
    from graphql_api_etl_spark.operators.multimodal import (
        alaw_decode_byte,
        alaw_encode_sample,
    )

    for x in list(range(-32768, 32768, 331)) + [0, 1, -1, -8, 8, 32767, -32768]:
        d = alaw_decode_byte(alaw_encode_sample(x))
        m = min(x // 8 if x >= 0 else (-x - 1) // 8, 4095)
        seg = max(0, m.bit_length() - 5)
        assert abs(d - x) <= (16 << seg), (x, d, seg)
