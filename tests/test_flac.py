"""FLAC pure-integer decode (operators/flac.py, r12) — round-trips
against the deterministic encoder twin across every subframe/stereo
path, CRC tamper detection, the decode cap, and integration through
the multimodal audio router (the same contract battery the WAV/PNG/
GIF/JPEG decoders carry)."""

from __future__ import annotations

import numpy as np
import pytest

from data_mining_map_reduce_spark.operators.flac import (
    FLAC_MAX_DECODED_SAMPLES,
    _decode_flac,
    encode_flac,
)
from data_mining_map_reduce_spark.operators.multimodal import (
    _audio_features,
    _default_features,
    _fake_features,
    decode_audio,
)


def _roundtrip(pcm: np.ndarray, **kw) -> bytes:
    payload = encode_flac(8000, pcm.shape[1], pcm, **kw)
    rate, ch, out = _decode_flac(payload)
    assert (rate, ch) == (8000, pcm.shape[1])
    back = np.rint(out * 32768.0).astype(np.int64)
    assert np.array_equal(back, pcm)
    return payload


def test_verbatim_mono_roundtrip():
    rng = np.random.RandomState(7)
    _roundtrip(rng.randint(-32768, 32768, size=(1000, 1), dtype=np.int64))


def test_constant_stereo_roundtrip():
    _roundtrip(np.full((500, 2), 1234, dtype=np.int64), strategy="constant")


def test_fixed_rice_roundtrip_compresses():
    t = np.arange(3000)
    pcm = (3000 * np.sin(t / 50.0)).astype(np.int64).reshape(-1, 1)
    payload = _roundtrip(pcm, strategy="fixed2")
    # Rice-coded order-2 residuals of a smooth signal must beat raw
    # 16-bit PCM by a wide margin — proves the residual path really
    # ran (verbatim would be ~6000 bytes)
    assert len(payload) < 2 * pcm.shape[0] // 3


def test_left_side_stereo_decorrelation_roundtrip():
    t = np.arange(3000)
    pcm = np.stack(
        [
            (2000 * np.sin(t / 40.0)).astype(np.int64),
            (1900 * np.sin(t / 40.0 + 0.2)).astype(np.int64),
        ],
        axis=1,
    )
    _roundtrip(pcm, strategy="fixed2", stereo="left_side")
    rng = np.random.RandomState(3)
    _roundtrip(
        rng.randint(-20000, 20000, size=(700, 2), dtype=np.int64),
        stereo="left_side",
    )


def test_right_side_and_mid_side_roundtrip():
    """The two remaining stereo decorrelations (right/side stores the
    side channel FIRST; mid/side reconstructs via the dropped-LSB
    trick m = (m << 1) | (s & 1))."""
    rng = np.random.RandomState(5)
    pcm = rng.randint(-20000, 20000, size=(700, 2), dtype=np.int64)
    t = np.arange(2000)
    smooth = np.stack(
        [
            (2000 * np.sin(t / 40.0)).astype(np.int64),
            (1900 * np.sin(t / 40.0 + 0.2)).astype(np.int64),
        ],
        axis=1,
    )
    for stereo in ("right_side", "mid_side"):
        _roundtrip(pcm, stereo=stereo)
        _roundtrip(smooth, strategy="fixed2", stereo=stereo)


def test_lpc_subframe_roundtrip():
    """LPC path: order-1, precision 5, shift 2, coefficient 4 — the
    predictor (4*s[i-1])>>2 is integer-exact, so reconstruction must
    be bit-perfect on smooth AND random input."""
    t = np.arange(2000)
    _roundtrip(
        (3000 * np.sin(t / 50.0)).astype(np.int64).reshape(-1, 1),
        strategy="lpc1",
    )
    rng = np.random.RandomState(9)
    _roundtrip(
        rng.randint(-30000, 30000, size=(900, 1), dtype=np.int64),
        strategy="lpc1",
    )


def test_escaped_raw_residual_roundtrip():
    t = np.arange(2000)
    _roundtrip(
        (3000 * np.sin(t / 50.0)).astype(np.int64).reshape(-1, 1),
        strategy="fixed2_escape",
    )


def test_wasted_bits_roundtrip():
    rng = np.random.RandomState(13)
    even = rng.randint(-4000, 4000, size=(600, 1), dtype=np.int64) * 4
    payload = _roundtrip(even, strategy="verbatim_wasted")
    # the wasted-bits stream must actually be smaller than plain
    # verbatim (two bits per sample shifted out)
    assert len(payload) < len(encode_flac(8000, 1, even))
    # and a stream with no shared factor degrades to 0 wasted bits
    _roundtrip(
        rng.randint(-30000, 30000, size=(600, 1), dtype=np.int64) | 1,
        strategy="verbatim_wasted",
    )


def test_all_bit_depths_roundtrip():
    """Every depth the decoder supports (8/12/20/24 besides the
    default 16) round-trips bit-perfectly, through independent
    verbatim AND a mid/side fixed2 stream; out-of-range samples are
    rejected at encode time."""
    rng = np.random.RandomState(7)
    t = np.arange(800)
    for bits in (8, 12, 20, 24):
        scale = 1 << (bits - 1)
        pcm = rng.randint(-scale, scale, size=(800, 2), dtype=np.int64)
        _, _, out = _decode_flac(encode_flac(8000, 2, pcm, bits=bits))
        assert np.array_equal(np.rint(out * scale).astype(np.int64), pcm)
        sm = np.stack(
            [
                (scale // 8 * np.sin(t / 40.0)).astype(np.int64),
                (scale // 9 * np.sin(t / 40.0 + 0.1)).astype(np.int64),
            ],
            axis=1,
        )
        _, _, out2 = _decode_flac(
            encode_flac(
                8000, 2, sm, bits=bits, strategy="fixed2", stereo="mid_side"
            )
        )
        assert np.array_equal(np.rint(out2 * scale).astype(np.int64), sm)
    with pytest.raises(ValueError, match="8-bit range"):
        encode_flac(8000, 1, np.array([[300]]), bits=8)


def test_multiblock_roundtrip():
    rng = np.random.RandomState(11)
    _roundtrip(
        rng.randint(-32768, 32768, size=(10000, 1), dtype=np.int64),
        block_size=1024,
    )


def test_crc_tamper_detected():
    pcm = np.full((256, 1), 99, dtype=np.int64)
    payload = bytearray(encode_flac(8000, 1, pcm, strategy="constant"))
    payload[-3] ^= 0x40  # flip a bit inside the last frame
    with pytest.raises(ValueError, match="CRC"):
        _decode_flac(bytes(payload))


def test_bit_depth_mismatch_rejected():
    """A frame sample-size code that differs from the STREAMINFO bit
    depth must fail into the ValueError fallback (r13 advisor ask) —
    otherwise the decoder would normalize the samples by the WRONG
    scale and return silently mis-scaled floats."""
    pcm = np.full((256, 1), 5, dtype=np.int64)
    payload = bytearray(encode_flac(8000, 1, pcm, strategy="constant"))
    # re-declare STREAMINFO as 8-bit; the frame header stays coded 16
    payload[8 + 13] = (payload[8 + 13] & 0x0F) | (7 << 4)
    with pytest.raises(ValueError, match="sample size"):
        _decode_flac(bytes(payload))


def test_decode_cap_refuses_bomb():
    pcm = np.zeros((16, 1), dtype=np.int64)
    payload = bytearray(encode_flac(8000, 1, pcm))
    # inflate the STREAMINFO total-samples field past the cap
    total = FLAC_MAX_DECODED_SAMPLES + 1
    payload[8 + 13] = (payload[8 + 13] & 0xF0) | ((total >> 32) & 0xF)
    payload[8 + 14 : 8 + 18] = (total & 0xFFFFFFFF).to_bytes(4, "big")
    with pytest.raises(ValueError, match="decode cap"):
        _decode_flac(bytes(payload))


def test_truncated_stream_raises_value_error():
    pcm = np.full((256, 1), 5, dtype=np.int64)
    payload = encode_flac(8000, 1, pcm)
    with pytest.raises(ValueError):
        _decode_flac(payload[: len(payload) - 10])


def test_router_dispatches_flac():
    """_default_features on a FLAC payload must equal the audio
    features of its decoded PCM — and the constant-signal probe's
    features are pinned from arithmetic, never from the decoder
    (the planted-PNG discipline): constant 8192/32768 = 0.25 ->
    rms = |x| = peak = 0.25, zero crossings 0, DC (0.25+1)/2."""
    n, rate = 4000, 8000
    pcm = np.full((n, 1), 8192, dtype=np.int64)
    payload = encode_flac(rate, 1, pcm, strategy="constant")
    feats = _default_features(payload)
    assert feats == _audio_features(*decode_audio(payload))
    expected = [
        0.25,
        0.25,
        0.25,
        0.0,
        (0.25 + 1.0) / 2.0,
        n / (n + float(rate)),
        0.0,
        rate / (rate + 44100.0),
    ]
    assert feats == pytest.approx(expected, abs=1e-12)


def test_router_falls_back_on_corrupt_flac():
    fake = b"fLaC" + b"\x00" * 40  # signature but no valid metadata
    assert _default_features(fake) == _fake_features(fake)


def test_decode_audio_rejects_unknown_codec():
    with pytest.raises(NotImplementedError, match="audio library"):
        decode_audio(b"OggS" + b"\x00" * 32)
