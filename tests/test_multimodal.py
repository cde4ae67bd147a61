"""Multimodal plumbing: binary payload schema, Arrow-batched feature
extraction (stubbed decoder), metadata-only pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_mining_map_reduce_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_audio,
    decode_image,
    extract_features,
    media_summary,
    resize_media,
    sample_frames,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNG fake bytes here", 64, 48, None),
        (2, "image", "image/jpeg", b"\xff\xd8 more fake bytes", 640, 480, None),
        (3, "audio", "audio/wav", b"RIFF fake wav payload....", None, None, 2500),
        (4, "video", "video/mp4", None, 1920, 1080, 60000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_documents_ascii_assumption_for_oracle(spark):
    """The media_feature_rollup oracle replays the byte-stat fake
    features on DuckDB CHARACTER positions — valid only while the
    documents corpus is pure ASCII (byte == char). Guard it."""
    from data_mining_map_reduce_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    n_multibyte = docs.where(
        F.length(F.encode("text", "utf-8")) != F.length("text")
    ).count()
    assert n_multibyte == 0


def test_decode_unsupported_formats_raise(media):
    # unrecognized compressed formats still need codec libraries
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFFxxxxWEBPVP8 webp needs a codec library")
    # JPEG decodes for real since r11 — a JPEG-magic payload that is
    # NOT a valid JPEG raises ValueError (→ byte-stat fallback)
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8 jpeg garbage, not a real scan")
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3 an mp3 payload needs a codec")
    # truncated/garbage payloads are ValueError (fallback contract),
    # mirroring decode_image's empty-payload behavior
    with pytest.raises(ValueError):
        decode_audio(b"x")
    # RIFF magic without the WAVE form type is not recognized as WAV
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF fake wav payload....")
    # PNG is decoded for real since r10 — a PNG-magic payload that is
    # NOT a valid PNG raises ValueError (→ byte-stat fallback), never
    # NotImplementedError
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG fake bytes here")


def _ppm_p6() -> bytes:
    # 2x2: red, green / blue, white
    return b"P6\n2 2\n255\n" + bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]
    )


def _ppm_p3() -> bytes:
    return b"P3\n# a comment\n2 2\n255\n255 0 0 0 255 0\n0 0 255 255 255 255\n"


def _bmp_24() -> bytes:
    # 2x1 top-down logical pixels: red, blue; stored bottom-up BGR with
    # the row padded to 4 bytes
    import struct

    row = bytes([0, 0, 255, 255, 0, 0]) + b"\x00\x00"
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(row), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, 2, 1, 1, 24, 0, len(row), 2835, 2835, 0, 0
    )
    return header + row


def test_decode_image_real_pixels():
    """Real decode of the dependency-free formats: PPM P6/P3 and
    24-bit BMP all yield identical (w, h, RGB) for the same image."""
    w, h, rgb = decode_image(_ppm_p6())
    assert (w, h) == (2, 2)
    assert rgb == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    assert decode_image(_ppm_p3()) == (2, 2, rgb)

    w, h, rgb = decode_image(_bmp_24())
    assert (w, h) == (2, 1)
    assert rgb == bytes([255, 0, 0, 0, 0, 255])  # padding + BGR undone


def test_decode_ppm_maxval_rescale_and_p3_sanity():
    """maxval != 255 samples are rescaled to the [0, 255] range the
    downstream normalization assumes; a 'P3'-prefixed payload whose
    token stream is not exactly the declared sample count is rejected
    (structural sanity gate, r8 advice)."""
    import pytest

    from data_mining_map_reduce_spark.operators.multimodal import (
        _decode_ppm,
    )

    # maxval=15: 15 -> 255, 7 -> round(7*17) = 119, 0 -> 0
    w, h, rgb = _decode_ppm(b"P3\n1 1\n15\n15 7 0\n")
    assert (w, h, rgb) == (1, 1, bytes([255, 119, 0]))
    w, h, rgb = _decode_ppm(b"P6\n1 1\n15\n" + bytes([15, 7, 0]))
    assert rgb == bytes([255, 119, 0])

    with pytest.raises(ValueError):  # trailing garbage tokens
        _decode_ppm(b"P3\n1 1\n255\n1 2 3 extra tokens here\n")
    with pytest.raises(ValueError):  # non-numeric sample
        _decode_ppm(b"P3 is a nice format, not an image though")
    with pytest.raises(ValueError):  # sample above maxval
        _decode_ppm(b"P3\n1 1\n15\n99 0 0\n")
    with pytest.raises(ValueError):  # token wider than int64 (r9 advice:
        # numpy raises OverflowError here; must surface as ValueError so
        # _default_features falls back to byte stats, not a task crash)
        _decode_ppm(b"P3\n1 1\n255\n99999999999999999999999 0 0\n")


def _png_chunks(width, height, color, raw, plte=None, ihdr_raw=None):
    """Hand-build a PNG from already-filtered scanline bytes (for
    color types encode_png doesn't emit: grayscale, RGBA, palette)."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = (
        ihdr_raw
        if ihdr_raw is not None
        else struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + (chunk(b"PLTE", plte) if plte is not None else b"")
        + chunk(b"IDAT", zlib.compress(raw, 0))
        + chunk(b"IEND", b"")
    )


def test_decode_png_roundtrip_all_filters():
    """encode_png → _decode_png is the identity for every PNG filter
    type and a non-aligned width (exercises Sub's cumsum lanes and
    the serial Average/Paeth reconstruction)."""
    import numpy as np

    from data_mining_map_reduce_spark.operators.multimodal import (
        _decode_png,
        encode_png,
    )

    rng = np.random.default_rng(7)
    for w, h in [(1, 1), (4, 4), (7, 5)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8).tobytes()
        for filters in [None, *([[f] * h for f in (1, 2, 3, 4)]),
                        [i % 5 for i in range(h)]]:
            png = encode_png(w, h, px, filters)
            assert _decode_png(png) == (w, h, px), filters
    # and the router sees the PNG signature
    px = bytes(range(48))
    assert decode_image(encode_png(4, 4, px)) == (4, 4, px)


def test_decode_png_gray_rgba_and_rejects():
    """Grayscale replicates to RGB, RGBA drops alpha; 16-bit /
    palette / interlaced / truncated variants raise ValueError so the
    feature path falls back to byte stats."""
    from data_mining_map_reduce_spark.operators.multimodal import (
        _decode_png,
    )

    # 2x2 grayscale (color 0), filter 0 per row
    g = _png_chunks(2, 2, 0, b"\x00\x0a\x14" + b"\x00\x1e\x28")
    assert _decode_png(g) == (
        2, 2,
        bytes([10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40]),
    )
    # 1x2 RGBA (color 6): alpha dropped
    ra = _png_chunks(
        1, 2, 6, b"\x00\x01\x02\x03\xff" + b"\x00\x04\x05\x06\x80"
    )
    assert _decode_png(ra) == (1, 2, bytes([1, 2, 3, 4, 5, 6]))

    with pytest.raises(ValueError):  # palette (color 3) without PLTE
        _decode_png(_png_chunks(1, 1, 3, b"\x00\x00"))
    with pytest.raises(ValueError):  # scanline size mismatch
        _decode_png(_png_chunks(2, 2, 0, b"\x00\x0a"))
    # corrupt IDAT bytes (inflate fails) surface as ValueError
    good = _png_chunks(1, 1, 0, b"\x00\x0a")
    i = good.index(b"IDAT") + 4
    with pytest.raises(ValueError):
        _decode_png(good[:i] + b"\xff\xff\xff" + good[i + 3 :])


def test_decode_png_palette():
    """Palette (color type 3) PNGs resolve indices through the PLTE
    lookup (r10 verdict optional ask 8) — common in real scraped
    corpora, no new codec work."""
    from data_mining_map_reduce_spark.operators.multimodal import (
        _decode_png,
        decode_image,
    )

    # 3-entry palette: red, green, blue; 2x2 indices with a Sub(1)
    # filter on row 2 to prove unfilter runs at bpp=1 for palette
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    png = _png_chunks(
        2, 2, 3, b"\x00\x00\x01" + b"\x01\x02\x00", plte=plte
    )  # row2 Sub: recon = [2, 2] -> both blue
    # row 1: indices [0, 1] -> red, green; row 2 Sub-reconstructs to
    # indices [2, 2] -> blue, blue
    assert _decode_png(png) == (
        2, 2,
        bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 255]),
    )
    # the magic-sniff router reaches it too
    assert decode_image(png)[0] == 2
    # out-of-range palette index -> ValueError (byte-stat fallback)
    with pytest.raises(ValueError):
        _decode_png(_png_chunks(1, 1, 3, b"\x00\x07", plte=plte))
    # malformed PLTE (not a multiple of 3) -> ValueError
    with pytest.raises(ValueError):
        _decode_png(_png_chunks(1, 1, 3, b"\x00\x00", plte=b"\x01\x02"))


def test_decode_png_hardening():
    """r10 advice items: a non-13-byte IHDR must raise ValueError
    (struct.error escaped the byte-stat fallback contract), and the
    inflate is geometry-capped so a decompression bomb / absurd
    declared size cannot balloon executor memory."""
    import struct
    import zlib

    from data_mining_map_reduce_spark.operators.multimodal import (
        _decode_png,
        _default_features,
        _fake_features,
    )

    # IHDR length 12 (truncated): ValueError, and the feature router
    # must fall back to byte stats instead of crashing
    bad_ihdr = _png_chunks(
        1, 1, 0, b"\x00\x0a", ihdr_raw=struct.pack(">IIBBBB", 1, 1, 8, 0, 0, 0)
    )
    with pytest.raises(ValueError):
        _decode_png(bad_ihdr)
    assert _default_features(bad_ihdr) == _fake_features(bad_ihdr)

    # absurd declared geometry: rejected BEFORE any inflate
    huge = _png_chunks(
        1, 1, 2, b"",
        ihdr_raw=struct.pack(">IIBBBBB", 2**20, 2**20, 8, 2, 0, 0, 0),
    )
    with pytest.raises(ValueError, match="decode cap"):
        _decode_png(huge)

    # bomb: tiny compressed stream declaring 1x1 grey but inflating
    # far past the 2-byte scanline — the capped inflate stops at
    # expected+1 and the size check rejects; never materializes 1 MiB
    bomb_raw = zlib.compress(b"\x00" * (1 << 20), 9)
    import struct as _s

    def chunk(ctype, data):
        return (
            _s.pack(">I", len(data)) + ctype + data
            + _s.pack(">I", zlib.crc32(ctype + data))
        )

    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _s.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", bomb_raw)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="size mismatch"):
        _decode_png(bomb)


def test_extract_features_png_real_decode(spark):
    """The planted media_feature_rollup PNG flows through the REAL
    zlib decoder inside mapInPandas and yields the pixel-constant
    feature the oracle pins (queries._demo_png computes it from the
    raw pixel array, never from the decoder)."""
    import numpy as np

    from data_mining_map_reduce_spark.operators.multimodal import (
        _pixel_features,
        decode_image,
    )
    from data_mining_map_reduce_spark.queries import (
        _DEMO_PNG_PAYLOAD,
        _DEMO_PNG_PPM,
    )

    w, h, rgb = decode_image(_DEMO_PNG_PAYLOAD)
    assert (w, h) == (16, 12)
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    # independent pixel recompute (the generator formula)
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    assert (px[..., 0] == (x * 31 + y * 17) % 256).all()
    assert (px[..., 1] == (x * 13 + y * 7) % 256).all()
    assert (px[..., 2] == (x * 5 + y * 3) % 256).all()
    f0 = _pixel_features(w, h, rgb)[0]
    k = round(f0 * 997.0)
    assert round(k * 1000000.0 / 997.0) == _DEMO_PNG_PPM

    media = spark.createDataFrame(
        [(1, "png", bytearray(_DEMO_PNG_PAYLOAD))],
        "media_id long, modality string, payload binary",
    )
    row = extract_features(media).collect()[0]
    assert row.n_bytes == len(_DEMO_PNG_PAYLOAD)
    assert abs(row.features[0] - f0) < 1e-12


def test_extract_features_flac_real_decode(spark):
    """The planted media_feature_rollup FLAC probe (r13) flows
    through the REAL pure-integer decoder inside mapInPandas and
    yields the RMS the oracle pins (queries._demo_flac computes it
    from the amplitude constant, never from the decoder)."""
    import numpy as np

    from data_mining_map_reduce_spark.operators.flac import _decode_flac
    from data_mining_map_reduce_spark.queries import (
        _DEMO_FLAC_PAYLOAD,
        _DEMO_FLAC_PPM,
    )

    rate, ch, x = _decode_flac(_DEMO_FLAC_PAYLOAD)
    assert (rate, ch) == (8000, 1)
    # square wave of exactly +-0.25: RMS exact in float64
    assert float(np.sqrt((x**2).mean())) == 0.25
    k = round(0.25 * 997.0)
    assert round(k * 1000000.0 / 997.0) == _DEMO_FLAC_PPM

    media = spark.createDataFrame(
        [(1, "flac", bytearray(_DEMO_FLAC_PAYLOAD))],
        "media_id long, modality string, payload binary",
    )
    row = extract_features(media).collect()[0]
    assert row.n_bytes == len(_DEMO_FLAC_PAYLOAD)
    assert row.features[0] == 0.25


def test_extract_features_routes_real_decode(spark):
    """End-to-end through the Spark plumbing: image payloads flow
    through the REAL decoder (channel means of known pixels), while
    non-image payloads keep the byte-stat fallback bit-for-bit (the
    media_feature_rollup oracle replays that path)."""
    from data_mining_map_reduce_spark.operators.multimodal import (
        _fake_features,
    )

    text = b"just some document text, long enough to matter"
    rows = [
        (1, "image", "image/x-portable-pixmap", _ppm_p6(), 2, 2, None),
        (2, "image", "image/bmp", _bmp_24(), 2, 1, None),
        (3, "text", "text/plain", text, None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: list(r.features) for r in extract_features(media).collect()}
    # P6 2x2 (red, green, blue, white): each channel mean = 510/4/255
    assert got[1][0] == pytest.approx(0.5)
    assert got[1][1] == pytest.approx(0.5)
    assert got[1][2] == pytest.approx(0.5)
    assert got[1][7] == 1.0  # max channel value 255
    # BMP 2x1 (red, blue): means r=g? r=127.5/255, g=0, b=127.5/255
    assert got[2][0] == pytest.approx(0.5)
    assert got[2][1] == 0.0
    assert got[2][2] == pytest.approx(0.5)
    assert got[2][5] == pytest.approx(2 / 3)  # aspect w/(w+h)
    # text payload: byte-stat fallback unchanged
    assert got[3] == _fake_features(text)


def test_extract_features_shape_and_determinism(spark, media):
    a = {r.media_id: (r.n_bytes, tuple(r.features)) for r in extract_features(media).collect()}
    b = {r.media_id: (r.n_bytes, tuple(r.features)) for r in extract_features(media).collect()}
    assert a == b
    assert a[1][0] == len(b"\x89PNG fake bytes here")
    assert a[4][0] == 0  # null payload -> 0 bytes
    assert all(len(v[1]) == FEATURE_DIM for v in a.values())
    assert all(0.0 <= x <= 1.0 for v in a.values() for x in v[1])


def test_custom_feature_fn_slots_in(spark, media):
    got = extract_features(
        media, feature_fn=lambda p: [float(len(p or b""))] * FEATURE_DIM
    ).collect()
    by_id = {r.media_id: r.features[0] for r in got}
    assert by_id[3] == float(len(b"RIFF fake wav payload...."))


def test_resize_rewrites_payload_and_metadata(spark, media):
    got = {r.media_id: r for r in resize_media(media, 16, 8).collect()}
    assert len(got) == 4  # 1 row in -> 1 row out, nulls included
    for r in got.values():
        assert r.meta_width == 16 and r.meta_height == 8
        assert len(r.payload) == 16 * 8
    # deterministic: same input -> same bytes
    again = {r.media_id: r.payload for r in resize_media(media, 16, 8).collect()}
    assert {k: v.payload for k, v in got.items()} == again


def test_resize_custom_fn_slots_in(spark, media):
    got = resize_media(
        media, 4, 4, resize_fn=lambda p, w, h: bytes([len(p or b"") % 256] * (w * h))
    ).collect()
    by_id = {r.media_id: r.payload for r in got}
    assert by_id[1] == bytes([len(b"\x89PNG fake bytes here")] * 16)


def test_sample_frames_expands_rows(spark, media):
    got = sample_frames(media, n_frames=4).collect()
    assert len(got) == 16  # 4 media x 4 frames, null payload included
    by_key = {(r.media_id, r.frame_idx): r for r in got}
    # frames partition the payload exactly (concatenation round-trips)
    payload = b"RIFF fake wav payload...."
    rejoined = b"".join(by_key[(3, i)].frame_payload for i in range(4))
    assert rejoined == payload
    # ts_ms spreads evenly across meta_duration_ms (2500 for media 3)
    assert [by_key[(3, i)].ts_ms for i in range(4)] == [0, 625, 1250, 1875]
    # null payload and null duration degrade to empty frames at ts 0
    assert all(by_key[(4, i)].frame_payload == b"" for i in range(4)) or all(
        len(by_key[(4, i)].frame_payload) == 0 for i in range(4)
    )
    assert [by_key[(1, i)].ts_ms for i in range(4)] == [0, 0, 0, 0]  # null dur


def test_media_summary_prunes_payload(spark, media, tmp_path):
    """The metadata rollup's parquet scan must not read the payload
    column — that pruning is the point of the typed-metadata layout."""
    path = str(tmp_path / "media_parquet")
    media.write.parquet(path)
    back = spark.read.parquet(path)
    plan = media_summary(back)._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan
    rows = {r.modality: r.n_items for r in media_summary(back).collect()}
    assert rows == {"audio": 1, "image": 2, "video": 1}


# ---------------------------------------------------------------------------
# r11: WAV PCM + GIF real decode
# ---------------------------------------------------------------------------


def test_decode_wav_roundtrip_16_and_8_bit():
    import struct

    import numpy as np

    from data_mining_map_reduce_spark.operators.multimodal import (
        _decode_wav,
        encode_wav,
    )

    frames = np.empty((100, 2), dtype=np.int16)
    frames[:, 0] = np.arange(100) * 300 - 15000
    frames[:, 1] = -frames[:, 0]
    rate, ch, samples = _decode_wav(encode_wav(44100, 2, frames))
    assert (rate, ch, samples.shape) == (44100, 2, (100, 2))
    assert np.allclose(samples * 32768.0, frames)

    # hand-built 8-bit mono file (unsigned, midpoint 128)
    data8 = bytes([128 + 64, 128 - 64] * 10)
    fmt = struct.pack("<HHIIHH", 1, 1, 4000, 4000, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data8)) + data8
    )
    rate, ch, samples = _decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert (rate, ch) == (4000, 1)
    assert np.allclose(abs(samples), 0.5)


def test_decode_wav_rejects_unsupported_variants():
    import struct

    import numpy as np

    from data_mining_map_reduce_spark.operators.multimodal import (
        WAV_MAX_DECODED_BYTES,
        _decode_wav,
        encode_wav,
    )

    good = encode_wav(8000, 1, np.zeros((4, 1), dtype=np.int16))

    def patched_fmt(tag=1, bits=16):
        fmt = struct.pack("<HHIIHH", tag, 1, 8000, 16000, 2, bits)
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 8) + bytes(8)
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    with pytest.raises(ValueError):  # IEEE float fmt tag
        _decode_wav(patched_fmt(tag=3))
    with pytest.raises(ValueError):  # 24-bit PCM
        _decode_wav(patched_fmt(bits=24))
    with pytest.raises(ValueError):  # truncated chunk
        _decode_wav(good[:-3])
    # declared data chunk above the decode cap must refuse before
    # allocating (bomb-guard contract) — build a header that CLAIMS a
    # huge chunk without shipping the bytes: the truncation check
    # fires first, which is exactly the refuse-early behavior
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", WAV_MAX_DECODED_BYTES + 2) + bytes(64)
    )
    with pytest.raises(ValueError):
        _decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_decode_gif_roundtrip_and_rejects():
    import numpy as np

    from data_mining_map_reduce_spark.operators.multimodal import (
        _decode_gif,
        encode_gif,
    )

    rng = np.random.RandomState(11)
    w, h = 17, 7
    rgb = (rng.randint(0, 6, size=(h * w, 3)) * 40).astype(np.uint8)
    payload = encode_gif(w, h, rgb.tobytes())
    assert decode_image(payload) == (w, h, rgb.tobytes())

    # single-color image exercises the minimum (4-entry) palette
    flat = np.tile(np.array([51, 102, 204], dtype=np.uint8), (12, 1))
    assert _decode_gif(encode_gif(4, 3, flat.tobytes()))[2] == flat.tobytes()

    with pytest.raises(ValueError):
        _decode_gif(b"GIF89a")  # truncated screen descriptor
    with pytest.raises(ValueError):
        _decode_gif(b"GIFXXa" + bytes(20))  # bad signature
    # interlaced storage round-trips to the same display-order pixels
    # (r11: four-pass de-interlace), across heights that hit 1, 2, 3,
    # and all 4 interlace passes
    for hh in (1, 2, 5, 13):
        sub = (rng.randint(0, 6, size=(17 * hh, 3)) * 40).astype(np.uint8)
        inter = encode_gif(17, hh, sub.tobytes(), interlace=True)
        assert _decode_gif(inter) == (17, hh, sub.tobytes()), hh
        if hh > 4:  # rows really moved on disk
            assert inter != encode_gif(17, hh, sub.tobytes())


def test_gif_lzw_full_dictionary_growth():
    """A payload long enough to grow the LZW table past one width
    increase round-trips exactly (the encoder emits constant-width
    codes, so drive the DECODER's growth path with a pattern-heavy
    stream instead: repeated runs make the table grow fast)."""
    import numpy as np

    from data_mining_map_reduce_spark.operators.multimodal import (
        _gif_lzw_decode,
    )

    # encode [0,1,2,3]*200 with a REAL growing-dictionary LZW encoder
    # (test-local, mirrors the spec) at min_code=2, then check the
    # module decoder reproduces the byte stream
    indices = bytes([0, 1, 2, 3] * 200)
    min_code = 2
    clear, end = 1 << min_code, (1 << min_code) + 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code + 1
    codes = [clear]
    seq = b""
    widths = []
    for b in indices:
        candidate = seq + bytes([b])
        if candidate in table:
            seq = candidate
            continue
        codes.append(table[seq])
        widths.append(width)
        table[candidate] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        seq = bytes([b])
    codes.append(table[seq])
    widths.append(width)
    codes.append(end)
    widths.append(width)
    # bit-pack with per-code widths (the writer grows width AFTER the
    # code that fills the table, same as the reader)
    acc = nacc = 0
    out = bytearray()
    for code, cw in zip([clear] + codes[1:], [min_code + 1] + widths):
        acc |= code << nacc
        nacc += cw
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        out.append(acc & 0xFF)
    assert _gif_lzw_decode(bytes(out), min_code, len(indices)) == indices
    assert max(widths) > min_code + 1  # growth actually exercised


def test_extract_features_routes_wav_and_gif(spark):
    """The default feature path yields REAL audio/pixel statistics for
    WAV and GIF payloads through the same mapInPandas plumbing."""
    import numpy as np

    from data_mining_map_reduce_spark.operators.multimodal import (
        encode_gif,
        encode_wav,
    )

    amp = 8192
    frames = np.empty((500, 1), dtype=np.int16)
    frames[0::2, 0] = amp
    frames[1::2, 0] = -amp
    wav = encode_wav(8000, 1, frames)
    gif = encode_gif(
        4, 3, np.tile(np.array([51, 102, 204], dtype=np.uint8), (12, 1)).tobytes()
    )
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(wav)),
            (2, "image", bytearray(gif)),
        ],
        "media_id long, modality string, payload binary",
    )
    got = {r.media_id: r.features for r in extract_features(media).collect()}
    assert got[1][0] == 0.25  # RMS of a +-0.25 square wave, exactly
    assert got[1][2] == 0.25  # peak
    assert abs(got[2][0] - 51.0 / 255.0) < 1e-12  # R-channel mean
    assert abs(got[2][1] - 102.0 / 255.0) < 1e-12
    assert abs(got[2][2] - 204.0 / 255.0) < 1e-12


# ---------------------------------------------------------------------------
# r11: baseline JPEG real decode (operators/jpeg.py)
# ---------------------------------------------------------------------------


def test_jpeg_solid_gray_exact_roundtrip():
    """The pinned-probe exactness argument, verified: a solid gray
    with (v-128) divisible by q_dc/8 round-trips bit-for-bit."""
    import numpy as np

    from data_mining_map_reduce_spark.operators.jpeg import (
        _decode_jpeg,
        encode_jpeg,
    )

    for v in (180, 128, 50, 254):
        rgb = np.full((8, 8, 3), v, dtype=np.uint8)
        w, h, out = _decode_jpeg(encode_jpeg(8, 8, rgb.tobytes()))
        assert (w, h) == (8, 8)
        assert out == rgb.tobytes(), v


def test_jpeg_lossy_roundtrip_bounded_error():
    """Random and gradient images survive encode→decode with error
    bounded by the flat quantization step (non-8-multiple geometry
    exercises the edge-replication padding)."""
    import numpy as np

    from data_mining_map_reduce_spark.operators.jpeg import (
        _decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.RandomState(3)
    W, H = 23, 17
    px = rng.randint(0, 256, size=(H, W, 3), dtype=np.uint8)
    w, h, out = _decode_jpeg(encode_jpeg(W, H, px.tobytes()))
    assert (w, h) == (W, H)
    err = np.abs(
        np.frombuffer(out, np.uint8).reshape(H, W, 3).astype(np.int64)
        - px.astype(np.int64)
    )
    assert err.max() <= 48  # flat q=16 worst case across 3 channels

    gx = np.linspace(0, 255, W)[None, :, None]
    gy = np.linspace(0, 255, H)[:, None, None]
    sm = np.clip((gx + gy) / 2, 0, 255).astype(np.uint8).repeat(3, axis=2)
    _, _, out = _decode_jpeg(encode_jpeg(W, H, sm.tobytes()))
    err = np.abs(
        np.frombuffer(out, np.uint8).reshape(H, W, 3).astype(np.int64)
        - sm.astype(np.int64)
    )
    assert err.max() <= 8


def test_jpeg_fill_bytes_before_markers_tolerated():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
    marker. A padded stream must decode to the same pixels as the
    unpadded one (r12 fix — previously the fill byte desynced the
    marker loop into the ValueError fallback)."""
    import numpy as np

    from data_mining_map_reduce_spark.operators.jpeg import (
        _decode_jpeg,
        encode_jpeg,
    )

    rgb = np.full((8, 8, 3), 180, dtype=np.uint8)
    clean = encode_jpeg(8, 8, rgb.tobytes())
    # pad the first DQT marker (FF DB -> FF FF FF DB): legal fill
    i = clean.index(b"\xff\xdb")
    padded = clean[:i] + b"\xff\xff" + clean[i:]
    assert _decode_jpeg(padded) == _decode_jpeg(clean)


def test_jpeg_restart_interval_and_grayscale():
    import numpy as np

    from data_mining_map_reduce_spark.operators.jpeg import (
        _decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.RandomState(5)
    W, H = 48, 16  # 6x2 MCUs
    px = rng.randint(0, 256, size=(H, W, 3), dtype=np.uint8)
    plain = _decode_jpeg(encode_jpeg(W, H, px.tobytes()))
    restarted = _decode_jpeg(
        encode_jpeg(W, H, px.tobytes(), restart_interval=2)
    )
    assert plain == restarted  # DRI/RSTn path is value-neutral

    grey = _decode_jpeg(
        encode_jpeg(8, 8, np.full((8, 8, 3), 180, np.uint8).tobytes(),
                    grayscale=True)
    )
    assert grey == (8, 8, bytes([180] * 192))


def test_jpeg_rejects_unsupported_variants():
    import numpy as np

    from data_mining_map_reduce_spark.operators.jpeg import (
        _decode_jpeg,
        encode_jpeg,
    )

    good = encode_jpeg(8, 8, np.full((8, 8, 3), 90, np.uint8).tobytes())
    with pytest.raises(ValueError):  # truncated
        _decode_jpeg(good[:40])
    with pytest.raises(ValueError):  # progressive SOF2
        _decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises(ValueError):  # no SOI
        _decode_jpeg(b"\x00" + good)
    # the decoder is generic over DHT: corrupting the emitted huffman
    # table lengths must be caught, not crash
    idx = good.index(b"\xff\xc4")
    broken = bytearray(good)
    broken[idx + 5] = 200  # BITS[1] claims 200 codes of length 2
    with pytest.raises(ValueError):
        _decode_jpeg(bytes(broken))


def test_jpeg_routes_through_feature_extraction(spark):
    import numpy as np

    from data_mining_map_reduce_spark.operators.jpeg import encode_jpeg

    payload = encode_jpeg(
        8, 8, np.full((8, 8, 3), 180, np.uint8).tobytes()
    )
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload))],
        "media_id long, modality string, payload binary",
    )
    feats = extract_features(media).collect()[0].features
    assert abs(feats[0] - 180.0 / 255.0) < 1e-12


def test_default_features_never_crashes_on_corrupt_media():
    """The fallback contract, fuzzed: EVERY truncation and a byte-
    flipped variant of every valid payload must flow through
    _default_features without an exception escaping (the r10-advice
    bug class: struct.error/IndexError from a corrupt container
    crashing the mapInPandas task instead of falling back to byte
    stats)."""
    import numpy as np

    from data_mining_map_reduce_spark.operators.jpeg import encode_jpeg
    from data_mining_map_reduce_spark.operators.multimodal import (
        _default_features,
        encode_gif,
        encode_png,
        encode_wav,
    )

    px = np.arange(48, dtype=np.uint8)
    gif_px = np.tile(np.array([51, 102, 204], dtype=np.uint8), (12, 1))
    wav_frames = np.full((64, 1), 1000, dtype=np.int16)
    payloads = [
        encode_png(4, 4, px.tobytes()),
        encode_gif(4, 3, gif_px.tobytes()),
        encode_jpeg(8, 8, np.full((8, 8, 3), 77, np.uint8).tobytes()),
        encode_wav(8000, 1, wav_frames),
        b"P6\n2 2\n255\n" + bytes(12),
        _bmp_24(),
    ]
    rng = np.random.RandomState(2)
    for payload in payloads:
        for cut in range(len(payload)):
            feats = _default_features(payload[:cut])
            assert len(feats) == FEATURE_DIM
        for _ in range(50):
            broken = bytearray(payload)
            i = int(rng.randint(len(broken)))
            broken[i] ^= int(rng.randint(1, 256))
            feats = _default_features(bytes(broken))
            assert len(feats) == FEATURE_DIM


# ---------------------------------------------------------------------------
# X38 perceptual media dedup (r16)
# ---------------------------------------------------------------------------


def test_dhash_properties():
    """dHash invariants: self-distance 0; the planted near-dup
    perturbation flips exactly 2 bits; the inverted gradient flips
    all 64 (the gradient's comparisons all reverse)."""
    from data_mining_map_reduce_spark.operators.multimodal import dhash64
    from data_mining_map_reduce_spark.queries import (
        _DEMO_PNG_PAYLOAD,
        _demo_png_variants,
    )

    near, far = _demo_png_variants()
    ha, hn, hf = dhash64(_DEMO_PNG_PAYLOAD), dhash64(near), dhash64(far)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(ha, ha) == 0
    assert ham(ha, hn) == 2
    assert ham(ha, hf) == 64
    assert ham(hn, hf) >= 60


def test_media_phash_pairs_planted(spark):
    """The registered query finds the planted (A, A') image pair via
    the REAL decoder path at Hamming 2, never pairs the far image,
    and its fallback-space pairs (undecodable text payloads) are
    exactly the byte-identical exact-duplicate pairs."""
    from itertools import combinations

    from data_mining_map_reduce_spark.queries import SPARK_QUERIES
    from data_mining_map_reduce_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    rows = SPARK_QUERIES["media_phash_pairs"](spark, sf).collect()
    decoded = {(r.a, r.b): r.hamming for r in rows if r.decoded}
    assert decoded == {(-12, -11): 2}  # pair ids ordered a < b
    fallback = {(r.a, r.b): r.hamming for r in rows if not r.decoded}
    # the fallback (md5) space pairs byte-identical payloads only:
    # the planted blob twins at Hamming 0, plus any corpus docs with
    # identical RAW text bytes (there are none — planted dups differ
    # pre-normalization; derived, not assumed)
    docs = load_table(spark, sf, "documents").select("doc_id", "text").collect()
    by_text: dict = {}
    for r in docs:
        by_text.setdefault(r.text, []).append(r.doc_id)
    want = {(-15, -14): 0}
    for ids in by_text.values():
        for a, b in combinations(sorted(ids), 2):
            want[(a, b)] = 0
    assert fallback == want


def test_media_dedup_canonical_planted_cluster(spark):
    """X38 completion: A, A', A'' (two distinct 2-bit perturbations
    of the same gradient) collapse to ONE canonical via connected
    components — transitive closure through the pair graph — with
    keep = largest payload, ties to smallest id; the far image and a
    NULL-payload row stay kept singletons."""
    import numpy as np

    from data_mining_map_reduce_spark.operators.multimodal import (
        encode_png,
        media_dedup_canonical,
    )
    from data_mining_map_reduce_spark.queries import (
        _DEMO_PNG_PAYLOAD,
        _demo_png_variants,
    )

    near, far = _demo_png_variants()
    w, h = 16, 12
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    px = np.stack(
        [(x * 31 + y * 17) % 256, (x * 13 + y * 7) % 256, (x * 5 + y * 3) % 256],
        axis=-1,
    ).astype(int)
    px[9:11, 2:4, :] = np.clip(px[9:11, 2:4, :] + 120, 0, 255)
    third = encode_png(w, h, px.astype(np.uint8).tobytes(), [0] * h)

    media = spark.createDataFrame(
        [
            (1, "img", bytearray(_DEMO_PNG_PAYLOAD)),
            (2, "img", bytearray(near)),
            (3, "img", bytearray(third)),
            (4, "img", bytearray(far)),
            (5, "img", None),
        ],
        "media_id long, modality string, payload binary",
    )
    rows = {r.media_id: r for r in media_dedup_canonical(media).collect()}
    assert len(rows) == 5
    fam = [rows[1], rows[2], rows[3]]
    assert len({r.best_id for r in fam}) == 1  # one canonical for the family
    assert sum(r.is_kept for r in fam) == 1
    sizes = {m: len(p) for m, p in [(1, _DEMO_PNG_PAYLOAD), (2, near), (3, third)]}
    want_best = min(sizes, key=lambda m: (-sizes[m], m))
    assert fam[0].best_id == want_best
    assert rows[4].is_kept and rows[4].best_id == 4  # far image untouched
    assert rows[5].is_kept and rows[5].best_id == 5 and rows[5].n_bytes == 0


def test_media_dedup_canonical_query(spark):
    """The registered query at sf0.001: the (A, A') probe pair keeps
    exactly one (the larger payload), the blob twins collapse to the
    smaller id at equal size, and every corpus text row (no
    byte-identical raw texts in testdata) is a kept singleton."""
    from data_mining_map_reduce_spark.queries import (
        _DEMO_PNG_PAYLOAD,
        _demo_png_variants,
        SPARK_QUERIES,
    )

    rows = {
        r.media_id: r
        for r in SPARK_QUERIES["media_dedup_canonical"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    near, _ = _demo_png_variants()
    sizes = {-11: len(_DEMO_PNG_PAYLOAD), -12: len(near)}
    want_best = min(sizes, key=lambda m: (-sizes[m], m))
    assert rows[-11].best_id == rows[-12].best_id == want_best
    assert sum(rows[m].is_kept for m in (-11, -12)) == 1
    assert rows[-13].is_kept and rows[-13].best_id == -13
    assert rows[-14].best_id == rows[-15].best_id == -15  # tie → smaller id
    assert rows[-15].is_kept and not rows[-14].is_kept
    corpus = [r for m, r in rows.items() if m >= 0]
    assert corpus and all(r.is_kept and r.best_id == r.media_id for r in corpus)


def test_null_payloads_never_pair(spark):
    """Two NULL payloads hash per-media_id sentinels, so 'missing
    content' never reports as 'identical content' (r16 ADVICE item
    3); a NULL also never pairs with real content, and each NULL row
    still gets a phash row with decoded=False."""
    from data_mining_map_reduce_spark.operators.multimodal import (
        media_near_dup_pairs,
        perceptual_hashes,
    )

    media = spark.createDataFrame(
        [
            (1, "image", None),
            (2, "image", None),
            (3, "image", b"same-bytes"),
            (4, "image", b"same-bytes"),
        ],
        "media_id long, modality string, payload binary",
    )
    fp = {r.media_id: r for r in perceptual_hashes(media).collect()}
    assert len(fp) == 4 and not any(r.decoded for r in fp.values())
    assert fp[1].phash != fp[2].phash  # per-id sentinels differ
    assert fp[3].phash == fp[4].phash  # real identical bytes still collide
    pairs = {(r.a, r.b) for r in media_near_dup_pairs(media).collect()}
    assert pairs == {(3, 4)}
