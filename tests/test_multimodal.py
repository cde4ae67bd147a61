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


def test_decode_stubs_raise(media):
    with pytest.raises(NotImplementedError):
        decode_image(b"x")
    with pytest.raises(NotImplementedError):
        decode_audio(b"x")


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
