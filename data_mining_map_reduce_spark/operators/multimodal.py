"""Multimodal column plumbing: opaque binary payloads + typed
metadata, feature extraction over ``mapInPandas`` (the LLM-pipeline
multimodal block).

Design contract (what IS real and tested):
- schema: payload as ``binary``, metadata as typed columns
  (modality, width/height/duration, mime) — the storage layout a
  100 TB multimodal corpus uses (parquet binary chunks, pruned
  metadata columns).
- partition shape: feature extraction runs as Arrow-batched
  ``mapInPandas`` — payload bytes stream through Python in batches,
  never materialize a full partition as one object, and the output
  schema is declared up front so Catalyst can plan around it.

What is STUBBED (decoder libraries are not in this container):
``decode_image``/``decode_audio`` raise NotImplementedError by
design; ``extract_features`` defaults to a deterministic fake
(length + xxhash-derived values) so the plumbing is testable
end-to-end. Swap ``feature_fn`` for a real decoder (PIL/librosa/
ffmpeg) in a production image — signature and batch shape are
already what that code needs.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
        T.StructField("meta_duration_ms", T.IntegerType()),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "media_id long, modality string, n_bytes long, "
    f"features array<double>"
)


def decode_image(payload: bytes):
    """STUB: real image decode requires PIL/opencv (absent here)."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in "
        "this environment; extract_features(feature_fn=...) accepts a "
        "real decoder"
    )


def decode_audio(payload: bytes):
    """STUB: real audio decode requires librosa/ffmpeg (absent here)."""
    raise NotImplementedError(
        "audio decoding requires an audio library not present in this "
        "environment; extract_features(feature_fn=...) accepts a real "
        "decoder"
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in feature vector: bytes → FEATURE_DIM
    floats derived from simple byte statistics. Replaces the decoder
    output so batch shape / schema / partitioning are testable."""
    if payload is None:
        payload = b""
    n = len(payload)
    acc = []
    for j in range(FEATURE_DIM):
        s = sum(payload[j::FEATURE_DIM]) if n else 0
        acc.append(float((s % 997) / 997.0))
    return acc


def extract_features(
    media: DataFrame,
    feature_fn: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads →
    (media_id, modality, n_bytes, features array<double>).

    The pandas iterator shape is the real contract: batches arrive as
    Arrow record batches, the payload column is bytes per row, and
    each output batch declares FEATURES_SCHEMA. A real decoder slots
    in via ``feature_fn`` without touching the Spark plumbing."""
    fn = feature_fn or _fake_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "features": [fn(p) for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "modality", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_id long, modality string, payload binary, "
    "meta_width int, meta_height int"
)

FRAMES_SCHEMA = (
    "media_id long, frame_idx int, ts_ms int, frame_payload binary"
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in resize: stride-sample the payload down
    (or tile it up) to exactly width*height bytes. Replaces the pixel
    resample so schema / metadata rewrite / batch shape are testable;
    a real PIL/opencv resample slots in via ``resize_fn``."""
    if payload is None:
        payload = b""
    target = max(width * height, 0)
    if not target:
        return b""
    if not payload:
        return bytes(target)
    if len(payload) >= target:
        stride = len(payload) // target
        return payload[:: max(stride, 1)][:target]
    reps = target // len(payload) + 1
    return (payload * reps)[:target]


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Arrow-batched payload resize → same media layout with the
    payload transformed and meta_width/meta_height rewritten to the
    target dimensions (metadata must track the payload — downstream
    pruned-metadata scans depend on it).

    1 row in → 1 row out; the binary column round-trips through Arrow
    in batches. Swap ``resize_fn`` for a real resampler (PIL/opencv)
    without touching the Spark plumbing."""
    fn = resize_fn or _fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload": [fn(p, width, height) for p in pdf["payload"]],
                    "meta_width": width,
                    "meta_height": height,
                }
            )

    return media.select("media_id", "modality", "payload").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def _fake_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic stand-in frame extraction: split the payload into
    ``n_frames`` contiguous chunks (last chunk takes the remainder).
    A real ffmpeg keyframe sampler slots in via ``frame_fn``."""
    if payload is None:
        payload = b""
    if n_frames <= 0:
        return []
    step = max(len(payload) // n_frames, 1)
    return [
        payload[i * step: (i + 1) * step] if i < n_frames - 1
        else payload[(n_frames - 1) * step:]
        for i in range(n_frames)
    ]


def sample_frames(
    media: DataFrame,
    n_frames: int,
    frame_fn: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Arrow-batched frame sampling → 1 media row explodes into up to
    ``n_frames`` rows of (media_id, frame_idx, ts_ms, frame_payload);
    ts_ms spreads frames evenly across meta_duration_ms.

    The 1→N expansion INSIDE mapInPandas is the contract a video
    pipeline needs (an output batch need not align row-for-row with
    its input batch). Swap ``frame_fn`` for a real decoder (ffmpeg)
    without touching the Spark plumbing."""
    fn = frame_fn or _fake_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ts, frames = [], [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["meta_duration_ms"]
            ):
                chunks = fn(payload, n_frames)
                dur = int(dur) if dur is not None and not pd.isna(dur) else 0
                for i, chunk in enumerate(chunks):
                    ids.append(mid)
                    idxs.append(i)
                    ts.append(i * dur // max(len(chunks), 1))
                    frames.append(chunk)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "ts_ms": ts,
                    "frame_payload": frames,
                }
            )

    return media.select("media_id", "payload", "meta_duration_ms").mapInPandas(
        run, schema=FRAMES_SCHEMA
    )


def media_summary(media: DataFrame) -> DataFrame:
    """Metadata-only rollup — must NEVER touch the payload column
    (column pruning keeps the binary bytes out of the scan; that is
    the point of the typed-metadata layout)."""
    return (
        media.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.avg("meta_duration_ms").alias("avg_duration_ms"),
            F.max("meta_width").alias("max_width"),
        )
        .orderBy("modality")
    )
