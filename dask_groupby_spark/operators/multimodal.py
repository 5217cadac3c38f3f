"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode kernels are STUBBED (this container has no image/audio libs —
see the clearly-marked ``_decode_image_stub``): the Spark-side contract —
schema, batch iteration, partition sizing, UDF signatures — is real and
tested.  Swapping the stub for PIL/ffmpeg is a one-function change.

Scale notes: binary payloads ride the shuffle only when explicitly
repartitioned; feature extraction is map-only (mapInPandas), so the 100 TB
plan is scan → Arrow batches → features, no wide rows ever shuffled.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# typed metadata schema carried alongside every media payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic fake binary payload + metadata from text —
    stands in for a real (payload, metadata) pair so the plumbing is
    exercised end-to-end on the driver tables."""
    payload = F.encode(F.col(text_col), "utf-8").cast("binary")
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("format"),
        (F.length(F.col(text_col)) % 1024 + 1).cast("int").alias("width"),
        (F.length(F.col(text_col)) % 768 + 1).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


def _decode_image_stub(payload: bytes) -> tuple[int, int, float]:
    """STUB decoder. A real implementation would do:

        from PIL import Image;  img = Image.open(io.BytesIO(payload))

    This container has no imaging libraries, so we emit a deterministic fake
    (width, height, mean_luma) derived from the payload bytes — keeping the
    pipeline shape (Arrow batch in, typed features out) fully real.
    """
    if payload is None:
        raise NotImplementedError("real image decode requires PIL — stubbed")
    n = len(payload)
    width = n % 1024 + 1
    height = n % 768 + 1
    mean_luma = (sum(payload[:64]) / max(1, min(n, 64))) / 255.0
    return width, height, mean_luma


def extract_image_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, meta) rows via
    ``mapInPandas`` — the pattern for any real decode/resize/frame-sample
    kernel.  Map-only: no shuffle, parallelism = input partitions."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_image_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "format": pdf["meta"].map(lambda m: m["format"]),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_luma": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(feats, schema=IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: payload → transformed payload at (width, height).
    STUB kernel (no PIL in this container): emits a deterministic truncated
    payload; a real kernel replaces only the body of ``resize_one``.
    Map-only — binary payloads never shuffle."""

    def resize_one(payload: bytes) -> bytes:
        # STUB: real impl = PIL Image.open(...).resize((width, height))
        return payload[: max(1, (width * height) % 4096)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pdf["payload"].map(resize_one),
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_video_frames(media: DataFrame, every_nth: int = 10, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: one input row fans out to ≤ ``max_frames``
    frame rows — the 1→N batch shape any real ffmpeg kernel needs.  STUB
    decoder slices the payload deterministically.  Map-only; downstream
    per-frame ops (dedup, embedding) group/shuffle on (doc_id, frame_idx)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = min(max_frames, max(1, len(payload) // max(1, every_nth)))
                for i in range(n_frames):
                    # STUB: real impl decodes frame i*every_nth via ffmpeg
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(payload[i * every_nth : (i + 1) * every_nth])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def _decode_audio_stub(payload: bytes) -> tuple[int, float, int]:
    """STUB decoder.  A real implementation would do:

        import soundfile; data, sr = soundfile.read(io.BytesIO(payload))

    No audio libs in this container, so the payload bytes stand in for a
    waveform: centered samples in [-128, 127], 8 kHz nominal rate —
    (duration_ms, rms, zero_crossings) keep the real feature shapes.
    """
    if payload is None:
        raise NotImplementedError("real audio decode requires soundfile — stubbed")
    samples = [b - 128 for b in payload]
    n = max(1, len(samples))
    duration_ms = int(n * 1000 / 8000)
    rms = (sum(s * s for s in samples) / n) ** 0.5
    zc = sum(
        1 for a, b in zip(samples, samples[1:]) if (a >= 0) != (b >= 0)
    )
    return duration_ms, rms, zc


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio analog of :func:`extract_image_features`: Arrow-batched,
    map-only (doc_id, payload) → (duration, rms, zero-crossing) features."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_audio_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "duration_ms": [d[0] for d in decoded],
                    "rms": [d[1] for d in decoded],
                    "zero_crossings": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(feats, schema=AUDIO_FEATURES_SCHEMA)
