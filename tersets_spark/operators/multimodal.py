"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

The Spark-side plumbing (schemas, partitioning, Arrow batch shapes, UDF
signatures) is real and tested; the actual media decode is STUBBED —
the container ships no image/audio libraries — behind
``decode_backend='fake'`` (deterministic bytes-derived features) or
``decode_backend='real'`` which raises ``NotImplementedError`` with the
integration point documented.

Scale notes: binary payloads ride the normal columnar path (parquet
keeps them page-compressed); feature extraction is ``mapInPandas`` so a
batch of blobs crosses to Python once via Arrow; fixed-size feature
vectors come back as array<float> ready for the similarity operators.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 64


def synth_media(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table exercising the binary-column
    plumbing (payload = seeded pseudorandom bytes)."""
    return (
        spark.range(n_rows)
        .withColumn("media_id", F.format_string("m_%08d", F.col("id")))
        .withColumn(
            "kind",
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.pmod(F.col("id"), 3) + 1).cast("int"),
            ),
        )
        .withColumn(
            "payload",
            F.sha2(F.concat(F.col("media_id"), F.lit(seed)), 512).cast("binary"),
        )
        .withColumn("mime", F.lit("application/octet-stream"))
        .withColumn("width", (F.pmod(F.col("id"), 1920) + 16).cast("int"))
        .withColumn("height", (F.pmod(F.col("id"), 1080) + 16).cast("int"))
        .withColumn("duration_ms", (F.pmod(F.col("id"), 60000)).cast("int"))
        .select(
            "media_id", "kind", "payload", "mime", "width", "height", "duration_ms"
        )
    )


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real encoder: expand a blake2b seed
    of the payload into a unit-norm float vector."""
    seed = int.from_bytes(
        hashlib.blake2b(payload or b"", digest_size=8).digest(), "little"
    )
    rng = np.random.default_rng(seed)
    v = rng.normal(size=dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = FEATURE_DIM, decode_backend: str = "fake"
) -> DataFrame:
    """(media_id, kind, feature array<float>) via mapInPandas.

    ``decode_backend='real'`` is the integration point for actual
    decoders (PIL/librosa/ffmpeg) — not available in this container."""
    if decode_backend == "real":
        raise NotImplementedError(
            "real media decode needs image/audio libs absent from this "
            "container; plug a decoder into _fake_features's slot"
        )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_features(bytes(p or b""), dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        featurize, schema="media_id string, kind string, feature array<float>"
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    — the JVM-side explode that would feed a real frame decoder."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms", "width", "height")
    )
