"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

Two decode backends:

* ``decode_backend='fake'`` — deterministic bytes-derived features; the
  plumbing-only mode for synthetic payloads that aren't real media.
* ``decode_backend='real'`` — REAL decoding of public container formats
  via the engine's dependency-free codecs
  (functions/media_codecs.py): WAV (RIFF/PCM) -> spectrum-band
  embedding, PPM/BMP -> grayscale-thumbnail embedding, concatenated-PPM
  video streams -> mean of per-frame embeddings. Undecodable payloads
  either raise (``on_error='raise'``) or yield a null feature with the
  error message in an ``err`` column (``on_error='null'`` — the 100-TB
  mode, where one corrupt blob must not kill a stage).

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
    media: DataFrame,
    dim: int = FEATURE_DIM,
    decode_backend: str = "fake",
    on_error: str = "raise",
) -> DataFrame:
    """(media_id, kind, feature array<float>[, err]) via mapInPandas.

    ``decode_backend='real'`` decodes the payload bytes with the pure-
    numpy public-format codecs (WAV / PPM / PPM-stream / BMP, see
    functions/media_codecs.py) and embeds them; ``'fake'`` derives a
    deterministic vector from the raw bytes (plumbing mode)."""
    if decode_backend not in ("fake", "real"):
        raise ValueError(f"unknown decode_backend {decode_backend!r}")
    if on_error not in ("raise", "null"):
        raise ValueError(f"unknown on_error {on_error!r}")
    use_real = decode_backend == "real"
    if use_real and int(dim**0.5) ** 2 != dim:
        # fail at plan-build time: image embeddings are side*side luma
        # grids, and a per-row error here would redden every image row
        raise ValueError(f"real backend needs a perfect-square dim, got {dim}")
    null_mode = on_error == "null"

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # imported on the executor from the shipped package zip
        from ..functions.media_codecs import real_features

        for pdf in batches:
            feats = []
            errs = []
            for p in pdf["payload"]:
                raw = bytes(p or b"")
                try:
                    feats.append(
                        real_features(raw, dim) if use_real else _fake_features(raw, dim)
                    )
                    errs.append(None)
                except ValueError as ex:
                    if not null_mode:
                        raise
                    feats.append(None)
                    errs.append(str(ex))
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
            }
            if null_mode:
                out["err"] = errs
            yield pd.DataFrame(out)

    schema = "media_id string, kind string, feature array<float>"
    if null_mode:
        schema += ", err string"
    return media.select("media_id", "kind", "payload").mapInPandas(
        featurize, schema=schema
    )


def synth_real_media(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic table of REAL media payloads built with the
    engine's own encoders: PPM and BMP images, PCM16 WAV tones, and
    3-frame concatenated-PPM video streams — real bytes end-to-end with
    no external fixtures. Payloads are synthesized on executors inside
    mapInPandas (no driver-side byte building)."""

    base = spark.range(n_rows).select(
        F.col("id").cast("long").alias("id"),
        F.format_string("m_%08d", F.col("id")).alias("media_id"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.media_codecs import encode_bmp, encode_ppm, encode_wav

        for pdf in batches:
            rows = []
            for rid, mid in zip(pdf["id"], pdf["media_id"]):
                rng = np.random.default_rng(seed * 1_000_003 + int(rid))
                mode = int(rid) % 4
                if mode == 0:
                    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
                    rows.append((mid, "image", encode_ppm(img), "image/x-portable-pixmap", 32, 24, 0))
                elif mode == 1:
                    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
                    rows.append((mid, "image", encode_bmp(img), "image/bmp", 16, 16, 0))
                elif mode == 2:
                    t = np.arange(800)
                    freq = 100 + (int(rid) % 40) * 25
                    wav = 12000 * np.sin(2 * np.pi * freq * t / 16000)
                    rows.append((mid, "audio", encode_wav(wav), "audio/wav", 0, 0, 50))
                else:
                    frames = [
                        rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
                        for _ in range(3)
                    ]
                    payload = b"".join(encode_ppm(f) for f in frames)
                    rows.append((mid, "video", payload, "video/x-ppm-stream", 16, 12, 3000))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "payload", "mime", "width", "height", "duration_ms"],
            )

    return base.mapInPandas(build, schema=MEDIA_SCHEMA)


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


def resize_media(
    media: DataFrame,
    factor: int = 2,
    on_error: str = "raise",
) -> DataFrame:
    """Box-average downsample every frame of image/video payloads by an
    integer ``factor`` (the resize verb of the multimodal pipeline):
    decode with the pure-numpy codecs, average factor x factor blocks,
    re-encode as (concatenated) PPM. Emits per-row input/output dims
    and the frame-set means before/after — box averaging preserves the
    global mean up to float64 rounding, which the driver gate checks.
    Audio rows and non-divisible dims error per row (``on_error='null'``
    isolates them into an ``err`` column like `extract_features`)."""
    if factor <= 0:
        raise ValueError("factor must be a positive integer")
    if on_error not in ("raise", "null"):
        raise ValueError(f"unknown on_error {on_error!r}")
    null_mode = on_error == "null"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.media_codecs import box_resize, decode_frames, encode_ppm

        for pdf in batches:
            rows = []
            for mid, kind, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                raw = bytes(p or b"")
                try:
                    frames = decode_frames(raw)
                    resized = [box_resize(f, factor) for f in frames]
                    payload_out = b"".join(
                        encode_ppm(np.clip(np.rint(r), 0, 255).astype(np.uint8))
                        for r in resized
                    )
                    mean_in = float(
                        np.mean([f.astype(np.float64).mean() for f in frames])
                    )
                    mean_out = float(np.mean([r.mean() for r in resized]))
                    h, w = frames[0].shape[0], frames[0].shape[1]
                    rows.append(
                        (mid, kind, len(frames), w, h, w // factor, h // factor,
                         payload_out, mean_in, mean_out, None)
                    )
                except ValueError as ex:
                    if not null_mode:
                        raise
                    rows.append((mid, kind, 0, 0, 0, 0, 0, None, None, None, str(ex)))
            out = pd.DataFrame(
                rows,
                columns=["media_id", "kind", "n_frames", "in_w", "in_h",
                         "out_w", "out_h", "payload", "mean_in", "mean_out", "err"],
            )
            if not null_mode:
                out = out.drop(columns=["err"])
            yield out

    schema = (
        "media_id string, kind string, n_frames int, in_w int, in_h int, "
        "out_w int, out_h int, payload binary, mean_in double, mean_out double"
    )
    if null_mode:
        schema += ", err string"
    return media.select("media_id", "kind", "payload").mapInPandas(run, schema=schema)


def resample_audio(
    media: DataFrame,
    factor: int = 4,
    on_error: str = "raise",
) -> DataFrame:
    """Box-average decimate audio payloads by an integer ``factor`` (the
    audio analog of `resize_media`): decode WAV with the pure-numpy
    codec, average factor-sample windows, re-encode PCM16 at the
    divided rate. Emits sample counts/rates and the normalized means
    before/after (box averaging preserves the mean up to float64
    rounding — the driver gate's invariant). Non-audio rows and
    non-divisible lengths error per row (``on_error='null'`` isolates
    them into ``err``)."""
    if factor <= 0:
        raise ValueError("factor must be a positive integer")
    if on_error not in ("raise", "null"):
        raise ValueError(f"unknown on_error {on_error!r}")
    null_mode = on_error == "null"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.media_codecs import box_resample, decode_wav, encode_wav

        for pdf in batches:
            rows = []
            for mid, kind, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                raw = bytes(p or b"")
                try:
                    samples, sr = decode_wav(raw)
                    out = box_resample(samples, factor)
                    payload_out = encode_wav(out * 32767.0, max(sr // factor, 1))
                    rows.append(
                        (mid, kind, int(samples.shape[0]), int(out.shape[0]),
                         int(sr), max(sr // factor, 1), payload_out,
                         float(samples.mean()), float(out.mean()), None)
                    )
                except ValueError as ex:
                    if not null_mode:
                        raise
                    rows.append((mid, kind, 0, 0, 0, 0, None, None, None, str(ex)))
            out_pdf = pd.DataFrame(
                rows,
                columns=["media_id", "kind", "n_in", "n_out", "in_rate",
                         "out_rate", "payload", "mean_in", "mean_out", "err"],
            )
            if not null_mode:
                out_pdf = out_pdf.drop(columns=["err"])
            yield out_pdf

    schema = (
        "media_id string, kind string, n_in int, n_out int, in_rate int, "
        "out_rate int, payload binary, mean_in double, mean_out double"
    )
    if null_mode:
        schema += ", err string"
    return media.select("media_id", "kind", "payload").mapInPandas(run, schema=schema)
