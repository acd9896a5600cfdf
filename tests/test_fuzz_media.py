"""Media-codec robustness fuzz (round-3 verdict #7): arbitrary bytes,
single bit-flips, and truncations of REAL WAV/PPM/BMP/PPM-stream
payloads fed to the decoders must either decode or raise ``ValueError``
— never a raw ``struct.error`` / ``IndexError`` / ``OverflowError`` or
an interpreter crash. The ``on_error='null'`` mapInPandas path is the
100-TB safety valve; these tests pin the typed-error contract it relies
on (functions/media_codecs.py catches ``ValueError`` at the row
boundary — anything else would kill the executor task)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tersets_spark.functions.media_codecs import (
    decode_bmp,
    decode_frames,
    decode_ppm,
    decode_ppm_stream,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    real_features,
)

_DECODERS = [
    ("wav", lambda b: decode_wav(b)),
    ("ppm", lambda b: decode_ppm(b)),
    ("ppm_stream", lambda b: decode_ppm_stream(b)),
    ("bmp", lambda b: decode_bmp(b)),
    ("features", lambda b: real_features(b)),
    ("frames", lambda b: decode_frames(b)),
]


def _payloads() -> dict[str, bytes]:
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (12, 16, 3)).astype(np.uint8)
    samples = (rng.normal(0, 0.2, 400).clip(-1, 1) * 32767).astype(np.int16)
    stream = encode_ppm(img) + encode_ppm(img[::-1].copy())
    return {
        "wav": encode_wav(samples),
        "ppm": encode_ppm(img),
        "bmp": encode_bmp(img),
        "stream": stream,
    }


_REAL = _payloads()


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_random_bytes_only_typed_errors(blob):
    for _name, fn in _DECODERS:
        try:
            fn(blob)
        except ValueError:
            pass  # the ONLY allowed escape


@settings(max_examples=150, deadline=None)
@given(
    st.sampled_from(sorted(_REAL)),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=0, max_value=7),
)
def test_bitflipped_real_payloads_only_typed_errors(kind, pos_seed, bit):
    payload = bytearray(_REAL[kind])
    payload[pos_seed % len(payload)] ^= 1 << bit
    blob = bytes(payload)
    for _name, fn in _DECODERS:
        try:
            out = fn(blob)
        except ValueError:
            continue
        assert out is not None  # decoded despite the flip: fine


@settings(max_examples=150, deadline=None)
@given(
    st.sampled_from(sorted(_REAL)),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_truncated_real_payloads_only_typed_errors(kind, cut_seed):
    payload = _REAL[kind]
    blob = payload[: cut_seed % len(payload)]
    for _name, fn in _DECODERS:
        try:
            fn(blob)
        except ValueError:
            pass


def test_on_error_null_survives_fuzzed_batch(spark):
    """End-to-end: a batch mixing valid media with bit-flipped and
    truncated payloads crosses the mapInPandas boundary with
    per-row nulls + err messages — no task failure."""
    from tersets_spark.operators.multimodal import extract_features, synth_real_media

    media = synth_real_media(spark, 12)
    rows = media.collect()
    rng = np.random.default_rng(3)
    bad = []
    for i, r in enumerate(rows):
        p = bytearray(bytes(r.payload))
        if i % 3 == 0:
            p[rng.integers(0, len(p))] ^= 0xFF
        elif i % 3 == 1:
            p = p[: max(1, len(p) // 3)]
        bad.append((r.media_id, r.kind, bytes(p)))
    df = spark.createDataFrame(bad, "media_id string, kind string, payload binary")
    out = extract_features(df, decode_backend="real", on_error="null").collect()
    assert len(out) == len(bad)
    for r in out:
        assert (r.feature is None) == (r.err is not None)
