"""Dependency-free media codecs: round-trips, corrupt payloads,
featurization properties (no Spark needed)."""

from __future__ import annotations

import numpy as np
import pytest

from tersets_spark.functions.media_codecs import (
    audio_features,
    decode_bmp,
    decode_ppm,
    decode_ppm_stream,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    image_features,
    real_features,
)

rng = np.random.default_rng(7)


def test_wav_roundtrip_mono_and_stereo():
    mono = rng.integers(-32768, 32767, 500).astype(np.int16)
    out, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and out.shape == (500, 1)
    assert np.array_equal(np.round(out[:, 0] * 32768.0), mono)
    stereo = rng.integers(-32768, 32767, (300, 2)).astype(np.int16)
    out2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and out2.shape == (300, 2)
    assert np.array_equal(np.round(out2 * 32768.0), stereo)


def test_wav_tolerates_extra_chunks_and_8bit():
    import struct

    mono = rng.integers(-32768, 32767, 64).astype(np.int16)
    wav = bytearray(encode_wav(mono, 16000))
    # splice a LIST chunk between fmt and data
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    insert_at = wav.index(b"data")
    spliced = bytes(wav[:insert_at]) + extra + bytes(wav[insert_at:])
    out, rate = decode_wav(spliced)
    assert rate == 16000 and out.shape == (64, 1)
    # hand-built 8-bit PCM
    data = bytes(range(200))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVEfmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack("<I", 200) + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    out8, _ = decode_wav(payload)
    assert out8.shape == (200, 1)
    assert abs(out8[128, 0]) < 1e-12  # sample 128 is the 8-bit midpoint


def test_ppm_roundtrip_and_comments():
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    dec, _ = decode_ppm(encode_ppm(img))
    assert np.array_equal(dec, img)
    # comment-laden header
    payload = b"P6 # a comment\n# another\n 17\t13 \n255\n" + img.tobytes()
    dec2, _ = decode_ppm(payload)
    assert np.array_equal(dec2, img)


def test_ppm_stream_multiframe():
    frames = [rng.integers(0, 256, (5, 6, 3), dtype=np.uint8) for _ in range(4)]
    stream = b"".join(encode_ppm(f) for f in frames)
    out = decode_ppm_stream(stream)
    assert len(out) == 4
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_bmp_roundtrip_padding():
    for w in (5, 6, 7, 8):  # exercise every 4-byte row-padding phase
        img = rng.integers(0, 256, (9, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_corrupt_payloads_raise_valueerror():
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    wav = encode_wav(rng.integers(-100, 100, 64).astype(np.int16))
    cases = [
        b"",
        b"RIFFxxxx",
        wav[:20],
        b"P6\n8 8\n255" ,  # truncated pixels
        b"P6\nxx yy\n255\n" + b"\0" * 16,
        b"P6\n99999999 99999999\n255\n",
        encode_ppm(img)[:-10],
        encode_bmp(img)[:-10],
        b"BM" + b"\0" * 60,
        b"\x89PNG\r\n\x1a\n" + b"\0" * 32,  # unsupported container
    ]
    for payload in cases:
        with pytest.raises(ValueError):
            real_features(payload)


def test_features_unit_norm_and_deterministic():
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    wav = encode_wav(1000 * np.sin(np.arange(500) * 0.3))
    for payload in (encode_ppm(img), encode_bmp(img), wav):
        f1 = real_features(payload)
        f2 = real_features(payload)
        assert f1.shape == (64,) and f1.dtype == np.float32
        assert np.array_equal(f1, f2)
        assert abs(float(np.linalg.norm(f1)) - 1.0) < 1e-5


def test_image_features_invariant_to_container():
    """The SAME pixels through PPM and BMP must embed identically —
    the embedding is a function of the image, not the container."""
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    assert np.array_equal(real_features(encode_ppm(img)), real_features(encode_bmp(img)))


def test_audio_features_distinguish_tones():
    t = np.arange(2000)
    low = encode_wav(12000 * np.sin(2 * np.pi * 200 * t / 16000))
    high = encode_wav(12000 * np.sin(2 * np.pi * 3200 * t / 16000))
    fl, fh = real_features(low), real_features(high)
    cos = float(np.dot(fl, fh))
    assert cos < 0.5  # far apart in embedding space
    assert np.argmax(fl) < np.argmax(fh)  # energy lands in ordered bands


def test_flat_image_degenerate_norm():
    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    f = image_features(img)
    assert abs(float(np.linalg.norm(f)) - 1.0) < 1e-6


def test_empty_audio_degenerate():
    f = audio_features(np.zeros((0, 1)))
    assert abs(float(np.linalg.norm(f)) - 1.0) < 1e-6
