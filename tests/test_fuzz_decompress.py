"""Decoder robustness fuzz: arbitrary bytes into decompress() must
either decode (self-describing blobs) or raise a typed error — never
hang, crash the interpreter, or return a non-f64 array. The reference's
decoders guard with CorruptedCompressedData (e.g.
poor_mans_compression.zig:217); the engine mirrors that with
CorruptBlobError at the registry boundary."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tersets_spark import Method, compress, decompress
from tersets_spark.kernels.registry import CorruptBlobError


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_decompress_random_bytes_never_crashes(blob):
    try:
        out = decompress(blob)
    except (CorruptBlobError, NotImplementedError, ValueError):
        return
    assert isinstance(out, np.ndarray) and out.dtype == np.float64


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6),
        min_size=2,
        max_size=80,
    ),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.integers(min_value=0, max_value=7),
)
def test_decompress_bitflipped_blob_never_crashes(vals, pos_seed, bit):
    """Single bit flips in REAL blobs (the likelier corruption) must
    decode or raise — across a lossless and a lossy format."""
    v = np.asarray(vals, dtype=np.float64)
    for method, cfg in (
        (Method.BitPackedDeltaEncoding, None),
        (Method.SwingFilter, {"abs_error_bound": 1.0}),
        (Method.Chimp64, None),
    ):
        blob = bytearray(compress(v, method, cfg))
        blob[pos_seed % len(blob)] ^= 1 << bit
        try:
            out = decompress(bytes(blob))
        except (CorruptBlobError, NotImplementedError, ValueError, OverflowError):
            continue
        assert isinstance(out, np.ndarray) and out.dtype == np.float64


def test_truncated_blobs_raise_or_decode():
    v = np.arange(50, dtype=np.float64)
    for method in (Method.BitPackedDeltaEncoding, Method.Chimp64, Method.Elf,
                   Method.RunLengthEncoding):
        blob = compress(v, method)
        for cut in (1, len(blob) // 2, len(blob) - 1):
            trunc = blob[:cut]
            try:
                out = decompress(trunc)
            except (CorruptBlobError, NotImplementedError, ValueError):
                continue
            assert isinstance(out, np.ndarray)
