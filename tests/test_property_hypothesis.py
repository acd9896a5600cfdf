"""Hypothesis property tests — the engine analog of the reference's
randomized generator + shrinking harness (/root/reference/src/tester.zig:
539-613 shrinks failing cases; hypothesis does the same automatically).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from tersets_spark import Method, compress, decompress
from tersets_spark.methods import LOSSLESS_METHODS
from tersets_spark.kernels.registry import KERNELS

LOSSLESS = sorted((m for m in LOSSLESS_METHODS if m in KERNELS), key=int)

finite_floats = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e15, max_value=1e15
)
any_floats = st.floats(allow_nan=True, allow_infinity=True, width=64)
tokens = st.integers(min_value=0, max_value=131071)


@settings(max_examples=40, deadline=None)
@given(st.lists(tokens, min_size=0, max_size=400), st.sampled_from(LOSSLESS))
def test_lossless_token_roundtrip(vals, method):
    v = np.asarray(vals, dtype=np.float64)
    out = decompress(compress(v, method))
    assert np.array_equal(v.view(np.uint64), out.view(np.uint64))


@settings(max_examples=30, deadline=None)
@given(st.lists(any_floats, min_size=0, max_size=200), st.sampled_from(LOSSLESS))
def test_lossless_bitwise_any_floats(vals, method):
    """Bit-for-bit including NaN payloads / ±Inf / -0.0
    (tester.zig:427-447)."""
    v = np.asarray(vals, dtype=np.float64)
    out = decompress(compress(v, method))
    assert v.size == out.size
    assert np.array_equal(v.view(np.uint64), out.view(np.uint64))


@settings(max_examples=25, deadline=None)
@given(
    st.lists(finite_floats, min_size=2, max_size=200),
    st.sampled_from(
        [
            Method.PoorMansCompressionMidrange,
            Method.PoorMansCompressionMean,
            Method.SwingFilter,
            Method.SwingFilterDisconnected,
            Method.SlideFilter,
            Method.BitPackedQuantization,
            Method.SerfQT,
            Method.MacaqueS,
            Method.MacaqueV,
        ]
    ),
    st.floats(min_value=1e-6, max_value=1e6),
)
def test_lossy_error_bound(vals, method, eps):
    v = np.asarray(vals, dtype=np.float64)
    out = decompress(compress(v, method, {"abs_error_bound": eps}))
    assert out.size == v.size
    err = np.abs(v - out)
    assert err.max() <= eps + 1e-9 * max(1.0, float(np.abs(v).max()))


@settings(max_examples=25, deadline=None)
@given(st.lists(finite_floats, min_size=2, max_size=150), st.floats(min_value=1e-3, max_value=1e3))
def test_sim_mix_piece_bound(vals, eps):
    v = np.asarray(vals, dtype=np.float64)
    for method in (Method.SimPiece, Method.MixPiece):
        out = decompress(compress(v, method, {"abs_error_bound": eps}))
        assert out.size == v.size
        assert np.abs(v - out).max() <= eps + 1e-9 * max(1.0, float(np.abs(v).max()))


@settings(max_examples=20, deadline=None)
@given(st.lists(st.lists(tokens, min_size=0, max_size=300), min_size=1, max_size=20))
def test_delta_batch_matches_single(rows):
    """compress_batch blobs == formats the single-series decoder accepts,
    and batch decode reproduces every row bitwise."""
    from tersets_spark.kernels.delta import compress_batch, decompress_batch

    arrays = [np.asarray(r, dtype=np.float64) for r in rows]
    flat = np.concatenate(arrays) if arrays else np.empty(0)
    offs = np.concatenate(([0], np.cumsum([a.size for a in arrays]))).astype(np.int64)
    blobs = compress_batch(flat, offs)
    for a, b in zip(arrays, blobs):
        assert np.array_equal(decompress(bytes(b)), a)
    f2, o2 = decompress_batch(blobs)
    assert np.array_equal(o2, offs) and np.array_equal(f2, flat)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(any_floats, min_size=0, max_size=120),
        min_size=1,
        max_size=15,
    )
)
def test_delta_batch_any_floats_bitwise(rows):
    """Mixed-mode / fallback boundary of compress_batch: NaN, ±Inf, -0.0,
    fractional values, and empty rows anywhere (incl. at the END of the
    batch) must produce blobs bitwise-identical to the single-series
    encoder and batch-decode bitwise."""
    from tersets_spark.kernels.delta import compress_batch, decompress_batch

    arrays = [np.asarray(r, dtype=np.float64) for r in rows]
    flat = np.concatenate(arrays) if arrays else np.empty(0)
    offs = np.concatenate(([0], np.cumsum([a.size for a in arrays]))).astype(np.int64)
    blobs = compress_batch(flat, offs)
    for a, b in zip(arrays, blobs):
        out = decompress(bytes(b))
        assert np.array_equal(out.view(np.uint64), a.view(np.uint64))
    f2, o2 = decompress_batch(blobs)
    assert np.array_equal(o2, offs)
    assert np.array_equal(f2.view(np.uint64), flat.view(np.uint64))


def test_delta_batch_advice_counterexamples():
    """Pinned regressions from the round-1 review: trailing empty row
    clipped reduceat validity; -0.0 admitted to the all-int path."""
    from tersets_spark.kernels.delta import compress_batch, decompress_batch

    cases = [
        (np.array([1.0, 0.5]), np.array([0, 2, 2])),
        (np.array([1.0, np.nan]), np.array([0, 2, 2, 2])),
        (np.array([1.0, -0.0, 2.0]), np.array([0, 3])),
        (np.array([-0.0]), np.array([0, 0, 1, 1])),
    ]
    for flat, offs in cases:
        blobs = compress_batch(flat, offs.astype(np.int64))
        f2, o2 = decompress_batch(blobs)
        assert np.array_equal(o2, offs)
        assert np.array_equal(f2.view(np.uint64), flat.view(np.uint64))


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(any_floats, min_size=0, max_size=180),
        min_size=1,
        max_size=12,
    )
)
def test_chimp128_batch_matches_single(rows):
    """chimp128 batch blobs are byte-identical to the single-series
    encoder (predictor table, offs section and xor sections) and decode
    bitwise, for ANY floats incl. NaN/Inf."""
    from tersets_spark.kernels import chimp

    arrays = [np.asarray(r, dtype=np.float64) for r in rows]
    flat = np.concatenate(arrays) if arrays else np.empty(0)
    offs = np.concatenate(([0], np.cumsum([a.size for a in arrays]))).astype(np.int64)
    blobs = chimp.compress_batch_chimp128(flat, offs)
    for a, b in zip(arrays, blobs):
        assert bytes(b) == compress(a, Method.Chimp128)
        out = decompress(bytes(b))
        assert np.array_equal(out.view(np.uint64), a.view(np.uint64))


def test_chimp128_batch_long_row_dispatch():
    """The long-row path (per-row encoder) must emit identical blobs."""
    from tersets_spark.kernels import chimp

    rng = np.random.default_rng(9)
    rows = [rng.normal(0, 100, 3000), rng.normal(0, 1, 2500)]
    flat = np.concatenate(rows)
    offs = np.concatenate(([0], np.cumsum([r.size for r in rows]))).astype(np.int64)
    for b, r in zip(chimp.compress_batch_chimp128(flat, offs), rows):
        assert bytes(b) == compress(r, Method.Chimp128)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64), min_size=0, max_size=200), min_size=1, max_size=15))
def test_chimp_batch_matches_single(rows):
    """chimp.compress_batch blobs are byte-identical to the single-series
    encoder and batch-decode bitwise, for ANY floats incl. NaN/Inf."""
    from tersets_spark.kernels import chimp

    arrays = [np.asarray(r, dtype=np.float64) for r in rows]
    flat = np.concatenate(arrays) if arrays else np.empty(0)
    offs = np.concatenate(([0], np.cumsum([a.size for a in arrays]))).astype(np.int64)
    blobs = chimp.compress_batch(flat, offs)
    for a, b in zip(arrays, blobs):
        assert bytes(b) == compress(a, Method.Chimp64)
        out = decompress(bytes(b))
        assert np.array_equal(out.view(np.uint64), a.view(np.uint64))
    f2, o2 = chimp.decompress_batch(blobs)
    assert np.array_equal(o2, offs)
    assert np.array_equal(f2.view(np.uint64), flat.view(np.uint64))


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(any_floats, min_size=0, max_size=150),
        min_size=1,
        max_size=12,
    )
)
def test_elf_batch_matches_single(rows):
    """elf.compress_batch blobs are byte-identical to the single-series
    encoder (global erasure + verification + shared section packs) and
    decode bitwise, for ANY floats incl. NaN/Inf/-0.0."""
    from tersets_spark.kernels import elf

    arrays = [np.asarray(r, dtype=np.float64) for r in rows]
    flat = np.concatenate(arrays) if arrays else np.empty(0)
    offs = np.concatenate(([0], np.cumsum([a.size for a in arrays]))).astype(np.int64)
    blobs = elf.compress_batch(flat, offs)
    for a, b in zip(arrays, blobs):
        assert bytes(b) == compress(a, Method.Elf)
        out = decompress(bytes(b))
        assert np.array_equal(out.view(np.uint64), a.view(np.uint64))
