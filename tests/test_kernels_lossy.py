"""Lossy kernel error-bound properties.

Port of the reference's error-bounded gate: every decompressed point
must satisfy |raw - dec| <= abs_error_bound
(/root/reference/src/tester.zig:453-534, check at :508-533), over the
distribution families of tester.zig:118-133. Non-finite points must be
reproduced exactly (the reference's recording mechanism,
swing_slide_filter.zig:119-125).
"""

from __future__ import annotations

import numpy as np
import pytest

from tersets_spark import Method, compress, decompress

EPS_METHODS = [
    Method.PoorMansCompressionMidrange,
    Method.PoorMansCompressionMean,
    Method.SwingFilter,
    Method.SwingFilterDisconnected,
    Method.SlideFilter,
    Method.SimPiece,
    Method.MixPiece,
    Method.BitPackedQuantization,
    Method.SerfQT,
]

REQUIRES_POSITIVE_EPS = {Method.SimPiece, Method.MixPiece}


def _families(seed: int = 42) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    n = 140
    i = np.arange(n, dtype=np.float64)
    fams = {
        "tight-random": rng.normal(100.0, 0.5, n),
        "linear": 3.0 + 0.7 * i + rng.normal(0, 0.05, n),
        "quadratic": 0.01 * i * i - 0.3 * i + 5 + rng.normal(0, 0.05, n),
        "exponential": np.exp(i * 0.05) + rng.normal(0, 0.05, n),
        "sqrt": 10 * np.sqrt(i + 1) + rng.normal(0, 0.05, n),
        "sinusoidal": 50 * np.sin(i * 0.2) + rng.normal(0, 0.05, n),
        "bounded-random": rng.uniform(-1000, 1000, n),
        "constant-runs": np.repeat(rng.integers(0, 20, 10), 14).astype(np.float64),
        "tokens": rng.integers(0, 131072, n).astype(np.float64),
    }
    mixed = np.concatenate([fams["linear"][:50], fams["constant-runs"][:40], fams["sinusoidal"][:50]])
    fams["mixed"] = mixed
    return fams


def _check(v: np.ndarray, method: Method, eps: float) -> None:
    out = decompress(compress(v, method, {"abs_error_bound": eps}))
    assert out.size == v.size, f"{method.name}: length {out.size} != {v.size}"
    finite = np.isfinite(v)
    err = np.abs(v[finite] - out[finite])
    assert err.size == 0 or err.max() <= eps + 1e-9, (
        f"{method.name}: max err {err.max():.3g} > eps {eps:.3g}"
    )
    # non-finite points reproduced exactly (bitwise)
    if (~finite).any():
        assert np.array_equal(
            v[~finite].view(np.uint64), out[~finite].view(np.uint64)
        ), f"{method.name}: special values not exact"


@pytest.mark.parametrize("method", EPS_METHODS, ids=lambda m: m.name)
@pytest.mark.parametrize("fam", sorted(_families().keys()))
@pytest.mark.parametrize("rel_eps", [0.001, 0.01, 0.1])
def test_error_bound(method: Method, fam: str, rel_eps: float) -> None:
    v = _families()[fam]
    rng = float(np.nanmax(v) - np.nanmin(v)) or 1.0
    _check(v, method, rel_eps * rng)


@pytest.mark.parametrize(
    "method",
    [m for m in EPS_METHODS if m not in REQUIRES_POSITIVE_EPS],
    ids=lambda m: m.name,
)
def test_zero_eps_is_exact(method: Method) -> None:
    rng = np.random.default_rng(3)
    v = np.round(rng.normal(0, 100, 150), 2)
    out = decompress(compress(v, method, {"abs_error_bound": 0.0}))
    assert np.allclose(v, out, rtol=0, atol=1e-12)


@pytest.mark.parametrize("method", EPS_METHODS, ids=lambda m: m.name)
def test_special_values_injected(method: Method) -> None:
    if method in REQUIRES_POSITIVE_EPS:
        pass
    rng = np.random.default_rng(11)
    v = rng.normal(50, 5, 140)
    pos = rng.choice(140, 7, replace=False)
    v[pos] = [np.nan, np.inf, -np.inf, np.nan, -0.0, np.inf, np.nan]
    if method == Method.BitPackedQuantization or method == Method.SerfQT:
        _check(v, method, 0.5)
    else:
        _check(v, method, 0.5)


def test_positive_eps_required() -> None:
    v = np.arange(10, dtype=np.float64)
    for m in REQUIRES_POSITIVE_EPS:
        with pytest.raises(ValueError):
            compress(v, m, {"abs_error_bound": 0.0})


def test_lttb_downsampling() -> None:
    rng = np.random.default_rng(5)
    v = np.cumsum(rng.normal(0, 1, 500))
    blob = compress(v, Method.LargestTriangleThreeBuckets, {"target_point_count": 50})
    out = decompress(blob)
    assert out.size == v.size
    assert out[0] == v[0] and out[-1] == v[-1]
    assert len(blob) < v.nbytes / 4  # genuinely downsampled


def test_dft_topk() -> None:
    n = 256
    i = np.arange(n, dtype=np.float64)
    # exact bin frequencies -> no spectral leakage; 3 coefficients
    # (DC + two harmonics) reconstruct near-perfectly
    v = 2.0 + 3 * np.sin(2 * np.pi * 4 * i / n) + 0.5 * np.cos(2 * np.pi * 17 * i / n)
    blob = compress(v, Method.DiscreteFourierTransform, {"number_of_coefficients": 3})
    out = decompress(blob)
    assert out.size == v.size
    assert np.abs(v - out).max() < 1e-9
