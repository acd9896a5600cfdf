"""Long-tail catalog: RMSE segmentation, histograms, VW, ABC, BUFF,
Macaque, NeaTS — error/structure properties per method family."""

from __future__ import annotations

import numpy as np
import pytest

from tersets_spark import Method, compress, decompress


def _families(seed: int = 7) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    n = 140
    i = np.arange(n, dtype=np.float64)
    return {
        "linear": 3.0 + 0.7 * i + rng.normal(0, 0.05, n),
        "sinusoidal": 50 * np.sin(i * 0.2) + rng.normal(0, 0.05, n),
        "exponential": np.exp(i * 0.04) + rng.normal(0, 0.01, n),
        "bounded-random": rng.uniform(-100, 100, n),
        "constant-runs": np.repeat(rng.integers(0, 20, 10), 14).astype(np.float64),
        "decimals": np.round(rng.normal(50, 10, n), 3),
    }


@pytest.mark.parametrize("method", [Method.MacaqueS, Method.MacaqueV], ids=lambda m: m.name)
@pytest.mark.parametrize("fam", sorted(_families()))
def test_macaque_abs_bound(method, fam):
    v = _families()[fam]
    out = decompress(compress(v, method, {"abs_error_bound": 0.5}))
    assert out.size == v.size
    assert np.abs(v - out).max() <= 0.5


@pytest.mark.parametrize("fam", sorted(_families()))
def test_neats_abs_bound(fam):
    v = _families()[fam]
    out = decompress(compress(v, Method.NonLinearApproximation, {"abs_error_bound": 0.5}))
    assert out.size == v.size
    assert np.abs(v - out).max() <= 0.5 + 1e-9


def test_neats_dp_optimal_vs_bruteforce():
    """segmentation='dp' matches a brute-force minimum-segment DP oracle
    (the reference's optimal formulation,
    non_linear_approximation.zig:61-82) and never uses more segments
    than greedy; the error bound holds on both paths."""
    from tersets_spark.kernels import nonlinear

    def brute_min_segs(v, eps):
        n = len(v)
        dp = [0] + [n + 1] * n
        for i in range(1, n + 1):
            for j in range(i):
                if dp[j] + 1 < dp[i] and (
                    i - j == 1 or nonlinear._feasible_fit(v, j, i, eps) is not None
                ):
                    dp[i] = dp[j] + 1
        return dp[n]

    rng = np.random.default_rng(11)
    eps = 0.2
    for _ in range(6):
        parts = []
        for _ in range(int(rng.integers(2, 4))):
            k = int(rng.integers(5, 15))
            x = np.arange(k, dtype=float)
            kind = int(rng.integers(0, 3))
            if kind == 0:
                parts.append(3 + 0.5 * rng.normal() * x)
            elif kind == 1:
                parts.append(10 * np.exp(0.1 * x))
            else:
                parts.append(rng.normal(0, 5) + 2 * np.sqrt(x))
        v = np.concatenate(parts) + rng.normal(0, 0.05, sum(len(p) for p in parts))
        blob_dp = compress(
            v,
            Method.NonLinearApproximation,
            {"abs_error_bound": eps, "segmentation": "dp"},
        )
        blob_gr = compress(v, Method.NonLinearApproximation, {"abs_error_bound": eps})
        out = decompress(blob_dp)
        assert np.abs(v - out).max() <= eps + 1e-9
        nseg_dp = int(np.frombuffer(blob_dp[:4], dtype=np.uint32)[0])
        nseg_gr = int(np.frombuffer(blob_gr[:4], dtype=np.uint32)[0])
        assert nseg_dp == brute_min_segs(v, eps)
        assert nseg_dp <= nseg_gr


def test_neats_rejects_bad_segmentation_mode():
    v = np.arange(10, dtype=np.float64)
    with pytest.raises(ValueError, match="segmentation"):
        compress(
            v,
            Method.NonLinearApproximation,
            {"abs_error_bound": 1.0, "segmentation": "annealed"},
        )


@pytest.mark.parametrize("fam", sorted(_families()))
def test_abc_abs_bound(fam):
    v = _families()[fam]
    out = decompress(compress(v, Method.ABCLinearApproximation, {"abs_error_bound": 0.5}))
    assert np.abs(v - out).max() <= 0.5


@pytest.mark.parametrize("method", [Method.SlidingWindow, Method.BottomUp], ids=lambda m: m.name)
@pytest.mark.parametrize("fam", sorted(_families()))
def test_rmse_bound_per_segment(method, fam):
    """The bound constrains per-segment RMSE of the endpoint line; check
    it on the reconstructed segments (global RMSE must also hold)."""
    v = _families()[fam]
    bound = 0.5
    cfg = {"aggregate_error_type": "rmse", "aggregate_error_bound": bound}
    blob = compress(v, method, cfg)
    out = decompress(blob)
    assert out.size == v.size
    raw = np.frombuffer(blob[:-1], dtype=np.uint64)
    ends = raw[2::3].astype(np.int64)
    starts = np.concatenate(([0], ends[:-1] + 1))
    for s, e in zip(starts, ends):
        seg_err = v[s : e + 1] - out[s : e + 1]
        rmse = float(np.sqrt(np.mean(seg_err**2)))
        assert rmse <= bound + 1e-9, (method.name, fam, s, e, rmse)


@pytest.mark.parametrize(
    "method", [Method.PiecewiseConstantHistogram, Method.PiecewiseLinearHistogram],
    ids=lambda m: m.name,
)
def test_histogram_survives_squared_overflow(method):
    """|v| > ~1e154 overflows v*v to inf and turns the PWLH merge costs
    NaN; the batch rounds must hand off to the heap instead of spinning
    (and PWCH must stay unaffected). Bucket-count invariant still
    holds."""
    rng = np.random.default_rng(1)
    v = rng.normal(0, 1, 300) * 1e200
    blob = compress(v, method, {"histogram_bins_number": 8})
    out = decompress(blob)
    assert out.size == v.size
    rec = 16 if method == Method.PiecewiseConstantHistogram else 24
    assert (len(blob) - 1) // rec <= 8


@pytest.mark.parametrize(
    "method", [Method.PiecewiseConstantHistogram, Method.PiecewiseLinearHistogram],
    ids=lambda m: m.name,
)
def test_histogram_monotone_ramp_takes_heap_fallback(method):
    """An exponential series makes every merge round produce O(1) local
    minima (costs increase monotonically along the chain), which stalls
    the batch rounds into the heap fallback — exercise that path in CI
    and check the K-bucket + invariant contract on its output."""
    from tersets_spark.kernels import histogram as H
    from tersets_spark.operators import invariants as inv

    calls = {"fallback": 0}
    orig = H._min_merge

    def counting(*a, **kw):
        calls["fallback"] += 1
        return orig(*a, **kw)

    H._min_merge = counting
    try:
        v = np.exp(np.linspace(0, 40, 1024))
        k = 8
        blob = compress(v, method, {"histogram_bins_number": k})
    finally:
        H._min_merge = orig
    assert calls["fallback"] == 1, "expected the stalled batch to hand off to the heap"
    out = decompress(blob)
    cfg = {"histogram_bins_number": k}
    check = inv.check_pwch if method == Method.PiecewiseConstantHistogram else inv.check_pwlh
    assert check(v, blob[:-1] + bytes([blob[-1]]), out, cfg)


@pytest.mark.parametrize("method", [Method.SlidingWindow, Method.BottomUp], ids=lambda m: m.name)
def test_rmse_bound_survives_nan_prefix(method):
    """Regression: a NaN BEFORE a finite run used to contaminate the
    global prefix sums (cumsum carries NaN forward), turning every cost
    comparison in the post-NaN runs False and silently disabling the
    error bound — one giant segment with unbounded RMSE."""
    rng = np.random.default_rng(3)
    v = np.concatenate(([np.nan], rng.normal(0, 100, 200), [np.inf], rng.normal(0, 100, 50)))
    bound = 2.0
    cfg = {"aggregate_error_type": "rmse", "aggregate_error_bound": bound}
    blob = compress(v, method, cfg)
    out = decompress(blob)
    assert out.size == v.size
    raw = np.frombuffer(blob[:-1], dtype=np.uint64)
    ends = raw[2::3].astype(np.int64)
    starts = np.concatenate(([0], ends[:-1] + 1))
    assert ends.size > 4, "NaN prefix must not collapse the segmentation"
    for s, e in zip(starts, ends):
        seg = v[s : e + 1]
        if not np.isfinite(seg).all():
            assert e == s  # non-finite values ride singleton segments
            continue
        seg_err = seg - out[s : e + 1]
        rmse = float(np.sqrt(np.mean(seg_err**2)))
        assert rmse <= bound + 1e-9, (method.name, s, e, rmse)


@pytest.mark.parametrize(
    "method", [Method.PiecewiseConstantHistogram, Method.PiecewiseLinearHistogram],
    ids=lambda m: m.name,
)
def test_histogram_bucket_count(method):
    v = _families()["bounded-random"]
    k = 12
    blob = compress(v, method, {"histogram_bins_number": k})
    out = decompress(blob)
    assert out.size == v.size
    rec = 16 if method == Method.PiecewiseConstantHistogram else 24
    assert (len(blob) - 1) // rec == k


def test_histogram_requires_bins():
    with pytest.raises(ValueError):
        compress(np.arange(10.0), Method.PiecewiseConstantHistogram, {"histogram_bins_number": 1})


def test_vw_area_bound_keeps_endpoints():
    v = _families()["sinusoidal"]
    blob = compress(v, Method.VisvalingamWhyatt, {"area_under_curve_error": 5.0})
    out = decompress(blob)
    assert out.size == v.size
    assert out[0] == v[0] and out[-1] == v[-1]
    assert len(blob) < v.nbytes  # actually simplified


def test_buff_precision():
    rng = np.random.default_rng(3)
    v = rng.normal(0, 100, 200)
    for d in (1, 3, 6):
        out = decompress(compress(v, Method.BitPackedBUFF, {"decimal_precision": d}))
        assert np.abs(v - out).max() <= 0.5 * 10.0 ** (-d) + 1e-12
    # escape path: non-finite and huge values bit-exact
    v2 = np.array([1.5, np.nan, np.inf, -np.inf, 2**33 * 1.0, -0.0, 7.25])
    out2 = decompress(compress(v2, Method.BitPackedBUFF, {"decimal_precision": 2}))
    mask = np.isfinite(v2) & (np.abs(v2) < 2**32)
    assert np.array_equal(v2[~mask].view(np.uint64), out2[~mask].view(np.uint64))
    assert np.abs(v2[mask] - out2[mask]).max() <= 0.005


def test_every_method_code_implemented():
    from tersets_spark.kernels.registry import KERNELS

    assert {int(m) for m in KERNELS} == set(range(27))


def test_slide_random_sweep_feasible_and_maximal():
    """Seeded random sweep over mixed shapes: every segment the PLR
    search emits is caliper-feasible AND maximal, and the emitted fit
    itself stays within eps — a durability net for the extreme-line
    search beyond the five deterministic shapes."""
    import tersets_spark.kernels.swing_slide as ss

    for seed in range(24):
        rng = np.random.default_rng(5000 + seed)
        kind = seed % 4
        n = int(rng.integers(60, 300))
        if kind == 0:
            v = rng.normal(0, 20, n)
        elif kind == 1:
            v = np.cumsum(rng.normal(0, 2, n))
        elif kind == 2:
            v = rng.integers(0, 30, n).astype(float)
        else:
            v = np.repeat(rng.normal(0, 50, max(n // 6, 1)), 7)[:n] + rng.normal(0, 0.5, n)
        eps = float(rng.uniform(0.1, 4))
        vl = v.tolist()
        s = 0
        while s < n - 2:
            end, fs, fb = ss._slide_segment(v, s, n, eps, vl)
            ux, uy, lx, ly = [], [], [], []
            ss._extend_hulls(ux, uy, lx, ly, vl, s, 0, end - s + 1)
            assert ss._caliper_width(ux, uy, lx, ly)[0] / 2 <= eps, (seed, s, end)
            x = np.arange(end - s + 1, dtype=float)
            assert np.abs(v[s : end + 1] - (fb + fs * x)).max() <= eps + 1e-12, (seed, s)
            if end + 1 < n:
                ss._extend_hulls(ux, uy, lx, ly, vl, s, end - s + 1, end - s + 2)
                assert ss._caliper_width(ux, uy, lx, ly)[0] / 2 > eps, (seed, s, end)
            s = end + 1


def test_slide_boundaries_match_exhaustive_caliper_growth():
    """The PLR extreme-line search must close every segment exactly
    where exhaustive per-prefix caliper growth closes it: each emitted
    segment is feasible (width/2 <= eps) and maximal (one more point
    pushes the width over). Pins the O(1)-amortized search to the
    independent caliper implementation."""
    import tersets_spark.kernels.swing_slide as ss

    rng = np.random.default_rng(99)
    eps = 1.5
    shapes = [
        1000 * np.sin(np.arange(800) * 0.01) + rng.normal(0, 1, 800),
        rng.integers(1, 12, 800).astype(float),
        np.repeat(rng.normal(0, 30, 100), 8) + rng.normal(0, 1, 800),
        np.linspace(0, 100, 800) + rng.normal(0, 0.8, 800),
        rng.normal(0, 25, 800),
    ]
    for v in shapes:
        vl = v.tolist()
        s = 0
        n = v.size
        while s < n - 2:
            end, _fs, _fb = ss._slide_segment(v, s, n, eps, vl)
            ux, uy, lx, ly = [], [], [], []
            ss._extend_hulls(ux, uy, lx, ly, vl, s, 0, end - s + 1)
            w = ss._caliper_width(ux, uy, lx, ly)[0]
            assert w / 2 <= eps, (s, end, w)
            if end + 1 < n:  # maximality
                ss._extend_hulls(ux, uy, lx, ly, vl, s, end - s + 1, end - s + 2)
                w2 = ss._caliper_width(ux, uy, lx, ly)[0]
                assert w2 / 2 > eps, (s, end, w2)
            s = end + 1


def test_vw_fast_path_equals_reference_heap():
    """The VW fast path (vectorized init areas, candidate-only heap,
    lazy re-key, strict-below-key cascade) must reproduce the
    reference-shaped lazy-deletion heap loop EXACTLY — same surviving
    knots, hence byte-identical payloads — across adversarial shapes
    (ties, collinear stretches, plateaus, NaN-split runs) and bounds
    including 0 and huge."""
    from tersets_spark.kernels import vw
    from tersets_spark.kernels.segmentation import finite_runs

    rng = np.random.default_rng(17)
    shapes = []
    for i in range(160):
        n = int(rng.integers(3, 300))
        kind = i % 8
        if kind == 0:
            x = rng.normal(0, 1, n)
        elif kind == 1:
            x = np.sin(np.arange(n) * 0.1) * 100 + rng.normal(0, 1, n)
        elif kind == 2:
            x = rng.integers(0, 5, n).astype(float)  # heavy area ties
        elif kind == 3:
            x = np.round(rng.normal(0, 2, n))
        elif kind == 4:
            x = np.arange(n, dtype=float)  # collinear: all areas zero
        elif kind == 5:
            x = np.repeat(rng.normal(0, 1, max(1, n // 5)), 5)[:n]
        elif kind == 6:
            x = rng.integers(0, 131072, n).astype(float)
        else:
            x = np.where(rng.random(n) < 0.05, np.nan, rng.normal(0, 1, n))
        shapes.append(x)
    for bound in (0.0, 0.5, 2.0, 1e6):
        for x in shapes:
            v = np.ascontiguousarray(x, dtype=np.float64)
            for rs, re_, fin in finite_runs(v):
                if not fin:
                    continue
                assert vw._simplify_run(v, rs, re_, bound) == vw._simplify_run_ref(
                    v, rs, re_, bound
                ), (bound, rs, re_)


def test_bottom_up_fast_path_equals_reference_heap():
    """The BottomUp fast path (vectorized init pair costs,
    candidate-only heap, lazy re-key, strict-below-key cascade) must
    reproduce the reference-shaped lazy-deletion heap merge EXACTLY —
    same segment list, hence byte-identical payloads — across
    adversarial shapes and bounds including 0 (all-collinear full-merge)
    and huge."""
    from tersets_spark.kernels import seg_rmse as sr
    from tersets_spark.kernels.segmentation import finite_runs

    rng = np.random.default_rng(23)
    shapes = []
    for i in range(160):
        n = int(rng.integers(2, 300))
        kind = i % 8
        if kind == 0:
            x = rng.normal(0, 1, n)
        elif kind == 1:
            x = np.sin(np.arange(n) * 0.1) * 100 + rng.normal(0, 1, n)
        elif kind == 2:
            x = rng.integers(0, 5, n).astype(float)  # heavy cost ties
        elif kind == 3:
            x = np.round(rng.normal(0, 2, n))
        elif kind == 4:
            x = np.arange(n, dtype=float)  # collinear: all costs zero
        elif kind == 5:
            x = np.repeat(rng.normal(0, 1, max(1, n // 5)), 5)[:n]
        elif kind == 6:
            x = rng.integers(0, 131072, n).astype(float)
        else:
            x = np.where(rng.random(n) < 0.05, np.nan, rng.normal(0, 1, n))
        shapes.append(x)
    for bound in (0.0, 0.5, 2.0, 1e6):
        b2 = bound * bound
        for x in shapes:
            v = np.ascontiguousarray(x, dtype=np.float64)
            ps = sr._PrefixSums(v)
            for rs, re_, fin in finite_runs(v):
                if not fin:
                    continue
                assert sr._bottom_up_run(v, ps, rs, re_, b2) == sr._bottom_up_run_ref(
                    v, ps, rs, re_, b2
                ), (bound, rs, re_)
