"""NonLinearApproximation — NeaTS-style multi-family segmentation
(method 16).

Reference semantics:
/root/reference/src/lossy_compression/functional_approximation/non_linear_approximation.zig:61-
— segment the series under an absolute error bound choosing, per
segment, the best of five function families: linear, quadratic,
exponential, sqrt, power. Requires abs_error_bound > 0.

Engine divergence (documented): the reference solves the DP-optimal
segmentation; the engine is *greedy longest-feasible* per segment
(galloped), with per-family least-squares fits verified against the L∞
bound — the error guarantee is identical, segment count may differ.

Payload: u32 count | per segment (u8 family, u64 end_exclusive,
3 x f64 params). Families: 0 linear a+b·x, 1 quadratic a+b·x+c·x²,
2 exponential a·e^(b·x), 3 sqrt a+b·sqrt(x), 4 power a·(x+1)^b
(x is the segment-local index).
"""

from __future__ import annotations

import numpy as np

from ..methods import Method, check_decode_count
from .registry import register
from .segmentation import finite_runs

_FAMILIES = 5


def _ls2(u: np.ndarray, y: np.ndarray):
    """Closed-form 2-parameter least squares y ~ a + b*u (normal
    equations; ~10x cheaper than np.linalg.lstsq per probe)."""
    n = u.size
    su = u.sum()
    suu = float(u @ u)
    sy = y.sum()
    suy = float(u @ y)
    den = n * suu - su * su
    if den == 0:
        return float(y.mean()), 0.0
    b = (n * suy - su * sy) / den
    a = (sy - b * su) / n
    return float(a), float(b)


def _fit_eval(fam: int, x: np.ndarray, y: np.ndarray):
    """Least-squares fit of one family; returns (params, yhat) or None
    if the family is inapplicable."""
    try:
        if fam == 0:
            a, b = _ls2(x, y)
            return (a, b, 0.0), a + b * x
        if fam == 1:
            # 3-param normal equations on the Vandermonde sums
            x2 = x * x
            n = x.size
            s1, s2 = x.sum(), x2.sum()
            s3, s4 = float(x @ x2), float(x2 @ x2)
            sy, sxy, sx2y = y.sum(), float(x @ y), float(x2 @ y)
            A = np.array([[n, s1, s2], [s1, s2, s3], [s2, s3, s4]])
            rhs = np.array([sy, sxy, sx2y])
            p = np.linalg.solve(A, rhs)
            return (p[0], p[1], p[2]), p[0] + p[1] * x + p[2] * x2
        if fam == 2:
            if (y <= 0).any():
                return None
            la, b = _ls2(x, np.log(y))
            a = float(np.exp(la))
            return (a, b, 0.0), a * np.exp(b * x)
        if fam == 3:
            sx = np.sqrt(x)
            a, b = _ls2(sx, y)
            return (a, b, 0.0), a + b * sx
        if fam == 4:
            if (y <= 0).any():
                return None
            lx = np.log(x + 1)
            la, b = _ls2(lx, np.log(y))
            a = float(np.exp(la))
            return (a, b, 0.0), a * np.power(x + 1, b)
    except np.linalg.LinAlgError:
        return None
    return None


def _eval(fam: int, params, x: np.ndarray) -> np.ndarray:
    a, b, c = params
    if fam == 0:
        return a + b * x
    if fam == 1:
        return a + b * x + c * x * x
    if fam == 2:
        return a * np.exp(b * x)
    if fam == 3:
        return a + b * np.sqrt(x)
    if fam == 4:
        return a * np.power(x + 1, b)
    raise ValueError(f"unknown family {fam}")


import math

#: cached per-length x tables for the scalar fast path: x = 0..n-1 is
#: segment-local, so every sum over x (and sqrt(x), log(x+1)) depends
#: only on n — computed once per length, reused across all segments
_XTAB: dict[int, tuple] = {}


def _xtab(n: int):
    t = _XTAB.get(n)
    if t is None:
        xs = list(range(n))
        sq = [math.sqrt(i) for i in xs]
        lg = [math.log(i + 1.0) for i in xs]
        t = (
            float(sum(xs)),
            float(sum(i * i for i in xs)),
            float(sum(i**3 for i in xs)),
            float(sum(i**4 for i in xs)),
            sq,
            sum(sq),
            sum(u * u for u in sq),
            lg,
            sum(lg),
            sum(g * g for g in lg),
        )
        _XTAB[n] = t
    return t


def _ls2_scalar(n, su, suu, sy, suy):
    den = n * suu - su * su
    if den == 0:
        return sy / n, 0.0
    b = (n * suy - su * sy) / den
    a = (sy - b * su) / n
    return a, b


def _fit_small(fam: int, y: list, eps: float):
    """Scalar-Python fit + bound check for short segments (the dominant
    case on noisy data: avg segment ~3 points at the driver's eps) —
    numpy per-call overhead swamps the arithmetic below ~30 points
    (CLAUDE.md performance playbook). Returns params or None."""
    n = len(y)
    s1, s2, s3, s4, sq, ssq, ssqq, lg, slg, slgg = _xtab(n)
    if fam == 0:
        sy = sum(y)
        sxy = sum(i * yi for i, yi in enumerate(y))
        a, b = _ls2_scalar(n, s1, s2, sy, sxy)
        for i, yi in enumerate(y):
            if abs(yi - (a + b * i)) > eps:
                return None
        return (a, b, 0.0)
    if fam == 1:
        sy = sum(y)
        sxy = sum(i * yi for i, yi in enumerate(y))
        sx2y = sum(i * i * yi for i, yi in enumerate(y))
        # Cramer's rule on the 3x3 normal equations
        d = (
            n * (s2 * s4 - s3 * s3)
            - s1 * (s1 * s4 - s3 * s2)
            + s2 * (s1 * s3 - s2 * s2)
        )
        if d == 0:
            return None
        a = (
            sy * (s2 * s4 - s3 * s3)
            - s1 * (sxy * s4 - s3 * sx2y)
            + s2 * (sxy * s3 - s2 * sx2y)
        ) / d
        b = (
            n * (sxy * s4 - sx2y * s3)
            - sy * (s1 * s4 - s3 * s2)
            + s2 * (s1 * sx2y - s2 * sxy)
        ) / d
        c = (
            n * (s2 * sx2y - s3 * sxy)
            - s1 * (s1 * sx2y - s2 * sxy)
            + sy * (s1 * s3 - s2 * s2)
        ) / d
        for i, yi in enumerate(y):
            if abs(yi - (a + b * i + c * i * i)) > eps:
                return None
        return (a, b, c)
    if fam == 2:
        if any(yi <= 0 for yi in y):
            return None
        ly = [math.log(yi) for yi in y]
        sly = sum(ly)
        sxly = sum(i * li for i, li in enumerate(ly))
        la, b = _ls2_scalar(n, s1, s2, sly, sxly)
        a = math.exp(la)
        # bound check with the DECODER's arithmetic (np.exp is not
        # correctly rounded and differs from math.exp in the last bits;
        # the guarantee is on what decompress reproduces)
        params = (a, b, 0.0)
        yhat = _eval(2, params, np.arange(n, dtype=np.float64))
        if np.abs(np.asarray(y) - yhat).max() > eps:
            return None
        return params
    if fam == 3:
        sy = sum(y)
        suy = sum(u * yi for u, yi in zip(sq, y))
        a, b = _ls2_scalar(n, ssq, ssqq, sy, suy)
        for u, yi in zip(sq, y):
            if abs(yi - (a + b * u)) > eps:
                return None
        return (a, b, 0.0)
    if fam == 4:
        if any(yi <= 0 for yi in y):
            return None
        ly = [math.log(yi) for yi in y]
        sly = sum(ly)
        slly = sum(g * li for g, li in zip(lg, ly))
        la, b = _ls2_scalar(n, slg, slgg, sly, slly)
        a = math.exp(la)
        # decoder evaluates a * np.power(x+1, b), which differs from
        # exp(b*log(x+1)) in the last bits — verify with _eval
        params = (a, b, 0.0)
        yhat = _eval(4, params, np.arange(n, dtype=np.float64))
        if np.abs(np.asarray(y) - yhat).max() > eps:
            return None
        return params
    return None


_SMALL = 32  # scalar fast path below this length


def _longest_feasible(v: np.ndarray, s: int, e: int, eps: float):
    """Greedy: doubling probe for the longest prefix any family fits
    within eps; returns (end_exclusive, family, params)."""
    best = (s + 1, 0, (float(v[s]), 0.0, 0.0))
    fam_order = list(range(_FAMILIES))

    def probe(length: int):
        if length == 2:
            # two points: the exact chord, always feasible
            return (s + 2, 0, (float(v[s]), float(v[s + 1] - v[s]), 0.0))
        if length <= _SMALL:
            y = v[s : s + length].tolist()
            for fam in fam_order:
                params = _fit_small(fam, y, eps)
                if params is not None:
                    if fam_order[0] != fam:
                        fam_order.remove(fam)
                        fam_order.insert(0, fam)
                    return (s + length, fam, params)
            return None
        x = np.arange(length, dtype=np.float64)
        y = v[s : s + length]
        for fam in fam_order:
            fit = _fit_eval(fam, x, y)
            if fit is None:
                continue
            params, yhat = fit
            if np.abs(y - yhat).max() <= eps:
                # try the last winning family first on the next probe
                if fam_order[0] != fam:
                    fam_order.remove(fam)
                    fam_order.insert(0, fam)
                return (s + length, fam, tuple(float(p) for p in params))
        return None

    length = 2
    last_good = None
    while True:
        hi = min(s + length, e)
        good = probe(hi - s)
        if good is None:
            break
        last_good = good
        if hi == e:
            break
        length *= 2
    if last_good is None:
        return best
    # refine between last good length and the failed doubling via bisect
    lo_len = last_good[0] - s
    hi_len = min(2 * lo_len, e - s)
    while lo_len < hi_len:
        mid = (lo_len + hi_len + 1) // 2
        good = probe(mid)
        if good is not None:
            last_good = good
            lo_len = mid
        else:
            hi_len = mid - 1
    return last_good


def _feasible_fit(v: np.ndarray, s: int, e: int, eps: float):
    """Best family fit of v[s:e] within the L∞ bound, or None."""
    x = np.arange(e - s, dtype=np.float64)
    y = v[s:e]
    for fam in range(_FAMILIES):
        fit = _fit_eval(fam, x, y)
        if fit is None:
            continue
        params, yhat = fit
        if np.abs(y - yhat).max() <= eps:
            return fam, tuple(float(p) for p in params)
    return None


def _dp_segments(v: np.ndarray, rs: int, re: int, eps: float):
    """DP-OPTIMAL segmentation of the finite run [rs, re): minimum
    number of segments such that every segment admits a family fit
    within eps — the reference's formulation
    (non_linear_approximation.zig:61-82). O(n^2) feasibility probes;
    intended for the ``segmentation='dp'`` config path (greedy stays the
    vectorized default for the 100-TB hot path)."""
    n = re - rs
    INF = n + 1
    dp = np.full(n + 1, INF, dtype=np.int64)
    dp[0] = 0
    back: list[tuple[int, int, tuple] | None] = [None] * (n + 1)
    for i in range(1, n + 1):
        best = INF
        for j in range(i - 1, -1, -1):
            if dp[j] + 1 >= best:
                continue  # cannot improve — the only (exact) prune
            fit = (
                (0, (float(v[rs + j]), 0.0, 0.0))
                if i - j == 1
                else _feasible_fit(v, rs + j, rs + i, eps)
            )
            if fit is not None:
                best = dp[j] + 1
                dp[i] = best
                back[i] = (j, fit[0], fit[1])
    segs: list[tuple[int, int, tuple]] = []
    i = n
    while i > 0:
        j, fam, params = back[i]  # type: ignore[misc]
        segs.append((rs + i, fam, params))
        i = j
    segs.reverse()
    return segs


def compress(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    cfg = config or {}
    eps = float(cfg.get("abs_error_bound", 0.0))
    if eps <= 0:
        raise ValueError("NonLinearApproximation requires abs_error_bound > 0")
    mode = str(cfg.get("segmentation", "greedy")).lower()
    if mode not in ("greedy", "dp"):
        raise ValueError("segmentation must be 'greedy' or 'dp'")
    segs: list[tuple[int, int, tuple]] = []  # (end_excl, family, params)
    for rs, re, is_finite in finite_runs(v):
        if not is_finite:
            segs.append((rs + 1, 0, (float(v[rs]), 0.0, 0.0)))
            continue
        if mode == "dp":
            segs.extend(_dp_segments(v, rs, re, eps))
            continue
        s = rs
        while s < re:
            end, fam, params = _longest_feasible(v, s, re, eps)
            segs.append((end, fam, params))
            s = end
    out = bytearray(np.uint32(len(segs)).tobytes())
    for end, fam, params in segs:
        out += np.uint8(fam).tobytes()
        out += np.uint64(end).tobytes()
        out += np.asarray(params, dtype=np.float64).tobytes()
    return bytes(out)


def decompress(payload: bytes) -> np.ndarray:
    buf = np.frombuffer(payload, dtype=np.uint8)
    n_seg = int(buf[:4].view(np.uint32)[0])
    pos = 4
    rec = 1 + 8 + 24
    chunks = []
    start = 0
    for _ in range(n_seg):
        fam = int(buf[pos])
        end = check_decode_count(buf[pos + 1 : pos + 9].view(np.uint64)[0], "segment end")
        params = tuple(buf[pos + 9 : pos + 33].view(np.float64))
        pos += rec
        x = np.arange(end - start, dtype=np.float64)
        chunks.append(_eval(fam, params, x))
        start = end
    return np.concatenate(chunks) if chunks else np.empty(0)


register(Method.NonLinearApproximation, compress, decompress)
