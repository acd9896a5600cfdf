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

Fast path: short-segment regimes (noisy/token data — 3-10x) probe
against vectorized per-(L, family) feasibility masks (`_feas_masks`,
L <= _K_FAST) whose sums replicate `_fit_small`'s scalar summation
order bit-for-bit and whose residual checks use the decoder's numpy
arithmetic; a 4-segment scalar warm-up decides per series whether the
mask build pays for itself (long-segment series skip it entirely).
The only decision divergence from the scalar path is np.log vs
math.log in the exp/power fits (last-bit; both sides emit only
self-checked bound-satisfying params).

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
            if not math.isfinite(a):  # inf*0 → NaN check-pass (r5 ADVICE)
                return None
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
            if not math.isfinite(a):  # see fam-2 note
                return None
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
        # math.exp raises OverflowError past ~709 (np.exp returns inf),
        # and an inf coefficient can turn the residual check into a
        # NaN comparison (inf*0) that silently passes — reject the
        # window outright instead (r5 ADVICE)
        if la >= 709.0:
            return None
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
        if la >= 709.0:  # see fam-2 note (r5 ADVICE)
            return None
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

_K_FAST = 8  # mask fast path covers segments up to this length

#: families whose log-domain fit needs y > 0
_LOG_FAMS = (2, 4)


def _feas_masks(v: np.ndarray, eps: float):
    """Vectorized short-window feasibility: for every start position i
    and L = 3.._K_FAST, whether each of the five family fits of
    v[i:i+L] stays within the L∞ bound — plus the fitted params, so the
    greedy scan emits without re-fitting. Sums accumulate in the same
    j-ascending order as `_fit_small`'s scalar loops and the residual
    checks use the DECODER's numpy arithmetic, so the masks are
    self-consistent: a feasible (L, fam, i) always decodes within eps.
    Returns {L: (feas_bool[5][m], params_f64[5][3][m])}."""
    n = v.size
    finite = np.isfinite(v)
    vz = v if finite.all() else np.where(finite, v, 0.0)
    pos = finite & (vz > 0)
    with np.errstate(all="ignore"):
        lyz = np.where(pos, np.log(np.where(pos, vz, 1.0)), 0.0)
    out = {}
    # running window sums, extended incrementally L-1 -> L: appending
    # element j = L-1 to the accumulation preserves _fit_small's
    # j-ascending summation order bit-for-bit (the L-1 prefix IS the
    # first L-1 terms of the L sum), so no per-L rebuild is needed.
    acc = None
    for L in range(3, _K_FAST + 1):
        if n < L:
            break
        m = n - L + 1
        s1, s2, s3, s4, sq, ssq, ssqq, lg, slg, slgg = _xtab(L)
        if acc is None:
            sy = np.zeros(n)
            sxy = np.zeros(n)
            sx2y = np.zeros(n)
            sly = np.zeros(n)
            sxly = np.zeros(n)
            ssqy = np.zeros(n)
            slgly = np.zeros(n)
            okfin = np.ones(n, dtype=bool)
            okpos = np.ones(n, dtype=bool)
            start_j = 0
        else:
            sy, sxy, sx2y, sly, sxly, ssqy, slgly, okfin, okpos = acc
            start_j = L - 1
        for j in range(start_j, L):
            w = n - j  # windows long enough to contain element j
            yj = vz[j:]
            lj = lyz[j:]
            sy = sy[:w] + yj
            sxy = sxy[:w] + j * yj
            sx2y = sx2y[:w] + (j * j) * yj
            sly = sly[:w] + lj
            sxly = sxly[:w] + j * lj
            ssqy = ssqy[:w] + sq[j] * yj
            slgly = slgly[:w] + lg[j] * lj
            okfin = okfin[:w] & finite[j:]
            okpos = okpos[:w] & pos[j:]
        acc = (sy, sxy, sx2y, sly, sxly, ssqy, slgly, okfin, okpos)
        sy = sy[:m]
        sxy = sxy[:m]
        sx2y = sx2y[:m]
        sly = sly[:m]
        sxly = sxly[:m]
        ssqy = ssqy[:m]
        slgly = slgly[:m]
        okfin = okfin[:m]
        okpos = okpos[:m]
        nL = L
        feas = []
        params = []
        with np.errstate(all="ignore"):
            # fam 0: linear (replicates _ls2_scalar)
            den = nL * s2 - s1 * s1
            b0 = (nL * sxy - s1 * sy) / den
            a0 = (sy - b0 * s1) / nL
            bad = np.zeros(m, dtype=bool)
            for j in range(L):
                bad |= np.abs(vz[j : j + m] - (a0 + b0 * j)) > eps
                if bad.all():
                    break
            feas.append(okfin & ~bad)
            params.append((a0, b0, np.zeros(m)))
            # fam 1: quadratic (replicates the Cramer expressions)
            d = (
                nL * (s2 * s4 - s3 * s3)
                - s1 * (s1 * s4 - s3 * s2)
                + s2 * (s1 * s3 - s2 * s2)
            )
            a1 = (
                sy * (s2 * s4 - s3 * s3)
                - s1 * (sxy * s4 - s3 * sx2y)
                + s2 * (sxy * s3 - s2 * sx2y)
            ) / d
            b1 = (
                nL * (sxy * s4 - sx2y * s3)
                - sy * (s1 * s4 - s3 * s2)
                + s2 * (s1 * sx2y - s2 * sxy)
            ) / d
            c1 = (
                nL * (s2 * sx2y - s3 * sxy)
                - s1 * (s1 * sx2y - s2 * sxy)
                + sy * (s1 * s3 - s2 * s2)
            ) / d
            bad = np.zeros(m, dtype=bool)
            for j in range(L):
                bad |= np.abs(vz[j : j + m] - (a1 + b1 * j + (c1 * j) * j)) > eps
                if bad.all():
                    break
            feas.append(okfin & ~bad & (d != 0))
            params.append((a1, b1, c1))
            # fam 2: exponential (decoder arithmetic: a * np.exp(b*x))
            b2 = (nL * sxly - s1 * sly) / den
            la2 = (sly - b2 * s1) / nL
            a2 = np.exp(la2)
            any_pos = bool(okpos.any())
            bad = np.zeros(m, dtype=bool)
            if any_pos:
                for j in range(L):
                    bad |= np.abs(vz[j : j + m] - a2 * np.exp(b2 * j)) > eps
            feas.append(okpos & ~bad)
            params.append((a2, b2, np.zeros(m)))
            # fam 3: sqrt
            den3 = nL * ssqq - ssq * ssq
            b3 = (nL * ssqy - ssq * sy) / den3
            a3 = (sy - b3 * ssq) / nL
            bad = np.zeros(m, dtype=bool)
            for j in range(L):
                bad |= np.abs(vz[j : j + m] - (a3 + b3 * sq[j])) > eps
                if bad.all():
                    break
            feas.append(okfin & ~bad)
            params.append((a3, b3, np.zeros(m)))
            # fam 4: power (decoder arithmetic: a * np.power(x+1, b))
            den4 = nL * slgg - slg * slg
            b4 = (nL * slgly - slg * sly) / den4
            la4 = (sly - b4 * slg) / nL
            a4 = np.exp(la4)
            bad = np.zeros(m, dtype=bool)
            if any_pos:
                for j in range(L):
                    bad |= np.abs(vz[j : j + m] - a4 * np.power(float(j + 1), b4)) > eps
            feas.append(okpos & ~bad)
            params.append((a4, b4, np.zeros(m)))
        # feasibility as plain-Python lists: the probe loop does ~20
        # scalar mask lookups per segment and list indexing is ~10x
        # cheaper than numpy scalars. Params stay numpy — they are read
        # once per segment, and 90 tolist passes cost more than they
        # save (measured).
        any_f = feas[0] | feas[1] | feas[2] | feas[3] | feas[4]
        out[L] = ([f.tolist() for f in feas], params, any_f.tolist())
    return out


def _fast_longest(vl: list, s: int, e: int, masks) -> tuple | None:
    """Mask-driven replica of `_longest_feasible`'s doubling + bisect
    probe sequence (including the MRU family rotation) for segments the
    _K_FAST masks cover; returns (end_exclusive, family, params) or
    None when a probe exceeds the mask horizon (long segment — caller
    falls back to the scalar search)."""
    fam_order = [0, 1, 2, 3, 4]

    def probe(L: int):
        if L == 2:
            return (s + 2, 0, (vl[s], vl[s + 1] - vl[s], 0.0))
        if L > _K_FAST:
            return "far"
        row = masks.get(L)
        if row is None:
            return "far"
        feas, params, any_f = row
        if not any_f[s]:
            return None
        for fam in fam_order:
            if feas[fam][s]:
                if fam_order[0] != fam:
                    fam_order.remove(fam)
                    fam_order.insert(0, fam)
                pa, pb, pc = params[fam]
                return (s + L, fam, (float(pa[s]), float(pb[s]), float(pc[s])))
        return None

    length = 2
    last_good = None
    while True:
        hi = min(s + length, e)
        good = probe(hi - s)
        if good == "far":
            return None
        if good is None:
            break
        last_good = good
        if hi == e:
            break
        length *= 2
    if last_good is None:
        return (s + 1, 0, (vl[s], 0.0, 0.0))
    lo_len = last_good[0] - s
    hi_len = min(2 * lo_len, e - s)
    while lo_len < hi_len:
        mid = (lo_len + hi_len + 1) // 2
        good = probe(mid)
        if good == "far":
            return None
        if good is not None:
            last_good = good
            lo_len = mid
        else:
            hi_len = mid - 1
    return last_good


class _RunSums:
    """Per-run prefix context for the long-segment gallop: O(1)
    normal-equation sums for the linear/quadratic/exponential fits over
    ANY window (binomial re-expansion of segment-local x in run-local
    prefix sums), plus the decoder-arithmetic arrays for the exact L∞
    verification slice. Built once per finite run; pays for itself as
    soon as segments average more than a few dozen points."""

    def __init__(self, v: np.ndarray, rs: int, re: int):
        y = np.ascontiguousarray(v[rs:re], dtype=np.float64)
        n = y.size
        t = np.arange(n, dtype=np.float64)
        self.y = y
        self.yl = y.tolist()  # scalar residual loops (short windows)
        self.t = t

        def cum(a):
            return np.concatenate(([0.0], np.cumsum(a)))

        # numpy prefixes for the vectorized lazy-mask builds, list
        # mirrors for the scalar O(1) per-probe lookups
        self.cy_np = cum(y)
        self.cty_np = cum(t * y)
        self.ct2y_np = cum(t * t * y)
        self.cy = self.cy_np.tolist()
        self.cy2 = cum(y * y).tolist()
        self.cty = self.cty_np.tolist()
        self.ct2y = self.ct2y_np.tolist()
        pos = y > 0
        self.cpos_np = np.concatenate(([0], np.cumsum(pos.astype(np.int64))))
        self.cpos = self.cpos_np.tolist()
        with np.errstate(all="ignore"):
            ly = np.where(pos, np.log(np.where(pos, y, 1.0)), 0.0)
        self.ly_np = ly
        self.cly_np = cum(ly)
        self.ctly_np = cum(t * ly)
        self.cly = self.cly_np.tolist()
        self.ctly = self.ctly_np.tolist()
        # transformed-X tables for the sqrt/power boundary probes
        # (r4 verdict #8): x is segment-LOCAL, so sqrt(x)/log(x+1) and
        # their self-sums depend only on the window LENGTH — one
        # transcendental pass per run turns every probe's u-side sums
        # into O(1) lookups and the cross term into one BLAS dot
        self.sx = np.sqrt(t)
        self.csx = cum(self.sx).tolist()
        self.csx2 = cum(self.sx * self.sx).tolist()
        self.xp1 = t + 1.0
        self.lx = np.log(self.xp1)  # same op as _fit_eval's log(x+1)
        self.clx = cum(self.lx).tolist()
        self.clx2 = cum(self.lx * self.lx).tolist()
        # absolute uncertainty of a prefix-difference SSE over this run:
        # sequential-summation worst case is O(n * ulp(sum of |terms|))
        # ~= n^2 * max(y^2) * 2^-53; the 2^-50 constant is an 8x cushion.
        # Added to the SSE filter threshold so cancellation error can
        # never spuriously REJECT a feasible probe (large-offset series
        # with small eps — r4 ADVICE); a false accept only costs the
        # exact check that follows, so generosity is safe.
        maxy2 = float(np.max(y * y)) if n else 0.0
        self.sse_err = (float(n) * n) * maxy2 * 2.0**-50


def _prefix_longest(rsu: _RunSums, s: int, e: int, eps: float, fam_order: list):
    """Greedy longest-feasible over run-local [s, e) via `_RunSums`:
    same doubling+bisect shape as `_longest_feasible`, but each probe's
    linear/quadratic/exponential fit costs O(1) (prefix sums + closed
    -form Σx^k) and a one-sided SSE filter (L∞ >= RMSE) rejects
    hopeless probes without touching the window. Emitted fits are
    verified with the DECODER's numpy arithmetic before acceptance, so
    the bound guarantee is self-checked exactly like the scalar path
    (fit rounding may differ — both paths only emit checked fits).
    Returns (end_exclusive, family, params) in run-local coordinates."""
    y = rsu.y
    yl = rsu.yl
    t = rsu.t
    cy, cy2, cty, ct2y = rsu.cy, rsu.cy2, rsu.cty, rsu.ct2y
    cpos, cly, ctly = rsu.cpos, rsu.cly, rsu.ctly
    filt2 = (eps * 1.05) ** 2  # relative SSE slack, plus rsu.sse_err as
    # the ABSOLUTE term: prefix-sum cancellation must not reject a
    # genuinely feasible boundary probe even when the cancellation
    # uncertainty exceeds 5% of eps^2 (large offsets, small eps)
    sse_err = rsu.sse_err

    def check(yw, yhat, L):
        """Exact L∞ check with a tail-first early-out: doubling probes
        grow at the tail, so a violation is most likely in the newest
        points — a subsample max > eps implies the full max > eps
        (EXACT early rejection, not a heuristic)."""
        if L > 48:
            if np.abs(yw[-16:] - yhat[-16:]).max() > eps:
                return False
        return np.abs(yw - yhat).max() <= eps

    def probe(L: int, fams):
        if L == 2:
            return (s + 2, 0, (float(y[s]), float(y[s + 1] - y[s]), 0.0))
        w = s + L
        Sy = cy[w] - cy[s]
        Sty = cty[w] - cty[s]
        Sxy = Sty - s * Sy
        s1 = L * (L - 1) // 2
        s2 = (L - 1) * L * (2 * L - 1) // 6
        xw = t[:L]
        yw = y[s:w]
        for fam in fams:
            params = None
            yhat = None
            if fam == 0:
                a, b = _ls2_scalar(L, s1, s2, Sy, Sxy)
                Sy2 = cy2[w] - cy2[s]
                sse = (
                    Sy2 - 2 * a * Sy - 2 * b * Sxy
                    + a * a * L + 2 * a * b * s1 + b * b * s2
                )
                if sse > filt2 * L + sse_err:
                    continue
                if L <= 64:
                    # scalar reversed check: same IEEE ops as the
                    # decoder's a + b*x, early exit at the tail where
                    # doubling probes violate first (manual abs: the
                    # builtin call was ~30% of the per-point cost)
                    ok = True
                    neps = -eps
                    for i in range(L - 1, -1, -1):
                        r = yl[s + i] - (a + b * i)
                        if r > eps or r < neps:
                            ok = False
                            break
                    if not ok:
                        continue
                    if fam_order[0] != 0:
                        fam_order.remove(0)
                        fam_order.insert(0, 0)
                    return (s + L, 0, (a, b, 0.0))
                params = (a, b, 0.0)
                yhat = a + b * xw
            elif fam == 1:
                Sx2y = (ct2y[w] - ct2y[s]) - 2 * s * Sty + (s * s) * Sy
                s3 = s1 * s1
                s4 = (L - 1) * L * (2 * L - 1) * (3 * L * L - 3 * L - 1) // 30
                d = (
                    L * (s2 * s4 - s3 * s3)
                    - s1 * (s1 * s4 - s3 * s2)
                    + s2 * (s1 * s3 - s2 * s2)
                )
                if d == 0:
                    continue
                a = (
                    Sy * (s2 * s4 - s3 * s3)
                    - s1 * (Sxy * s4 - s3 * Sx2y)
                    + s2 * (Sxy * s3 - s2 * Sx2y)
                ) / d
                b = (
                    L * (Sxy * s4 - Sx2y * s3)
                    - Sy * (s1 * s4 - s3 * s2)
                    + s2 * (s1 * Sx2y - s2 * Sxy)
                ) / d
                c = (
                    L * (s2 * Sx2y - s3 * Sxy)
                    - s1 * (s1 * Sx2y - s2 * Sxy)
                    + Sy * (s1 * s3 - s2 * s2)
                ) / d
                Sy2 = cy2[w] - cy2[s]
                sse = (
                    Sy2
                    - 2 * (a * Sy + b * Sxy + c * Sx2y)
                    + a * a * L + b * b * s2 + c * c * s4
                    + 2 * (a * b * s1 + a * c * s2 + b * c * s3)
                )
                if sse > filt2 * L + sse_err:
                    continue
                if L <= 64:
                    ok = True
                    neps = -eps
                    for i in range(L - 1, -1, -1):
                        r = yl[s + i] - (a + b * i + c * i * i)
                        if r > eps or r < neps:
                            ok = False
                            break
                    if not ok:
                        continue
                    if fam_order[0] != 1:
                        fam_order.remove(1)
                        fam_order.insert(0, 1)
                    return (s + L, 1, (a, b, c))
                params = (a, b, c)
                yhat = a + b * xw + c * xw * xw
            elif fam == 2:
                if cpos[w] - cpos[s] != L:
                    continue
                Sly = cly[w] - cly[s]
                Sxly = (ctly[w] - ctly[s]) - s * Sly
                la, b = _ls2_scalar(L, s1, s2, Sly, Sxly)
                if la >= 709.0:  # overflow → reject window (r5 ADVICE)
                    continue
                a = math.exp(la)
                params = (a, b, 0.0)
                yhat = a * np.exp(b * xw)
            elif fam == 3:
                # u-side sums from the per-run sqrt tables (O(1)); the
                # cross term is the only O(L) piece (one BLAS dot)
                sxv = rsu.sx[:L]
                a, b = _ls2_scalar(
                    L, rsu.csx[L], rsu.csx2[L], Sy, float(sxv @ yw)
                )
                params = (a, b, 0.0)
                yhat = a + b * sxv
            elif fam == 4:
                if cpos[w] - cpos[s] != L:
                    continue
                lxv = rsu.lx[:L]
                la, b = _ls2_scalar(
                    L, rsu.clx[L], rsu.clx2[L], cly[w] - cly[s],
                    float(lxv @ rsu.ly_np[s:w]),
                )
                if la >= 709.0:  # overflow → reject window (r5 ADVICE)
                    continue
                a = math.exp(la)
                params = (a, b, 0.0)
                # decoder arithmetic for the check, as everywhere
                yhat = a * np.power(rsu.xp1[:L], b)
            else:
                fit = _fit_eval(fam, xw, yw)
                if fit is None:
                    continue
                params, yhat = fit
                params = tuple(float(p) for p in params)
            if check(yw, yhat, L):
                if fam_order[0] != fam:
                    fam_order.remove(fam)
                    fam_order.insert(0, fam)
                return (s + L, fam, params)
        return None

    def gallop(fams, start_len, seed_good):
        length = start_len
        last_good = seed_good
        while True:
            hi = min(s + length, e)
            good = probe(hi - s, fams)
            if good is None:
                break
            last_good = good
            if hi == e:
                break
            length *= 2
        if last_good is None:
            return None
        lo_len = last_good[0] - s
        hi_len = min(2 * lo_len, e - s)
        while lo_len < hi_len:
            mid = (lo_len + hi_len + 1) // 2
            good = probe(mid, fams)
            if good is not None:
                last_good = good
                lo_len = mid
            else:
                hi_len = mid - 1
        return last_good

    # phase 1: gallop over the O(1)-fit families only (sqrt/power fits
    # are O(L) per probe and on most data never win — probing them on
    # every failed doubling/bisect step was the dominant cost)
    pfx = [f for f in fam_order if f in (0, 1)]
    slow = [f for f in fam_order if f not in (0, 1)]
    if fam_order[0] in (3, 4):
        # a slow family is the current winner (sqrt/power-shaped run):
        # give it full probing rights from the start
        res = gallop(fam_order[:], 2, None)
        return res if res is not None else (s + 1, 0, (float(y[s]), 0.0, 0.0))
    res = gallop(pfx, 2, None)
    if res is None:
        res = (s + 1, 0, (float(y[s]), 0.0, 0.0))
    # phase 2: can sqrt/power extend past the prefix-family boundary?
    # one O(L) attempt at boundary+1; on success they take over the
    # gallop (and move to the front for the following segments)
    ext_len = res[0] - s + 1
    if slow and s + ext_len <= e and ext_len > 2:
        got = probe(ext_len, slow)
        if got is not None:
            res2 = gallop(fam_order[:], ext_len * 2, got)
            if res2 is not None:
                res = res2
    return res


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
    # mask fast path warm-up: the first few segments run the scalar
    # search; if they come out short (noisy data — the regime where the
    # per-probe scalar fits dominate), the per-(L, fam) masks are built
    # once for the whole series. Long-segment series never pay the
    # mask build. None = undecided, {} = disabled, dict = enabled.
    masks: dict | None = None
    vl: list = []
    probe_lens: list[int] = []
    for rs, re, is_finite in finite_runs(v):
        if not is_finite:
            segs.append((rs + 1, 0, (float(v[rs]), 0.0, 0.0)))
            continue
        if mode == "dp":
            segs.extend(_dp_segments(v, rs, re, eps))
            continue
        s = rs
        rsu: _RunSums | None = None
        fam_order: list[int] = list(range(_FAMILIES))

        def gallop(s_: int) -> tuple[int, int, tuple]:
            # long runs take the O(1)-fit prefix gallop; short runs
            # keep the scalar/numpy per-probe path (the _RunSums build
            # doesn't amortize below a few dozen points)
            nonlocal rsu
            if re - rs >= 64:
                if rsu is None:
                    rsu = _RunSums(v, rs, re)
                end_l, fam, params = _prefix_longest(
                    rsu, s_ - rs, re - rs, eps, fam_order
                )
                return rs + end_l, fam, params
            return _longest_feasible(v, s_, re, eps)

        while s < re:
            if masks is None and v.size >= 64:
                end, fam, params = gallop(s)
                probe_lens.append(end - s)
                if len(probe_lens) >= 4:
                    short = sum(probe_lens) / len(probe_lens) <= _K_FAST
                    masks = _feas_masks(v, eps) if short else {}
                    if short:
                        vl = v.tolist()
                segs.append((end, fam, params))
                s = end
                continue
            res = _fast_longest(vl, s, re, masks) if masks else None
            if res is None:
                res = gallop(s)
            end, fam, params = res
            segs.append((end, fam, params))
            s = end
    rec = np.zeros(
        len(segs),
        dtype=np.dtype([("fam", "u1"), ("end", "<u8"), ("p", "<f8", (3,))], align=False),
    )
    if segs:
        rec["fam"] = np.fromiter((f for _, f, _ in segs), dtype=np.uint8, count=len(segs))
        rec["end"] = np.fromiter((e for e, _, _ in segs), dtype=np.uint64, count=len(segs))
        rec["p"] = np.asarray([p for _, _, p in segs], dtype=np.float64)
    return np.uint32(len(segs)).tobytes() + rec.tobytes()


_REC = np.dtype([("fam", "u1"), ("end", "<u8"), ("p", "<f8", (3,))], align=False)


def decompress(payload: bytes) -> np.ndarray:
    buf = np.frombuffer(payload, dtype=np.uint8)
    n_seg = int(buf[:4].view(np.uint32)[0])
    if len(payload) < 4 + n_seg * _REC.itemsize:
        raise ValueError("corrupt NeaTS payload: truncated")
    segs = np.frombuffer(payload, dtype=_REC, count=n_seg, offset=4)
    if n_seg == 0:
        return np.empty(0)
    # validate before casting: a corrupt u64 end would otherwise wrap
    check_decode_count(segs["end"].max(), "segment end")
    fams = segs["fam"]
    if (fams >= _FAMILIES).any():
        raise ValueError(f"unknown family {int(fams[fams >= _FAMILIES][0])}")
    ends = segs["end"].astype(np.int64)
    starts = np.concatenate(([0], ends[:-1]))
    lens = np.maximum(ends - starts, 0)  # mirrors the scalar loop's
    # empty-arange behavior on non-monotone (corrupt) ends
    n = int(lens.sum())
    seg_of = np.repeat(np.arange(n_seg), lens)
    offs = np.repeat(np.cumsum(lens) - lens, lens)
    x = (np.arange(n, dtype=np.int64) - offs).astype(np.float64)
    p = segs["p"]
    a = p[seg_of, 0]
    b = p[seg_of, 1]
    c = p[seg_of, 2]
    fam_g = fams[seg_of]
    out = np.empty(n, dtype=np.float64)
    # vectorized per family — identical elementwise expressions to
    # `_eval`, so results are bit-identical to the per-segment loop
    for fam in range(_FAMILIES):
        msel = fam_g == fam
        if not msel.any():
            continue
        xa, aa, ba = x[msel], a[msel], b[msel]
        if fam == 0:
            out[msel] = aa + ba * xa
        elif fam == 1:
            out[msel] = aa + ba * xa + c[msel] * xa * xa
        elif fam == 2:
            out[msel] = aa * np.exp(ba * xa)
        elif fam == 3:
            out[msel] = aa + ba * np.sqrt(xa)
        else:
            out[msel] = aa * np.power(xa + 1, ba)
    return out


register(Method.NonLinearApproximation, compress, decompress)
