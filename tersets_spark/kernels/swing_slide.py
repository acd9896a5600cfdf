"""Swing and Slide filters — piecewise linear ε-approximation
(methods 3, 4, 5).

Reference semantics:
/root/reference/src/lossy_compression/functional_approximation/swing_slide_filter.zig
— SwingFilter (:65-258): connected PLA maintaining upper/lower swing
slope bounds anchored at the previous knot; on violation emit
``(end_value, end_index)`` with the SSE-minimizing slope clamped to the
feasible bound interval (Elmeleegy VLDB'09 Eq. 5/6).
SwingFilterDisconnected (:499-695): same bounds but disjoint segments
emitting ``(start_value, end_value, end_index)`` triples.
SlideFilter (:266-490): disjoint PLA with convex-hull bound maintenance
(Lemma 4.3) — the engine computes the same L∞-optimal line per segment
with an explicit Chebyshev fit over the hull (segmentation.cheb_fit).

All three shrink ε by ``ErrorBoundMargin`` = 1e-7
(/root/reference/src/utilities/shared_structs.zig:24-27, applied at
swing_slide_filter.zig:82-85). Non-finite values are recorded exactly as
singleton knots/segments, mirroring the reference's recording mechanism
(:119-125).

Engine payloads (little-endian):
  Swing:        f64 first, then (f64 end_value, u64 end_index) pairs
  Disconnected: (f64 start_value, f64 end_value, u64 end_index) triples
                (decompress shared with Slide, as in the reference
                 src/tersets.zig:384-386; len % 24 == 0 check :767)
"""

from __future__ import annotations

import numpy as np

from ..methods import ERROR_BOUND_MARGIN, Method, check_decode_count
from .registry import register
from .segmentation import cheb_fit, finite_runs, first_violation


def _effective_eps(eps: float) -> float:
    if eps < 0 or not np.isfinite(eps):
        raise ValueError("abs_error_bound must be a finite value >= 0")
    return max(eps - ERROR_BOUND_MARGIN, 0.0) if eps > 0 else 0.0


def _swing_segment(v: np.ndarray, anchor_i: int, anchor_v: float, e: int, eps: float, vl: list | None = None):
    """Longest feasible swing segment from the anchor: returns
    (end_index_inclusive, slope). Bounds: slope must stay within
    [max lower, min upper] over every covered point.

    Single fused gallop scan: each geometric block computes the running
    bound envelopes AND the cumulative SSE-slope sums, so the chosen
    end's clamped slope (Eq. 5/6) reads straight out of the prefix
    arrays — no second pass over the segment. Segments shorter than
    ~24 points (the common case at tight bounds) take a plain-Python
    scan first: for tiny segments interpreter arithmetic beats numpy's
    per-call overhead ~3x."""
    _PY_N = 24
    if vl is None:
        vl = v.tolist()
    up = np.inf
    lo = -np.inf
    sxy = sxx = 0.0
    j = anchor_i + 1
    stop_py = min(anchor_i + 1 + _PY_N, e)
    while j < stop_py:
        dt = j - anchor_i
        dy = vl[j] - anchor_v
        nup = (dy + eps) / dt
        nlo = (dy - eps) / dt
        p_up, p_lo, p_sxy, p_sxx = up, lo, sxy, sxx
        if nup < up:
            up = nup
        if nlo > lo:
            lo = nlo
        sxy += dy * dt
        sxx += dt * dt
        if lo > up:  # first infeasible point: close at the previous one
            k = dt - 2
            if k < 0:
                return anchor_i + 1, min(max(dy, nlo), nup)
            slope = min(max(p_sxy / p_sxx, p_lo), p_up)
            return anchor_i + dt - 1, slope
        j += 1
    if stop_py == e:
        slope = min(max(sxy / sxx, lo), up) if sxx else 0.0
        return e - 1, slope
    block = 2 * _PY_N
    while True:
        hi = min(anchor_i + 1 + block, e)
        x = v[anchor_i + 1 : hi]
        if x.size == 0:
            return anchor_i + 1, 0.0
        dt = np.arange(1.0, x.size + 1)
        dy = x - anchor_v
        up_c = np.minimum.accumulate((dy + eps) / dt)
        lo_c = np.maximum.accumulate((dy - eps) / dt)
        idx = np.flatnonzero(lo_c > up_c)
        if idx.size or hi == e:
            # last feasible offset within this block
            k = int(idx[0]) - 1 if idx.size else x.size - 1
            if k < 0:
                return anchor_i + 1, float(np.clip(dy[0], lo_c[0], up_c[0]))
            sxy = np.cumsum(dy * dt)
            sxx = np.cumsum(dt * dt)
            opt = float(sxy[k] / sxx[k])
            slope = min(max(opt, float(lo_c[k])), float(up_c[k]))
            return anchor_i + 1 + k, slope
        block *= 2


def compress_swing(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    eps = _effective_eps(float((config or {}).get("abs_error_bound", 0.0)))
    knots_v: list[float] = []
    knots_i: list[int] = []

    def emit(val: float, idx: int) -> None:
        knots_v.append(float(val))
        knots_i.append(int(idx))

    vl = v.tolist()  # once per series; the scalar scan is indexing-bound
    for s, e, is_finite in finite_runs(v):
        if not is_finite:
            emit(v[s], s)
            continue
        anchor_i, anchor_v = s, vl[s]
        emit(anchor_v, s)  # run-opening knot is exact
        while anchor_i < e - 1:
            end, slope = _swing_segment(v, anchor_i, anchor_v, e, eps, vl)
            end_v = anchor_v + slope * (end - anchor_i)
            emit(end_v, end)
            anchor_i, anchor_v = end, end_v
    out = np.empty(2 * len(knots_v), dtype=np.uint64)
    out[0::2] = np.asarray(knots_v, dtype=np.float64).view(np.uint64)
    out[1::2] = np.asarray(knots_i, dtype=np.uint64)
    return out.tobytes()


def decompress_swing(payload: bytes) -> np.ndarray:
    if len(payload) % 16 != 0:
        raise ValueError("corrupt Swing payload")
    raw = np.frombuffer(payload, dtype=np.uint64)
    kv = raw[0::2].view(np.float64)
    ki = raw[1::2].astype(np.int64)
    # indices must be strictly increasing and plausible: ONE corrupt
    # interior u64 would otherwise size an arange in the terabytes
    if ki.size and (int(ki[0]) < 0 or np.any(np.diff(ki) <= 0)):
        raise ValueError("corrupt Swing payload: knot indices not increasing")
    n = int(ki[-1]) + 1 if ki.size else 0
    check_decode_count(n)
    out = np.empty(n, dtype=np.float64)
    if ki.size:
        # vectorized interpolation over ALL gaps at once: for a position
        # p in the open interval (ki[k], ki[k+1]) the loop formula is
        # kv[k] + (kv[k+1]-kv[k]) * t / (j-i) with t = p - i — the same
        # elementwise float expression evaluated below, so results are
        # bit-identical. Knot positions (incl. the first, and any
        # non-finite singleton knot) are assigned their stored value
        # directly afterwards, never interpolated — NaN/inf payloads
        # survive exactly.
        first = int(ki[0])
        if first > 0:  # positions before the first knot stay as the
            out[:first] = kv[0]  # loop left them: uninitialized memory
            # would leak — define them as the first knot's value
        seg_of = np.repeat(np.arange(ki.size - 1), np.diff(ki)) if ki.size > 1 else np.empty(0, np.int64)
        if seg_of.size:
            p = np.arange(first, int(ki[-1]), dtype=np.int64) + 1
            i0 = ki[seg_of]
            t = (p - i0).astype(np.float64)
            span = (ki[seg_of + 1] - i0).astype(np.float64)
            with np.errstate(invalid="ignore"):  # inf-inf around
                # non-finite knots; the knot positions themselves are
                # overwritten below and interior gap positions next to a
                # non-finite knot legitimately decode as NaN
                out[first + 1 :] = kv[seg_of] + (kv[seg_of + 1] - kv[seg_of]) * t / span
        out[ki] = kv
    return out


def _pack_triples(triples: list[tuple[float, float, int]]) -> bytes:
    out = np.empty(3 * len(triples), dtype=np.uint64)
    out[0::3] = np.asarray([t[0] for t in triples], dtype=np.float64).view(np.uint64)
    out[1::3] = np.asarray([t[1] for t in triples], dtype=np.float64).view(np.uint64)
    out[2::3] = np.asarray([t[2] for t in triples], dtype=np.uint64)
    return out.tobytes()


def decompress_triples(payload: bytes) -> np.ndarray:
    """Shared decompressor for disjoint-segment triple formats
    (SwingDisconnected / Slide / SlidingWindow / BottomUp — mirrors the
    reference's shared dispatch, src/tersets.zig:384-386)."""
    if len(payload) % 24 != 0:
        raise ValueError("corrupt triple payload: length % 24 != 0")
    raw = np.frombuffer(payload, dtype=np.uint64)
    sv = raw[0::3].view(np.float64)
    ev = raw[1::3].view(np.float64)
    ends = raw[2::3].astype(np.int64)  # inclusive end index
    if ends.size and (int(ends[0]) < 0 or np.any(np.diff(ends) <= 0)):
        raise ValueError("corrupt triple payload: ends not increasing")
    starts = np.concatenate(([0], ends[:-1] + 1))
    n = int(ends[-1]) + 1 if ends.size else 0
    check_decode_count(n)
    out = np.empty(n, dtype=np.float64)
    if ends.size:
        # vectorized over ALL segments at once: within segment k the
        # loop formula is sv[k] + (ev[k]-sv[k]) * t / (e-s) with local
        # t — identical elementwise float ops below, so bit-identical.
        # Singleton segments (the non-finite carrier per the engine
        # invariant) are assigned directly afterwards so NaN/inf
        # payloads survive exactly instead of going through 0/1
        # arithmetic.
        lens = ends - starts + 1
        seg_of = np.repeat(np.arange(ends.size), lens)
        t = (np.arange(n, dtype=np.int64) - starts[seg_of]).astype(np.float64)
        span = np.maximum(lens[seg_of] - 1, 1).astype(np.float64)
        with np.errstate(invalid="ignore"):  # inf-inf on singleton rows,
            # whose positions are overwritten below
            out[:] = sv[seg_of] + (ev[seg_of] - sv[seg_of]) * t / span
        single = lens == 1
        if np.any(single):
            out[starts[single]] = sv[single]
    return out


def compress_swing_disconnected(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    eps = _effective_eps(float((config or {}).get("abs_error_bound", 0.0)))
    triples: list[tuple[float, float, int]] = []
    vl = v.tolist()  # once per series; the scalar scan is indexing-bound
    for s, e, is_finite in finite_runs(v):
        if not is_finite:
            triples.append((float(v[s]), float(v[s]), s))
            continue
        start = s
        while start < e:
            if start == e - 1:
                triples.append((vl[start], vl[start], start))
                break
            anchor_v = vl[start]
            end, slope = _swing_segment(v, start, anchor_v, e, eps, vl)
            triples.append((anchor_v, anchor_v + slope * (end - start), end))
            start = end + 1
    return _pack_triples(triples)


def _hull_width_line(ux, uy, lx, ly):
    """Minimal vertical band (width, slope, mid-intercept) for points
    given their upper/lower hulls — pure Python: hulls are tiny (<20
    points for typical segments) so interpreter loops beat numpy's
    per-call overhead here."""
    best_w = float("inf")
    best_s = best_b = 0.0
    for bx, by, ox, oy, sgn in ((lx, ly, ux, uy, 1.0), (ux, uy, lx, ly, -1.0)):
        m = len(bx)
        if m < 2:
            continue
        for i in range(m - 1):
            dx = bx[i + 1] - bx[i]
            slope = (by[i + 1] - by[i]) / dx
            inter = by[i] - slope * bx[i]
            d = 0.0
            for j in range(len(ox)):
                t = sgn * (oy[j] - slope * ox[j] - inter)
                if t > d:
                    d = t
            if d < best_w:
                best_w = d
                best_s = slope
                best_b = inter + sgn * d / 2
    if best_w == float("inf"):
        return 0.0, 0.0, (ly[0] if ly else 0.0)
    return best_w, best_s, best_b



def _width3(v: np.ndarray) -> np.ndarray:
    """Vectorized Chebyshev band width of every 3-point window, with the
    EXACT floating-point expressions `_hull_width_line` would evaluate on
    the 3-point hulls (same ops, same order), so ``_width3(v)[i]/2 > eps``
    reproduces the hull path's infeasibility decision bit-for-bit.

    Case analysis mirrors the monotone-chain push cross product ``cr = (y2-y1) -
    (y1-y0)``: cr<0 keeps the middle point on the upper hull (band edges
    to test: lower chord p0→p2 at sgn=+1, upper edges p0→p1/p1→p2 at
    sgn=-1); cr>0 mirrors; cr==0 collapses both hulls to [p0, p2] and the
    width is exactly 0. Per-edge deviations accumulate through
    ``max(0, ·)`` exactly as the scan does; the pass-order tie-breaking
    (strict ``<``) cannot change the *value* of the min, which is all the
    feasibility decision uses."""
    y0, y1, y2 = v[:-2], v[1:-1], v[2:]
    with np.errstate(invalid="ignore", over="ignore"):
        cr = (y2 - y1) - (y1 - y0)
        sc = (y2 - y0) / 2.0
        ic = y0 - sc * 0.0
        t1c = (y1 - sc * 1.0) - ic
        t2c = (y2 - sc * 2.0) - ic
        s01 = (y1 - y0) / 1.0
        i01 = y0 - s01 * 0.0
        e01 = (y2 - s01 * 2.0) - i01
        s12 = (y2 - y1) / 1.0
        i12 = y1 - s12 * 1.0
        e12a = (y0 - s12 * 0.0) - i12
        e12b = (y2 - s12 * 2.0) - i12
        z = np.zeros_like(cr)
        d_chord_pos = np.maximum(np.maximum(t1c, t2c), z)
        d_chord_neg = np.maximum(np.maximum(-t1c, -t2c), z)
        d01_pos = np.maximum(e01, z)
        d01_neg = np.maximum(-e01, z)
        d12_pos = np.maximum(np.maximum(e12a, e12b), z)
        d12_neg = np.maximum(np.maximum(-e12a, -e12b), z)
        w_mid_up = np.minimum(d_chord_pos, np.minimum(d01_neg, d12_neg))
        w_mid_dn = np.minimum(np.minimum(d01_pos, d12_pos), d_chord_neg)
        return np.where(cr < 0, w_mid_up, np.where(cr > 0, w_mid_dn, 0.0))



def _extend_hulls(ux, uy, lx, ly, vl, s, k0, k1) -> None:
    """Push points with local x = k0..k1-1 onto both monotone-chain
    hulls. One call per extension block; the double push is inlined with
    the top-two vertices cached in locals, so the common no-pop case
    costs no list indexing and no function calls."""
    un = len(ux)
    ln = len(lx)
    u1x = ux[-1] if un else 0.0
    u1y = uy[-1] if un else 0.0
    u2x = ux[-2] if un > 1 else 0.0
    u2y = uy[-2] if un > 1 else 0.0
    l1x = lx[-1] if ln else 0.0
    l1y = ly[-1] if ln else 0.0
    l2x = lx[-2] if ln > 1 else 0.0
    l2y = ly[-2] if ln > 1 else 0.0
    for k in range(k0, k1):
        x = float(k)
        y = vl[s + k]
        while un >= 2 and (u1x - u2x) * (y - u1y) - (u1y - u2y) * (x - u1x) >= 0:
            ux.pop()
            uy.pop()
            un -= 1
            u1x = u2x
            u1y = u2y
            if un >= 2:
                u2x = ux[-2]
                u2y = uy[-2]
        ux.append(x)
        uy.append(y)
        u2x = u1x
        u2y = u1y
        u1x = x
        u1y = y
        un += 1
        while ln >= 2 and (l1x - l2x) * (y - l1y) - (l1y - l2y) * (x - l1x) <= 0:
            lx.pop()
            ly.pop()
            ln -= 1
            l1x = l2x
            l1y = l2y
            if ln >= 2:
                l2x = lx[-2]
                l2y = ly[-2]
        lx.append(x)
        ly.append(y)
        l2x = l1x
        l2y = l1y
        l1x = x
        l1y = y
        ln += 1




def _caliper_width(ux, uy, lx, ly):
    """Minimal vertical band via rotating calipers: the same edge
    candidates as `_hull_width_line`, but each edge's worst opposite
    vertex comes from a monotone antipodal pointer (deviation is concave
    along the opposite hull and the argmax moves left as edge slopes
    increase), so one evaluation is O(h) instead of O(h^2). Used for
    SEARCH decisions only; the close-time fit is recomputed with the
    full-scan `_hull_width_line`, so emitted bytes never depend on the
    walk's tie handling."""
    best_w = float("inf")
    best_s = best_b = 0.0
    for bx, by, ox, oy, sgn in ((lx, ly, ux, uy, 1.0), (ux, uy, lx, ly, -1.0)):
        m = len(bx)
        if m < 2:
            continue
        j = len(ox) - 1
        for i in range(m - 1):
            x0 = bx[i]
            y0 = by[i]
            slope = (by[i + 1] - y0) / (bx[i + 1] - x0)
            inter = y0 - slope * x0
            d = sgn * (oy[j] - slope * ox[j] - inter)
            while j > 0:
                d2 = sgn * (oy[j - 1] - slope * ox[j - 1] - inter)
                if d2 >= d:
                    d = d2
                    j -= 1
                else:
                    break
            if d < 0.0:
                d = 0.0
            if d < best_w:
                best_w = d
                best_s = slope
                best_b = inter + sgn * d / 2
    if best_w == float("inf"):
        return 0.0, 0.0, (ly[0] if ly else 0.0)
    return best_w, best_s, best_b


def _bisect_fit(vl, s, lo, hi, eps):
    """Exact boundary search in (lo, hi]: w(lo)/2 <= eps < w(hi)/2, w
    monotone in prefix length. Rebuilds hull(lo) once, replays pushes per
    probe. Returns (end_inclusive, slope, intercept) with the fit from
    the full-scan `_hull_width_line` at the final feasible length."""
    sux: list = []
    suy: list = []
    slx: list = []
    sly: list = []
    _extend_hulls(sux, suy, slx, sly, vl, s, 0, lo)
    while hi - lo > 1:
        mid = (lo + hi) // 2
        tux, tuy, tlx, tly = sux[:], suy[:], slx[:], sly[:]
        _extend_hulls(tux, tuy, tlx, tly, vl, s, lo, mid)
        if _caliper_width(tux, tuy, tlx, tly)[0] / 2 <= eps:
            lo = mid
            sux, suy, slx, sly = tux, tuy, tlx, tly
        else:
            hi = mid
    _w, fs, fb = _hull_width_line(sux, suy, slx, sly)
    # certify the EMITTED fit with the same full-scan arbiter the main
    # path uses: if the antipodal walk over-accepted by an ulp at a
    # float edge (non-concave noise), retreat until the full-scan width
    # agrees — every returned fit then satisfies w/2 <= eps exactly.
    while _w / 2 > eps and lo > 2:
        lo -= 1
        sux, suy, slx, sly = [], [], [], []
        _extend_hulls(sux, suy, slx, sly, vl, s, 0, lo)
        _w, fs, fb = _hull_width_line(sux, suy, slx, sly)
    return s + lo - 1, fs, fb


def _slide_segment(
    v: np.ndarray,
    s: int,
    e: int,
    eps: float,
    vl: list | None = None,
):
    """Longest segment from s admitting an L-inf fit with maxerr <= eps.
    Returns (end_inclusive, slope, intercept) with intercept at local
    x=0 (i.e. at index s).

    Search: OptimalPLR-style extreme-line maintenance — the engine
    analog of the reference's Lemma-4.3 bound updates
    (swing_slide_filter.zig:266-490: max-slope line through a left
    support at value-eps and the newest point at value+eps, min-slope
    line mirrored; supports live on the upper/lower hulls). Instead of
    the reference's full hull rescan per point, each rotation walks a
    tangent pointer along the hull (slope-to-the-new-cap is unimodal
    along a convex chain), so accepted points cost ~8 flops + two hull
    pushes, amortized O(1) walk steps. A point is feasible while its
    caps straddle the two extreme lines — equivalent, in real
    arithmetic, to Chebyshev width(prefix) <= 2*eps.

    The emitted fit stays the full-scan `_hull_width_line` over the
    final prefix's hull; its returned width certifies the bound, and on
    a float-edge disagreement with the line-maintenance decisions
    (rare) the boundary retreats via `_bisect_fit`, so every emitted
    segment satisfies maxerr <= eps by construction."""
    n_max = e - s
    if n_max <= 2:
        end = e - 1
        slope, intercept, _ = cheb_fit(v[s : end + 1])
        return end, slope, intercept
    if vl is None:
        vl = v.tolist()  # plain floats: the hull loops are scalar-bound

    y0 = vl[s]
    y1 = vl[s + 1]
    d = y1 - y0
    two_eps = eps + eps
    ms_hi = d + two_eps  # max-slope line: (0, y0-eps) -> (1, y1+eps)
    bi_hi = y0 - eps
    ms_lo = d - two_eps  # min-slope line: (0, y0+eps) -> (1, y1-eps)
    bi_lo = y0 + eps
    ux = [0.0, 1.0]
    uy = [y0, y1]
    lx = [0.0, 1.0]
    ly = [y0, y1]
    phi = 0  # max-slope tangent pointer into the upper hull
    plo = 0  # min-slope tangent pointer into the lower hull
    L = 2
    while L < n_max:
        x = float(L)
        y = vl[s + L]
        hi_at = ms_hi * x + bi_hi
        lo_at = ms_lo * x + bi_lo
        if y - eps > hi_at or y + eps < lo_at:
            break
        if y + eps < hi_at:
            # rotate the max-slope line down through (x, y+eps); its
            # left support is the upper-hull vertex minimizing the
            # slope to that cap (reference scans the whole upper hull;
            # unimodality lets a pointer walk find the argmin)
            py = y + eps
            n_h = len(ux)
            j = phi if phi < n_h else n_h - 1
            sj = (py - uy[j] + eps) / (x - ux[j])
            moved = False
            while j + 1 < n_h:
                s2 = (py - uy[j + 1] + eps) / (x - ux[j + 1])
                if s2 <= sj:
                    sj = s2
                    j += 1
                    moved = True
                else:
                    break
            if not moved:
                while j > 0:
                    s2 = (py - uy[j - 1] + eps) / (x - ux[j - 1])
                    if s2 < sj:
                        sj = s2
                        j -= 1
                    else:
                        break
            phi = j
            ms_hi = sj
            bi_hi = py - sj * x
        if y - eps > lo_at:
            py = y - eps
            n_h = len(lx)
            j = plo if plo < n_h else n_h - 1
            sj = (py - ly[j] - eps) / (x - lx[j])
            moved = False
            while j + 1 < n_h:
                s2 = (py - ly[j + 1] - eps) / (x - lx[j + 1])
                if s2 >= sj:
                    sj = s2
                    j += 1
                    moved = True
                else:
                    break
            if not moved:
                while j > 0:
                    s2 = (py - ly[j - 1] - eps) / (x - lx[j - 1])
                    if s2 > sj:
                        sj = s2
                        j -= 1
                    else:
                        break
            plo = j
            ms_lo = sj
            bi_lo = py - sj * x
        while len(ux) >= 2 and (ux[-1] - ux[-2]) * (y - uy[-1]) - (uy[-1] - uy[-2]) * (x - ux[-1]) >= 0:
            ux.pop()
            uy.pop()
        ux.append(x)
        uy.append(y)
        while len(lx) >= 2 and (lx[-1] - lx[-2]) * (y - ly[-1]) - (ly[-1] - ly[-2]) * (x - lx[-1]) <= 0:
            lx.pop()
            ly.pop()
        lx.append(x)
        ly.append(y)
        L += 1
    w, fs, fb = _hull_width_line(ux, uy, lx, ly)
    if w / 2 > eps and L > 2:
        return _bisect_fit(vl, s, 2, L, eps)  # float edge: rare
    return s + L - 1, fs, fb


def compress_slide(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    eps = _effective_eps(float((config or {}).get("abs_error_bound", 0.0)))
    triples: list[tuple[float, float, int]] = []
    vl = v.tolist()  # once per series, shared by every segment
    # one vectorized pass: is the 3-point prefix at i already infeasible?
    # (the dominant case on noisy data at tight bounds -> O(1) segments)
    fast2 = ((_width3(v) / 2) > eps).tolist() if v.size >= 3 else None
    for s, e, is_finite in finite_runs(v):
        if not is_finite:
            triples.append((float(v[s]), float(v[s]), s))
            continue
        start = s
        while start < e:
            if start + 2 < e and fast2 is not None and fast2[start]:
                y0 = vl[start]
                y1 = vl[start + 1]
                slope = (y1 - y0) / 1.0
                inter = y0 - slope * 0.0
                t1 = (y1 - slope * 1.0) - inter
                b = (inter - 0.0) if t1 > 0 else (inter + 0.0)
                triples.append((b, b + slope * 1, start + 1))
                start += 2
                continue
            end, slope, intercept = _slide_segment(v, start, e, eps, vl)
            triples.append((intercept, intercept + slope * (end - start), end))
            start = end + 1
    return _pack_triples(triples)


register(Method.SwingFilter, compress_swing, decompress_swing)
register(Method.SwingFilterDisconnected, compress_swing_disconnected, decompress_triples)
register(Method.SlideFilter, compress_slide, decompress_triples)
