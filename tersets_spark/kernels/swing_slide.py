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


def _swing_segment(v: np.ndarray, anchor_i: int, anchor_v: float, e: int, eps: float):
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
    up = np.inf
    lo = -np.inf
    sxy = sxx = 0.0
    j = anchor_i + 1
    stop_py = min(anchor_i + 1 + _PY_N, e)
    while j < stop_py:
        dt = j - anchor_i
        dy = v[j] - anchor_v
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

    for s, e, is_finite in finite_runs(v):
        if not is_finite:
            emit(v[s], s)
            continue
        anchor_i, anchor_v = s, float(v[s])
        emit(anchor_v, s)  # run-opening knot is exact
        while anchor_i < e - 1:
            end, slope = _swing_segment(v, anchor_i, anchor_v, e, eps)
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
    for k in range(ki.size):
        i = ki[k]
        out[i] = kv[k]
        if k + 1 < ki.size and ki[k + 1] > i + 1:
            j = ki[k + 1]
            t = np.arange(1, j - i, dtype=np.float64)
            out[i + 1 : j] = kv[k] + (kv[k + 1] - kv[k]) * t / (j - i)
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
    for k in range(ends.size):
        s, e = starts[k], ends[k]
        if e == s:
            out[s] = sv[k]
        else:
            t = np.arange(0, e - s + 1, dtype=np.float64)
            out[s : e + 1] = sv[k] + (ev[k] - sv[k]) * t / (e - s)
    return out


def compress_swing_disconnected(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    eps = _effective_eps(float((config or {}).get("abs_error_bound", 0.0)))
    triples: list[tuple[float, float, int]] = []
    for s, e, is_finite in finite_runs(v):
        if not is_finite:
            triples.append((float(v[s]), float(v[s]), s))
            continue
        start = s
        while start < e:
            if start == e - 1:
                triples.append((float(v[start]), float(v[start]), start))
                break
            anchor_v = float(v[start])
            end, slope = _swing_segment(v, start, anchor_v, e, eps)
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


def _push_hull(hx, hy, x, y, upper: bool) -> None:
    while len(hx) >= 2:
        cr = (hx[-1] - hx[-2]) * (y - hy[-1]) - (hy[-1] - hy[-2]) * (x - hx[-1])
        if (cr >= 0) if upper else (cr <= 0):
            hx.pop()
            hy.pop()
        else:
            break
    hx.append(x)
    hy.append(y)


def _slide_segment(v: np.ndarray, s: int, e: int, eps: float, vl: list | None = None):
    """Longest segment from s admitting an L∞ fit with maxerr <= eps.
    Returns (end_inclusive, slope, intercept) with intercept at local
    x=0 (i.e. at index s).

    Incremental: the convex hulls grow point-by-point (amortized O(1)
    per point, the engine analog of the reference's hull maintenance,
    convex_hull.zig); the Chebyshev width is only evaluated at doubling
    checkpoints, then the exact first-infeasible length is bisected with
    full fits (widths are monotone in prefix length, so the stop point
    equals the reference's streaming violation point)."""
    n_max = e - s
    if n_max <= 2:
        end = e - 1
        slope, intercept, _ = cheb_fit(v[s : end + 1])
        return end, slope, intercept
    if vl is None:
        vl = v.tolist()  # plain floats: the hull loops are scalar-bound

    def build_hulls(length: int):
        ux: list[float] = []
        uy: list[float] = []
        lx: list[float] = []
        ly: list[float] = []
        for k in range(length):
            y = vl[s + k]
            _push_hull(ux, uy, float(k), y, upper=True)
            _push_hull(lx, ly, float(k), y, upper=False)
        return ux, uy, lx, ly

    ux, uy, lx, ly = [], [], [], []
    last_ok = 2  # two points always fit exactly
    check_at = 4
    infeasible_at = -1
    for k in range(n_max):
        y = vl[s + k]
        _push_hull(ux, uy, float(k), y, upper=True)
        _push_hull(lx, ly, float(k), y, upper=False)
        n = k + 1
        if n >= check_at or n == n_max:
            if n <= 2 or _hull_width_line(ux, uy, lx, ly)[0] / 2 <= eps:
                last_ok = n
                check_at = n * 2
            else:
                infeasible_at = n
                break
    if infeasible_at < 0:
        end = e - 1
        _w, slope, intercept = _hull_width_line(ux, uy, lx, ly)
        return end, slope, intercept
    # exact boundary: rebuild hulls at the last known-feasible length,
    # then step point-by-point (widths are monotone in prefix length)
    ux, uy, lx, ly = build_hulls(last_ok)
    length = last_ok
    _w, slope, intercept = _hull_width_line(ux, uy, lx, ly)
    while length < infeasible_at:
        y = vl[s + length]
        _push_hull(ux, uy, float(length), y, upper=True)
        _push_hull(lx, ly, float(length), y, upper=False)
        w, sl, b = _hull_width_line(ux, uy, lx, ly)
        if w / 2 > eps:
            break
        slope, intercept = sl, b
        length += 1
    return s + length - 1, slope, intercept


def compress_slide(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    eps = _effective_eps(float((config or {}).get("abs_error_bound", 0.0)))
    triples: list[tuple[float, float, int]] = []
    vl = v.tolist()  # once per series, shared by every segment
    for s, e, is_finite in finite_runs(v):
        if not is_finite:
            triples.append((float(v[s]), float(v[s]), s))
            continue
        start = s
        while start < e:
            end, slope, intercept = _slide_segment(v, start, e, eps, vl)
            triples.append((intercept, intercept + slope * (end - start), end))
            start = end + 1
    return _pack_triples(triples)


register(Method.SwingFilter, compress_swing, decompress_swing)
register(Method.SwingFilterDisconnected, compress_swing_disconnected, decompress_triples)
register(Method.SlideFilter, compress_slide, decompress_triples)
