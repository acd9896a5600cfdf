"""Shared machinery for greedy error-bounded segmentation kernels.

The reference's ε-filters (PMC, Swing, Slide, Sim-Piece, Mix-Piece,
SlidingWindow) are all one-pass streaming loops in Zig. The engine
replaces the per-point loop with *galloping first-violation search*: from
a segment start, test geometrically growing blocks with one vectorized
cumulative scan each, so total numpy work stays O(segment length) and the
Python-level loop runs once per emitted segment, not once per point.

Also hosts the Chebyshev (minimax / L∞) line fit used by Slide, ABC and
PWLH — the engine analog of the reference's convex-hull bound
maintenance (/root/reference/src/utilities/convex_hull.zig).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "first_violation",
    "finite_runs",
    "cheb_fit",
    "upper_hull",
    "lower_hull",
]

_INIT_BLOCK = 64


def first_violation(n: int, start: int, scan) -> int:
    """Return the absolute index of the first "violating" position in
    ``[start, n)`` or ``n`` if none.

    ``scan(end)`` must examine positions ``[start, end)`` with a fresh
    cumulative pass and return the first violating absolute index, or -1.
    Blocks grow geometrically, so the recomputation from ``start`` each
    round costs at most 2x the final segment length.
    """
    block = _INIT_BLOCK
    while True:
        end = min(start + block, n)
        hit = scan(end)
        if hit >= 0:
            return hit
        if end == n:
            return n
        block *= 2


def finite_runs(v: np.ndarray):
    """Split 0..n-1 into maximal runs of finite values and singleton
    non-finite positions: yields (start, end_exclusive, is_finite).

    The reference's Swing/Slide record NaN/±Inf exactly via a dedicated
    recording mechanism (swing_slide_filter.zig:119-125); the engine's
    equivalent is emitting each non-finite point as its own exact
    segment.
    """
    n = v.size
    finite = np.isfinite(v)
    i = 0
    while i < n:
        if not finite[i]:
            yield i, i + 1, False
            i += 1
            continue
        j = i
        nxt = np.flatnonzero(~finite[i:])
        j = i + int(nxt[0]) if nxt.size else n
        yield i, j, True
        i = j


def _hull(x: np.ndarray, y: np.ndarray, sign: float) -> list[int]:
    """Monotone-chain half hull (indices into x/y). sign=+1 -> upper,
    sign=-1 -> lower."""
    pts: list[int] = []
    for k in range(x.size):
        while len(pts) >= 2:
            i, j = pts[-2], pts[-1]
            # cross product of (j-i) x (k-j); pop while not turning the
            # right way for this hull side
            cr = (x[j] - x[i]) * (y[k] - y[j]) - (y[j] - y[i]) * (x[k] - x[j])
            if sign * cr >= 0:
                pts.pop()
            else:
                break
        pts.append(k)
    return pts


def upper_hull(x: np.ndarray, y: np.ndarray) -> list[int]:
    return _hull(x, y, 1.0)


def lower_hull(x: np.ndarray, y: np.ndarray) -> list[int]:
    return _hull(x, y, -1.0)


def cheb_fit(y: np.ndarray, x: np.ndarray | None = None) -> tuple[float, float, float]:
    """Minimax (L∞-optimal) line fit: returns (slope, intercept, maxerr)
    with intercept at x=0.

    The optimal band containing all points has one side flush with a
    convex-hull edge; we test every edge of both hulls against the
    opposite hull's vertices (O(h^2) numpy broadcast — hulls are small).
    Mirrors the geometry of the reference's Slide filter / ABC search
    (swing_slide_filter.zig:266-490, abc_linear_approximation.zig:55-).
    """
    n = y.size
    if x is None:
        x = np.arange(n, dtype=np.float64)
    if n == 1:
        return 0.0, float(y[0]), 0.0
    if n == 2:
        s = float((y[1] - y[0]) / (x[1] - x[0]))
        return s, float(y[0] - s * x[0]), 0.0
    uh = np.asarray(upper_hull(x, y), dtype=np.int64)
    lh = np.asarray(lower_hull(x, y), dtype=np.int64)
    best = (np.inf, 0.0, 0.0)  # (width, slope, base_intercept_mid)
    for base, other, direction in ((lh, uh, 1.0), (uh, lh, -1.0)):
        if base.size < 2:
            continue
        i, j = base[:-1], base[1:]
        slopes = (y[j] - y[i]) / (x[j] - x[i])
        intercepts = y[i] - slopes * x[i]
        # vertical distances from opposite-hull vertices to each edge line
        d = direction * (y[other][None, :] - (slopes[:, None] * x[other][None, :] + intercepts[:, None]))
        widths = d.max(axis=1)
        k = int(np.argmin(widths))
        if widths[k] < best[0]:
            best = (float(widths[k]), float(slopes[k]), float(intercepts[k] + direction * widths[k] / 2))
    width, slope, mid = best
    return slope, mid, width / 2
