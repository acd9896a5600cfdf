"""Largest Triangle Three Buckets downsampling (method 25).

Reference semantics:
/root/reference/src/lossy_compression/line_simplification/largest_triangle_three_buckets.zig:49-127
— downsample to ``target_point_count`` points: first and last kept;
interior points split into k-2 buckets; per bucket pick the point
maximizing the triangle area with the previously selected point and the
next bucket's centroid. Decompress (:131-175) linearly interpolates the
selected knots back to full length.

The per-bucket argmax is vectorized; the Python loop runs once per
*output* point (k ≪ n). Payload: f64 first, then (f64 value, u64 index)
pairs for the selected interior points and the last point.
"""

from __future__ import annotations

import numpy as np

from ..methods import Method
from .registry import register


def select_indices(v: np.ndarray, k: int) -> np.ndarray:
    """LTTB-selected indices (always includes 0 and n-1)."""
    n = v.size
    if k >= n:
        return np.arange(n, dtype=np.int64)
    if k < 3:
        return np.array([0, n - 1], dtype=np.int64)
    # bucket boundaries over the n-2 interior points
    edges = np.linspace(1, n - 1, k - 1).astype(np.int64).tolist()
    chosen = np.empty(k, dtype=np.int64)
    chosen[0], chosen[-1] = 0, n - 1
    prev = 0
    vl = v.tolist()  # scalar loop over ~n/k-point buckets: plain floats
    # beat numpy per-call overhead at these sizes (CLAUDE.md playbook)
    for b in range(k - 2):
        lo, hi = edges[b], edges[b + 1]
        if hi <= lo:
            hi = lo + 1
        nlo, nhi = (edges[b + 1], edges[b + 2]) if b + 2 < k - 1 else (n - 1, n)
        cx = (nlo + max(nhi - 1, nlo)) / 2.0
        # nan-skipping mean of the NEXT bucket (sequential sum)
        tot = 0.0
        cnt = 0
        for y in vl[nlo : max(nhi, nlo + 1)]:
            if y == y:
                tot += y
                cnt += 1
        cy = tot / cnt if cnt else float("nan")
        vp = vl[prev]
        # 2x triangle area with vertices (prev, v[prev]), (x, y), (cx, cy)
        pa = prev - cx
        pb = cy - vp
        best_a, best_i = -1.0, lo
        for i in range(lo, hi):
            y = vl[i]
            a = abs(pa * (y - vp) - (prev - i) * pb)
            if a > best_a:  # NaN compares False -> treated as -1 like before
                best_a, best_i = a, i
        prev = best_i
        chosen[b + 1] = prev
    return chosen


def compress(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    k = int((config or {}).get("target_point_count", 0))
    if k < 2:
        raise ValueError("LTTB requires target_point_count >= 2")
    idx = select_indices(v, k)
    out = np.empty(1 + 2 * (idx.size - 1), dtype=np.uint64)
    out[0] = np.array([v[idx[0]]], dtype=np.float64).view(np.uint64)[0]
    out[1::2] = np.asarray(v[idx[1:]], dtype=np.float64).view(np.uint64)
    out[2::2] = idx[1:].astype(np.uint64)
    return out.tobytes()


def decompress(payload: bytes) -> np.ndarray:
    raw = np.frombuffer(payload, dtype=np.uint64)
    if raw.size == 0:
        return np.empty(0, dtype=np.float64)
    first = raw[:1].view(np.float64)[0]
    kv = np.concatenate(([first], raw[1::2].view(np.float64)))
    ki = np.concatenate(([0], raw[2::2].astype(np.int64)))
    from .vw import interp_knots

    return interp_knots(kv, ki)


register(Method.LargestTriangleThreeBuckets, compress, decompress)
