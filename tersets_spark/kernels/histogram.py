"""Piecewise constant / linear histograms (methods 7, 8).

Reference semantics (Buragohain ICDE'06 Min-Merge):
/root/reference/src/lossy_compression/value_representation/histogram_representation.zig:63-130
— merge buckets into exactly K, minimizing the per-bucket model error
(constant model for PWCH, linear for PWLH; the reference uses a
HashedPriorityQueue, /root/reference/src/utilities/hashed_priority_queue.zig).

Engine realization: bottom-up cheapest-merge with a heap + linked list.
PWCH merge cost = (max-min)/2 of the merged bucket (O(1) from stored
extrema). PWLH cost = least-squares line residual, O(1) via global
prefix sums. Payloads reuse the PMC pair format (PWCH) and the triple
format (PWLH).
"""

from __future__ import annotations

import heapq

import numpy as np

from ..methods import Method
from .pmc import decompress as decompress_pairs
from .registry import register
from .swing_slide import _pack_triples, decompress_triples


def _lsq_prefix(v: np.ndarray):
    """Prefix sums as PYTHON LISTS: _lsq_sse runs ~12k times per series
    inside the merge heap, and plain-float indexing/arithmetic is ~6x
    cheaper than numpy scalar ops at that call size (same IEEE doubles,
    bit-identical results)."""
    t = np.arange(v.size, dtype=np.float64)
    return (
        np.concatenate(([0.0], np.cumsum(v))).tolist(),
        np.concatenate(([0.0], np.cumsum(v * v))).tolist(),
        np.concatenate(([0.0], np.cumsum(v * t))).tolist(),
        np.concatenate(([0.0], np.cumsum(t))).tolist(),
        np.concatenate(([0.0], np.cumsum(t * t))).tolist(),
    )


def _lsq_sse(pref, s: int, e: int) -> tuple[float, float, float]:
    """Least-squares line fit over [s, e]: returns (sse, slope,
    intercept_at_s)."""
    cv, cv2, cvt, ct, ct2 = pref
    n = e - s + 1
    Sv = cv[e + 1] - cv[s]
    Sv2 = cv2[e + 1] - cv2[s]
    Svt = cvt[e + 1] - cvt[s]
    St = ct[e + 1] - ct[s]
    St2 = ct2[e + 1] - ct2[s]
    # center x at s
    Sx = St - s * n
    Sxx = St2 - 2 * s * St + n * s * s
    Sxy = Svt - s * Sv
    denom = n * Sxx - Sx * Sx
    if denom <= 0:
        return 0.0, 0.0, Sv / n
    slope = (n * Sxy - Sx * Sv) / denom
    b0 = (Sv - slope * Sx) / n
    sse = Sv2 - 2 * b0 * Sv - 2 * slope * Sxy + n * b0 * b0 + 2 * b0 * slope * Sx + slope * slope * Sxx
    return max(sse, 0.0), slope, b0


def _min_merge(n_points: int, k: int, cost_fn, on_merge=None):
    """Generic bottom-up merge from singletons to k buckets; returns the
    list of (start, end_inclusive) buckets. ``cost_fn(i_slot, j_slot,
    segs)`` evaluates merging slot i with its successor slot j;
    ``on_merge(i_slot, j_slot)`` lets callers maintain O(1) incremental
    state (e.g. merged extrema)."""
    segs = [(i, i) for i in range(n_points)]
    nxt = list(range(1, n_points)) + [-1]
    prv = [-1] + list(range(n_points - 1))
    alive = [True] * n_points
    version = [0] * n_points
    n_alive = n_points

    def cost(i: int) -> float:
        j = nxt[i]
        return np.inf if j < 0 else cost_fn(i, j, segs)

    heap = [(cost(i), i, 0) for i in range(n_points) if nxt[i] >= 0]
    heapq.heapify(heap)
    while n_alive > k and heap:
        c, i, ver = heapq.heappop(heap)
        if not alive[i] or ver != version[i] or nxt[i] < 0:
            continue
        j = nxt[i]
        if on_merge is not None:
            on_merge(i, j)
        segs[i] = (segs[i][0], segs[j][1])
        alive[j] = False
        n_alive -= 1
        nxt[i] = nxt[j]
        if nxt[j] >= 0:
            prv[nxt[j]] = i
        version[i] += 1
        if nxt[i] >= 0:
            heapq.heappush(heap, (cost(i), i, version[i]))
        p = prv[i]
        if p >= 0:
            version[p] += 1
            heapq.heappush(heap, (cost(p), p, version[p]))
    return [s for s, a in zip(segs, alive) if a]


def _bins(config: dict | None) -> int:
    k = int((config or {}).get("histogram_bins_number", 0))
    if k <= 1:
        raise ValueError("histogram_bins_number must be > 1")
    return k


def compress_pwch(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    k = _bins(config)
    if not np.isfinite(v).all():
        raise ValueError("histogram methods require finite input")
    # O(1) merge cost via per-slot running extrema
    maxs = v.tolist()
    mins = v.tolist()

    def cost_fn(i: int, j: int, _segs) -> float:
        return (max(maxs[i], maxs[j]) - min(mins[i], mins[j])) / 2

    def on_merge(i: int, j: int) -> None:
        if maxs[j] > maxs[i]:
            maxs[i] = maxs[j]
        if mins[j] < mins[i]:
            mins[i] = mins[j]

    buckets = _min_merge(v.size, k, cost_fn, on_merge)
    out = np.empty(2 * len(buckets), dtype=np.uint64)
    starts = [s for s, _ in buckets]
    vals = np.array([(maxs[s] + mins[s]) / 2 for s in starts])
    out[0::2] = vals.view(np.uint64)
    out[1::2] = np.array([e + 1 for _, e in buckets], dtype=np.uint64)
    return out.tobytes()


def compress_pwlh(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    k = _bins(config)
    if not np.isfinite(v).all():
        raise ValueError("histogram methods require finite input")
    pref = _lsq_prefix(v)

    def cost_fn(i: int, j: int, segs) -> float:
        return _lsq_sse(pref, segs[i][0], segs[j][1])[0]

    buckets = _min_merge(v.size, k, cost_fn)
    triples = []
    for s, e in buckets:
        _, slope, b0 = _lsq_sse(pref, s, e)
        triples.append((b0, b0 + slope * (e - s), e))
    return _pack_triples(triples)


register(Method.PiecewiseConstantHistogram, compress_pwch, decompress_pairs)
register(Method.PiecewiseLinearHistogram, compress_pwlh, decompress_triples)
