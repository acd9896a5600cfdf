"""Piecewise constant / linear histograms (methods 7, 8).

Reference semantics (Buragohain ICDE'06 Min-Merge):
/root/reference/src/lossy_compression/value_representation/histogram_representation.zig:63-130
— merge buckets into exactly K, minimizing the per-bucket model error
(constant model for PWCH, linear for PWLH; the reference uses a
HashedPriorityQueue, /root/reference/src/utilities/hashed_priority_queue.zig).

Engine realization: bottom-up cheapest-merge, vectorized as BATCHED
LOCAL-MINIMA ROUNDS. Both merge costs are monotone over nested
intervals (PWCH: range of the union; PWLH: least-squares SSE over the
union — a superset interval can never cost less), so a pair that is a
local cost minimum stays one while other pairs merge: each round can
merge EVERY local minimum at once with numpy-vectorized cost
evaluation, instead of popping one pair at a time from a Python heap.
Tie rule (engine-defined, deterministic): a pair is a candidate when
its cost is <= both neighbors'; runs of equal-cost candidates sharing
buckets keep every other pair (lowest index first); the final round
caps to exactly K buckets by (cost, index). A heap fallback
(`_min_merge`) guards the degenerate monotone-cost-ramp shape where
rounds stop batching. Merge order on ties differs from the reference's
HashedPriorityQueue order; parity is at the invariant level (exactly K
buckets, per-bucket model exactness — operators/invariants.py:126,155).

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
    with np.errstate(over="ignore"):  # see _lsq_prefix_np
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


def _lsq_prefix_np(v: np.ndarray):
    """Prefix sums as numpy arrays for the vectorized round cost."""
    t = np.arange(v.size, dtype=np.float64)
    with np.errstate(over="ignore"):  # |v| > ~1e154: v*v -> inf; the
        # NaN-cost guard in _batch_starts hands such series to the heap
        return (
            np.concatenate(([0.0], np.cumsum(v))),
            np.concatenate(([0.0], np.cumsum(v * v))),
            np.concatenate(([0.0], np.cumsum(v * t))),
            np.concatenate(([0.0], np.cumsum(t))),
            np.concatenate(([0.0], np.cumsum(t * t))),
        )


def _lsq_sse_vec(prefnp, s: np.ndarray, e: np.ndarray) -> np.ndarray:
    """Vectorized `_lsq_sse` SSE over parallel [s_i, e_i] arrays (used
    only to ORDER candidate merges; the emitted fits stay scalar)."""
    cv, cv2, cvt, ct, ct2 = prefnp
    with np.errstate(over="ignore", invalid="ignore"):  # see _lsq_prefix_np
        sf = s.astype(np.float64)
        n = (e - s + 1).astype(np.float64)
        Sv = cv[e + 1] - cv[s]
        Sv2 = cv2[e + 1] - cv2[s]
        Svt = cvt[e + 1] - cvt[s]
        St = ct[e + 1] - ct[s]
        St2 = ct2[e + 1] - ct2[s]
        Sx = St - sf * n
        Sxx = St2 - 2.0 * sf * St + n * sf * sf
        Sxy = Svt - sf * Sv
        denom = n * Sxx - Sx * Sx
        ok = denom > 0
        safe = np.where(ok, denom, 1.0)
        slope = np.where(ok, (n * Sxy - Sx * Sv) / safe, 0.0)
        b0 = (Sv - slope * Sx) / n
        sse = Sv2 - 2 * b0 * Sv - 2 * slope * Sxy + n * b0 * b0 + 2 * b0 * slope * Sx + slope * slope * Sxx
        return np.where(ok, np.maximum(sse, 0.0), 0.0)


def _pick_merges(c: np.ndarray, cap: int) -> np.ndarray:
    """One batch round's merge set: indices p where pair p (buckets p,
    p+1) is a local cost minimum (ties inclusive), with shared-bucket
    conflicts resolved lowest-index-first (every other pair in a run of
    consecutive candidates) and the result capped to the ``cap``
    cheapest by (cost, index). Always non-empty for cap >= 1 (the
    global minimum is a local minimum)."""
    left = np.empty_like(c)
    left[0] = np.inf
    left[1:] = c[:-1]
    right = np.empty_like(c)
    right[-1] = np.inf
    right[:-1] = c[1:]
    cand = np.flatnonzero((c <= left) & (c <= right))
    if cand.size > 1:
        new_run = np.empty(cand.size, dtype=bool)
        new_run[0] = True
        np.not_equal(np.diff(cand), 1, out=new_run[1:])
        heads = np.flatnonzero(new_run)
        pos = np.arange(cand.size) - heads[np.cumsum(new_run) - 1]
        cand = cand[pos % 2 == 0]
    if cand.size > cap:
        order = np.argsort(c[cand], kind="stable")[:cap]
        cand = np.sort(cand[order])
    return cand


#: heap fallback triggers after this many consecutive low-progress
#: rounds (progress < m/16 merges) — guards the monotone-cost-ramp
#: shape where every round yields O(1) local minima
_SLOW_ROUNDS = 3


def _min_merge(segs_init, k: int, cost_fn, on_merge=None):
    """Heap-based bottom-up merge of ``segs_init`` (list of
    (start, end_inclusive) buckets) down to k buckets; the fallback for
    batch rounds that stop making progress, and the arbiter of the
    (cost, slot-index) pop order the batch tie rule mirrors.
    ``cost_fn(i_slot, j_slot, segs)`` evaluates merging slot i with its
    successor slot j; ``on_merge(i_slot, j_slot)`` lets callers maintain
    O(1) incremental state (e.g. merged extrema)."""
    segs = list(segs_init)
    n_points = len(segs)
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


def _batch_starts(v: np.ndarray, k: int, round_costs) -> np.ndarray | None:
    """Run batched local-minima merge rounds from singleton buckets down
    to k; returns the final bucket-start array, or None if progress
    stalled (_SLOW_ROUNDS of sub-m/16 rounds) and the caller should
    finish on the heap from the returned-by-side-effect state. To keep
    the contract simple the stall path returns None together with the
    current starts via ``round_costs.starts`` — see callers."""
    n = v.size
    starts = np.arange(n, dtype=np.int64)
    m = n
    slow = 0
    while m > k:
        c = round_costs(starts)
        cand = _pick_merges(c, m - k)
        if cand.size == 0:
            # all-NaN costs (v*v overflow to inf -> inf-inf): no local
            # minimum is identifiable — hand off to the heap, which
            # drains regardless of NaN comparison results
            round_costs.starts = starts
            return None
        keep = np.ones(m, dtype=bool)
        keep[cand + 1] = False
        starts = starts[keep]
        m -= cand.size
        slow = slow + 1 if cand.size * 16 < m else 0
        if slow >= _SLOW_ROUNDS and m > k:
            round_costs.starts = starts
            return None
    round_costs.starts = starts
    return starts


def _bucket_list(starts: np.ndarray, n: int) -> list[tuple[int, int]]:
    ends = np.empty(starts.size, dtype=np.int64)
    ends[:-1] = starts[1:] - 1
    ends[-1] = n - 1
    return list(zip(starts.tolist(), ends.tolist()))


def compress_pwch(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    k = _bins(config)
    if not np.isfinite(v).all():
        raise ValueError("histogram methods require finite input")

    def round_costs(starts: np.ndarray) -> np.ndarray:
        bmin = np.minimum.reduceat(v, starts)
        bmax = np.maximum.reduceat(v, starts)
        return (np.maximum(bmax[1:], bmax[:-1]) - np.minimum(bmin[1:], bmin[:-1])) * 0.5

    starts = _batch_starts(v, k, round_costs)
    if starts is None:  # heap fallback from the stalled state
        segs = _bucket_list(round_costs.starts, v.size)
        mins = [float(v[s : e + 1].min()) for s, e in segs]
        maxs = [float(v[s : e + 1].max()) for s, e in segs]

        def cost_fn(i: int, j: int, _segs) -> float:
            return (max(maxs[i], maxs[j]) - min(mins[i], mins[j])) / 2

        def on_merge(i: int, j: int) -> None:
            if maxs[j] > maxs[i]:
                maxs[i] = maxs[j]
            if mins[j] < mins[i]:
                mins[i] = mins[j]

        buckets = _min_merge(segs, k, cost_fn, on_merge)
        starts = np.array([s for s, _ in buckets], dtype=np.int64)
    if starts.size == 0:
        return b""
    bmin = np.minimum.reduceat(v, starts)
    bmax = np.maximum.reduceat(v, starts)
    out = np.empty(2 * starts.size, dtype=np.uint64)
    out[0::2] = ((bmax + bmin) / 2).view(np.uint64)
    out[1::2] = np.concatenate((starts[1:], [v.size])).astype(np.uint64)
    return out.tobytes()


def compress_pwlh(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    k = _bins(config)
    if not np.isfinite(v).all():
        raise ValueError("histogram methods require finite input")
    prefnp = _lsq_prefix_np(v)

    def round_costs(starts: np.ndarray) -> np.ndarray:
        ends = np.empty(starts.size, dtype=np.int64)
        ends[:-1] = starts[1:] - 1
        ends[-1] = v.size - 1
        return _lsq_sse_vec(prefnp, starts[:-1], ends[1:])

    starts = _batch_starts(v, k, round_costs)
    if starts is None:  # heap fallback from the stalled state
        pref = _lsq_prefix(v)  # list mirrors: ~12k scalar sse calls

        def cost_fn(i: int, j: int, segs) -> float:
            return _lsq_sse(pref, segs[i][0], segs[j][1])[0]

        buckets = _min_merge(_bucket_list(round_costs.starts, v.size), k, cost_fn)
    else:
        buckets = _bucket_list(starts, v.size) if starts.size else []
        pref = prefnp  # k scalar fits below: numpy indexing is fine
    triples = []
    for s, e in buckets:
        _, slope, b0 = _lsq_sse(pref, s, e)
        triples.append((b0, b0 + slope * (e - s), e))
    return _pack_triples(triples)


register(Method.PiecewiseConstantHistogram, compress_pwch, decompress_pairs)
register(Method.PiecewiseLinearHistogram, compress_pwlh, decompress_triples)
