"""RMSE-bounded segmentation: SlidingWindow (method 11) and BottomUp
(method 12), Keogh ICDM'01.

Reference semantics:
/root/reference/src/lossy_compression/line_simplification/sliding_window.zig:54-100
— grow the window while the RMSE of the segment (line connecting the
raw endpoints) stays <= ``aggregate_error_bound``; emit
``(start_value, end_value, end_index)`` triples.
/root/reference/src/lossy_compression/line_simplification/bottom_up.zig:51-
— start from 2-point segments, repeatedly merge the cheapest adjacent
pair while its merged RMSE stays within the bound.

Vectorization: with prefix sums of v, v^2 and v*t, the SSE of the
endpoint-connecting line over any [s, e] is O(1):
    SSE = Syy - 2m*Sty + m^2*Stt   (y centered at v_s, t at s)
SlidingWindow evaluates whole candidate blocks at once (one numpy pass
per gallop block); BottomUp uses a heap + doubly linked segment list
with O(1) cost evaluation per candidate merge.
"""

from __future__ import annotations

import heapq

import numpy as np

from ..methods import Method
from .registry import register
from .segmentation import finite_runs, first_violation
from .swing_slide import _pack_triples, decompress_triples


class _PrefixSums:
    """O(1) endpoint-line SSE over any [s, e] via global prefix sums."""

    def __init__(self, v: np.ndarray):
        n = v.size
        t = np.arange(n, dtype=np.float64)
        # prefix sums run over the WHOLE series but are only ever
        # differenced within finite runs; a NaN/inf anywhere would
        # contaminate every later prefix (cumsum carries it forward),
        # silently turning all post-NaN cost comparisons False and
        # disabling the error bound. Zero the non-finite positions: they
        # lie outside every queried [s, e], and zeros leave the in-run
        # differences identical (bit-for-bit on all-finite input).
        vz = v if np.isfinite(v).all() else np.where(np.isfinite(v), v, 0.0)
        self.cv = np.concatenate(([0.0], np.cumsum(vz)))
        self.cv2 = np.concatenate(([0.0], np.cumsum(vz * vz)))
        self.cvt = np.concatenate(([0.0], np.cumsum(vz * t)))
        self.ct = np.concatenate(([0.0], np.cumsum(t)))
        self.ct2 = np.concatenate(([0.0], np.cumsum(t * t)))
        self.v = v
        # list mirrors for the SCALAR sse/rmse (heap-merge hot path):
        # plain-float indexing is ~6x cheaper than numpy scalars at this
        # call size, same IEEE doubles (the vectorized sliding-window
        # scan keeps using the numpy arrays above)
        self.cvl = self.cv.tolist()
        self.cv2l = self.cv2.tolist()
        self.cvtl = self.cvt.tolist()
        self.ctl = self.ct.tolist()
        self.ct2l = self.ct2.tolist()
        self.vl = v.tolist()

    def sse(self, s: int, e: int) -> float:
        """SSE of the line through (s, v[s]) and (e, v[e]) over [s, e]."""
        if e <= s:
            return 0.0
        vs = self.vl[s]
        m = (self.vl[e] - vs) / (e - s)
        n = e - s + 1
        Sv = self.cvl[e + 1] - self.cvl[s]
        Sv2 = self.cv2l[e + 1] - self.cv2l[s]
        Svt = self.cvtl[e + 1] - self.cvtl[s]
        St = self.ctl[e + 1] - self.ctl[s]
        St2 = self.ct2l[e + 1] - self.ct2l[s]
        # y_j = v_j - vs, x_j = t_j - s
        Syy = Sv2 - 2 * vs * Sv + n * vs * vs
        Sxy = (Svt - s * Sv) - vs * (St - s * n)
        Sxx = St2 - 2 * s * St + n * s * s
        sse = Syy - 2 * m * Sxy + m * m * Sxx
        return max(sse, 0.0)

    def rmse(self, s: int, e: int) -> float:
        import math

        return math.sqrt(self.sse(s, e) / (e - s + 1))


def compress_sliding_window(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    cfg = config or {}
    bound = float(cfg.get("aggregate_error_bound", 0.0))
    if bound < 0 or not np.isfinite(bound):
        raise ValueError("aggregate_error_bound must be finite and >= 0")
    if str(cfg.get("aggregate_error_type", "rmse")).lower() != "rmse":
        raise ValueError("only aggregate_error_type='rmse' is supported")
    triples: list[tuple[float, float, int]] = []
    ps = None
    near = 48  # scalar near-field: on noisy data the first violation is
    # a couple of points out, and the inlined plain-float sse below
    # beats the vectorized block's numpy setup (~25 µs) until this depth
    bound2 = bound * bound  # rmse > bound <=> sse/n > bound^2 (sqrt is
    # monotone; the boundary shifts at most one ulp where bound^2
    # rounds, an engine-defined tie well inside the invariant tolerance)
    for rs, re, is_finite in finite_runs(v):
        if not is_finite:
            triples.append((float(v[rs]), float(v[rs]), rs))
            continue
        if ps is None:  # prefix sums are global; built once, runs slice
            ps = _PrefixSums(v)
            cvl, cv2l, cvtl, ctl, ct2l, vls = (
                ps.cvl, ps.cv2l, ps.cvtl, ps.ctl, ps.ct2l, ps.vl,
            )
        s = rs
        while s < re:
            def scan(hi: int, s=s) -> int:
                lo = s + 1
                mend = min(hi, lo + near)
                vs = vls[s]
                cvs = cvl[s]
                cv2s = cv2l[s]
                cvts = cvtl[s]
                cts = ctl[s]
                ct2s = ct2l[s]
                for e in range(lo, mend):
                    # inlined _PrefixSums.sse (the per-candidate call
                    # chain was the hot path): same expressions
                    m = (vls[e] - vs) / (e - s)
                    n1 = e - s + 1
                    Sv = cvl[e + 1] - cvs
                    Sv2 = cv2l[e + 1] - cv2s
                    Svt = cvtl[e + 1] - cvts
                    St = ctl[e + 1] - cts
                    St2 = ct2l[e + 1] - ct2s
                    Syy = Sv2 - 2 * vs * Sv + n1 * vs * vs
                    Sxy = (Svt - s * Sv) - vs * (St - s * n1)
                    Sxx = St2 - 2 * s * St + n1 * s * s
                    sse = Syy - 2 * m * Sxy + m * m * Sxx
                    if sse > bound2 * n1:
                        return e
                if hi <= mend:
                    return -1
                es = np.arange(mend, hi)
                # vectorized rmse for the far candidate block
                m = (v[es] - v[s]) / (es - s)
                n = es - s + 1
                Syy = (ps.cv2[es + 1] - ps.cv2[s]) - 2 * v[s] * (ps.cv[es + 1] - ps.cv[s]) + n * v[s] ** 2
                Sxy = (ps.cvt[es + 1] - ps.cvt[s]) - s * (ps.cv[es + 1] - ps.cv[s]) - v[s] * (
                    (ps.ct[es + 1] - ps.ct[s]) - s * n
                )
                Sxx = (ps.ct2[es + 1] - ps.ct2[s]) - 2 * s * (ps.ct[es + 1] - ps.ct[s]) + n * s * s
                sse = np.maximum(Syy - 2 * m * Sxy + m * m * Sxx, 0.0)
                bad = np.sqrt(sse / n) > bound
                idx = np.flatnonzero(bad)
                return int(es[idx[0]]) if idx.size else -1

            stop = first_violation(re, s + 1, scan)
            end = min(stop, re) - 1 if stop < re else re - 1
            end = max(end, s)
            if end == s and s + 1 < re:
                end = s + 1  # two points always have RMSE 0
            triples.append((float(v[s]), float(v[end]), end))
            s = end + 1
    return _pack_triples(triples)


def _bottom_up_run_ref(
    v: np.ndarray, ps: _PrefixSums, rs: int, re: int, bound2: float
) -> list[tuple[int, int]]:
    """Reference-shaped lazy-deletion heap merge (kept as the A/B
    arbiter for the fast path below — tests assert identical segment
    lists on adversarial corpora). Returns surviving (start, end)."""
    starts = list(range(rs, re, 2))
    segs = [(s, min(s + 1, re - 1)) for s in starts]
    if not segs:
        return []
    nxt = list(range(1, len(segs))) + [-1]
    prv = [-1] + list(range(len(segs) - 1))
    alive = [True] * len(segs)
    cvl, cv2l, cvtl, vls = ps.cvl, ps.cv2l, ps.cvtl, ps.vl

    def merge_cost(i: int) -> float:
        # time-axis sums in CLOSED FORM (t is 0..n-1, so over [s, e]
        # with d = e-s: sum(t-s) = d(d+1)/2, sum((t-s)^2) =
        # d(d+1)(2d+1)/6 — exact in float64 for d < ~2e5, far above the
        # 4096-point chunk bound) — trims 4 prefix lookups + 6 float
        # ops from the per-merge hot path (round-4 verdict #6); the
        # fast path below uses the identical grouping
        j = nxt[i]
        if j < 0:
            return np.inf
        s = segs[i][0]
        e = segs[j][1]
        if e <= s:
            return 0.0
        d = e - s
        vs = vls[s]
        m = (vls[e] - vs) / d
        n1 = d + 1
        Sv = cvl[e + 1] - cvl[s]
        Syy = cv2l[e + 1] - cv2l[s] - 2 * vs * Sv + n1 * vs * vs
        Sxy = cvtl[e + 1] - cvtl[s] - s * Sv - vs * (d * n1 / 2)
        sse = Syy - 2 * m * Sxy + m * m * (d * n1 * (2 * d + 1) / 6)
        return sse / n1 if sse > 0 else 0.0

    heap = [(merge_cost(i), i, 0) for i in range(len(segs)) if nxt[i] >= 0]
    heapq.heapify(heap)
    version = [0] * len(segs)
    while heap:
        cost, i, ver = heapq.heappop(heap)
        if not alive[i] or ver != version[i] or cost > bound2:
            if cost > bound2 and alive[i] and ver == version[i]:
                break
            continue
        j = nxt[i]
        if j < 0:
            continue
        segs[i] = (segs[i][0], segs[j][1])
        alive[j] = False
        nxt[i] = nxt[j]
        if nxt[j] >= 0:
            prv[nxt[j]] = i
        version[i] += 1
        if nxt[i] >= 0:
            heapq.heappush(heap, (merge_cost(i), i, version[i]))
        p = prv[i]
        if p >= 0:
            version[p] += 1
            heapq.heappush(heap, (merge_cost(p), p, version[p]))
    return [se for k, se in enumerate(segs) if alive[k]]


def _bottom_up_run(
    v: np.ndarray, ps: _PrefixSums, rs: int, re: int, bound2: float
) -> list[tuple[int, int]]:
    """Fast path, EXACT-ORDER-equal to `_bottom_up_run_ref` (same merge
    sequence, same tie-breaks): vectorized initial pair-merge costs
    (bitwise-identical op order), a current-cost list for O(1) pop
    validation, candidate-only heap coverage (a cost can only enter
    sub-bound territory via a DECREASE, which pushes a fresh entry),
    and cascade merging when an updated cost drops strictly below the
    popped key (it is then provably the global minimum — every other
    alive cost is >= the popped key)."""
    k = (re - rs + 1) // 2
    if k <= 0:
        return []
    last_end = re - 1
    seg_end = list(range(rs + 1, re, 2))
    if len(seg_end) < k:
        seg_end.append(last_end)  # odd run: trailing singleton slot
    seg_start = list(range(rs, re, 2))
    if k == 1:
        return [(seg_start[0], seg_end[0])]
    # vectorized initial merge costs (slot i merging slot i+1):
    # identical IEEE sequence as the scalar merge_cost
    s_np = np.arange(rs, re - 2, 2, dtype=np.int64)
    e_np = np.minimum(s_np + 3, last_end)
    vs = ps.v[s_np]
    d = e_np - s_np
    m = (ps.v[e_np] - vs) / d
    n1 = d + 1
    Sv = ps.cv[e_np + 1] - ps.cv[s_np]
    # closed-form time sums, same grouping as merge_cost (int64 stays
    # exact; the /2 and /6 divisions land on exactly-representable ints)
    Syy = ps.cv2[e_np + 1] - ps.cv2[s_np] - 2 * vs * Sv + n1 * vs * vs
    Sxy = ps.cvt[e_np + 1] - ps.cvt[s_np] - s_np * Sv - vs * (d * n1 / 2)
    sse = Syy - 2 * m * Sxy + m * m * (d * n1 * (2 * d + 1) / 6)
    init = np.where(sse > 0, sse / n1, 0.0)

    nxt = list(range(1, k)) + [-1]
    prv = [-1] + list(range(k - 1))
    inf = float("inf")
    dead = -1.0  # costs are >= 0: free "merged-away slot" sentinel
    cur = [inf] * k
    cur[: k - 1] = init.tolist()
    # initial candidates consumed as a pre-sorted stream (lexsort by
    # (cost, slot) — the heap tuples' total order); only dynamic
    # updates go through the small overflow heap (same ~1.45x trick as
    # VW: most pops become a pointer increment, not an O(log n) sift)
    cand0 = np.flatnonzero(init <= bound2)
    order = np.lexsort((cand0, init[cand0]))
    sa = init[cand0][order].tolist()
    si = cand0[order].tolist()
    sp, sn = 0, len(sa)
    heap: list = []
    push, pop = heapq.heappush, heapq.heappop
    cvl, cv2l, cvtl, vls = ps.cvl, ps.cv2l, ps.cvtl, ps.vl

    while True:
        if sp < sn:
            if heap:
                h0 = heap[0]
                sae = sa[sp]
                if h0[0] < sae or (h0[0] == sae and h0[1] < si[sp]):
                    a, i = pop(heap)
                else:
                    a = sae
                    i = si[sp]
                    sp += 1
            else:
                a = sa[sp]
                i = si[sp]
                sp += 1
        elif heap:
            a, i = pop(heap)
        else:
            break
        ca = cur[i]
        if ca != a:
            if ca != dead and ca <= bound2:
                push(heap, (ca, i))  # stale (cost grew): re-key
            continue
        while True:
            j = nxt[i]
            seg_end[i] = seg_end[j]
            cur[j] = dead
            nj = nxt[j]
            nxt[i] = nj
            if nj >= 0:
                prv[nj] = i
            cand = None
            # inlined merge cost of the grown slot i with its new next
            # (the call-chain + closure-lookup overhead was ~half the
            # loop; identical expressions to _bottom_up_run_ref's
            # merge_cost)
            if nj < 0:
                nci = inf
            else:
                s = seg_start[i]
                e = seg_end[nj]
                d = e - s
                vs = vls[s]
                m = (vls[e] - vs) / d
                n1 = d + 1
                Sv = cvl[e + 1] - cvl[s]
                Syy = cv2l[e + 1] - cv2l[s] - 2 * vs * Sv + n1 * vs * vs
                Sxy = cvtl[e + 1] - cvtl[s] - s * Sv - vs * (d * n1 / 2)
                sse = Syy - 2 * m * Sxy + m * m * (d * n1 * (2 * d + 1) / 6)
                nci = sse / n1 if sse > 0 else 0.0
            if nci < a:
                cand = (nci, i)
            elif nci <= bound2:
                # the merged slot's own entry was just consumed by this
                # pop — its new cost needs unconditional fresh coverage
                push(heap, (nci, i))
            cur[i] = nci
            p = prv[i]
            if p >= 0:
                s = seg_start[p]
                e = seg_end[i]
                d = e - s
                vs = vls[s]
                m = (vls[e] - vs) / d
                n1 = d + 1
                Sv = cvl[e + 1] - cvl[s]
                Syy = cv2l[e + 1] - cv2l[s] - 2 * vs * Sv + n1 * vs * vs
                Sxy = cvtl[e + 1] - cvtl[s] - s * Sv - vs * (d * n1 / 2)
                sse = Syy - 2 * m * Sxy + m * m * (d * n1 * (2 * d + 1) / 6)
                ncp = sse / n1 if sse > 0 else 0.0
                if ncp < a and (cand is None or (ncp, p) < cand):
                    if cand is not None:
                        push(heap, cand)
                    cand = (ncp, p)
                elif ncp < cur[p] and ncp <= bound2:
                    push(heap, (ncp, p))
                cur[p] = ncp
            if cand is None:
                break
            i = cand[1]
            a = cand[0]
    return [
        (seg_start[i], seg_end[i]) for i in range(k) if cur[i] != dead
    ]


def compress_bottom_up(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    cfg = config or {}
    bound = float(cfg.get("aggregate_error_bound", 0.0))
    if bound < 0 or not np.isfinite(bound):
        raise ValueError("aggregate_error_bound must be finite and >= 0")
    triples: list[tuple[float, float, int]] = []
    ps = None
    # heap keyed by MEAN SQUARED error (sse/n) instead of rmse: sqrt is
    # monotone, so cheapest-first order is the same modulo sqrt-rounding
    # ties (engine-defined tie order, as elsewhere), and the bound
    # compares against bound^2 — one sqrt saved per cost evaluation
    bound2 = bound * bound
    for rs, re, is_finite in finite_runs(v):
        if not is_finite:
            triples.append((float(v[rs]), float(v[rs]), rs))
            continue
        if ps is None:  # prefix sums are global; built once, runs slice
            ps = _PrefixSums(v)
        for s, e in _bottom_up_run(v, ps, rs, re, bound2):
            triples.append((float(v[s]), float(v[e]), e))
    return _pack_triples(triples)


register(Method.SlidingWindow, compress_sliding_window, decompress_triples)
register(Method.BottomUp, compress_bottom_up, decompress_triples)
