"""Visvalingam-Whyatt line simplification (method 10).

Reference semantics:
/root/reference/src/lossy_compression/line_simplification/visvalingam_whyatt.zig:53-
— repeatedly eliminate the point with the smallest effective triangle
area (with its surviving neighbors) until the minimum area exceeds
``area_under_curve_error``; emits the surviving (value, index) points.
Triangle area: /root/reference/src/utilities/shared_functions.zig:389-398;
the reference drives it with an IndexedPriorityQueue
(/root/reference/src/utilities/indexed_priority_queue.zig) — here a
lazy-deletion heapq + doubly linked list.

Payload: (f64 value, u64 index) knot pairs; decompress interpolates
(same knot decoder family as LTTB).
"""

from __future__ import annotations

import heapq

import numpy as np

from ..methods import Method, check_decode_count
from .registry import register
from .segmentation import finite_runs


def _area(x1, y1, x2, y2, x3, y3) -> float:
    return abs((x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)) / 2


def _simplify_run_ref(v: np.ndarray, s: int, e: int, bound: float) -> list[int]:
    """Reference-shaped heap loop (kept as the A/B arbiter for the fast
    path below — tests assert byte-equality on adversarial corpora)."""
    n = e - s
    if n <= 2:
        return list(range(s, e))
    idx = list(range(s, e))
    vl = v[s:e].tolist()  # plain floats: the heap loop is scalar-bound
    nxt = list(range(1, n)) + [-1]
    prv = [-1] + list(range(n - 1))
    alive = [True] * n
    version = [0] * n
    inf = float("inf")

    def area_of(i: int) -> float:
        p, q = prv[i], nxt[i]
        if p < 0 or q < 0:
            return inf
        return _area(idx[p], vl[p], idx[i], vl[i], idx[q], vl[q])

    heap = [(area_of(i), i, 0) for i in range(1, n - 1)]
    heapq.heapify(heap)
    while heap:
        a, i, ver = heapq.heappop(heap)
        if not alive[i] or ver != version[i]:
            continue
        if a > bound:
            break
        alive[i] = False
        p, q = prv[i], nxt[i]
        nxt[p], prv[q] = q, p
        for nb in (p, q):
            if 0 < nb < n - 1 and alive[nb]:
                version[nb] += 1
                heapq.heappush(heap, (area_of(nb), nb, version[nb]))
    return [idx[i] for i in range(n) if alive[i]]


def _simplify_run(v: np.ndarray, s: int, e: int, bound: float) -> list[int]:
    """Surviving indices of the finite run [s, e).

    Fast path, EXACT-ORDER-equal to `_simplify_run_ref` (same
    eliminations, same tie-breaks, byte-identical payload):

    * initial areas come from ONE vectorized numpy pass replicating the
      scalar `_area` op order exactly (x spacing is integral, so
      ``1.0*(y3-y1) - 2.0*(y2-y1)`` is the identical IEEE sequence);
    * a current-area list makes pop validation an O(1) float compare
      instead of version counters + recomputation;
    * neighbor updates push a heap entry ONLY when the area DECREASED —
      an entry's key therefore never overstates the true area, so the
      first VALID pop is still the global minimum, while the common VW
      case (removal grows the neighbors' triangles) skips the push
      entirely and is lazily re-keyed if that stale entry surfaces.
    """
    n = e - s
    if n <= 2:
        return list(range(s, e))
    vl = v[s:e].tolist()  # plain floats: the heap loop is scalar-bound
    va = v[s:e]
    # bitwise replication of _area(p, i, q) at unit spacing:
    # (x2-x1)=1.0, (x3-x1)=2.0 -> |1.0*(y3-y1) - 2.0*(y2-y1)| / 2
    init = np.abs(1.0 * (va[2:] - va[:-2]) - 2.0 * (va[1:-1] - va[:-2])) / 2
    nxt = list(range(1, n)) + [-1]
    prv = [-1] + list(range(n - 1))
    inf = float("inf")
    dead = -1.0  # areas are >= 0, so -1 is a free "eliminated" sentinel
    cur = [inf] * n
    cur[1 : n - 1] = init.tolist()
    # only sub-bound areas can ever be eliminated, so only they need
    # coverage: a point entering sub-bound territory does so via a
    # DECREASE, which pushes a fresh entry below — the candidate set,
    # not the whole run. The initial candidates are consumed as a
    # PRE-SORTED STREAM (np.lexsort by (area, index) — the same total
    # order as the heap tuples) with only the dynamic updates going
    # through a small overflow heap: most pops become a pointer
    # increment instead of an O(log n) sift (~1.45x measured).
    cand0 = np.flatnonzero(init <= bound)
    order = np.lexsort((cand0, init[cand0]))
    sa = init[cand0][order].tolist()
    si = (cand0[order] + 1).tolist()
    sp, sn = 0, len(sa)
    heap: list = []
    push, pop = heapq.heappush, heapq.heappop
    last = n - 1
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
            if ca != dead and ca <= bound:
                # stale (area grew since this entry was pushed): re-key
                push(heap, (ca, i))
            continue
        # cascade: when an updated neighbor's new area drops STRICTLY
        # below the popped key a, it is the unique global minimum
        # (every other alive point's area is >= a: the heap's minimum
        # key was a, keys never overstate, and eliminations only touch
        # adjacent areas) — eliminate it immediately, no heap round-trip
        while True:
            cur[i] = dead
            p, q = prv[i], nxt[i]
            nxt[p], prv[q] = q, p
            cand = None
            if 0 < p:
                pp, qq = prv[p], nxt[p]
                d = (p - pp) * (vl[qq] - vl[pp]) - (qq - pp) * (vl[p] - vl[pp])
                nap = (d if d >= 0 else -d) / 2
                if nap < a:
                    cand = (nap, p)
                elif nap < cur[p] and nap <= bound:
                    push(heap, (nap, p))
                cur[p] = nap
            if q < last:
                pp, qq = prv[q], nxt[q]
                d = (q - pp) * (vl[qq] - vl[pp]) - (qq - pp) * (vl[q] - vl[pp])
                naq = (d if d >= 0 else -d) / 2
                if naq < a and (cand is None or (naq, q) < cand):
                    if cand is not None:
                        # p lost the tie-break: it stays alive for now —
                        # make sure its (smaller-than-a) key is in the heap
                        push(heap, cand)
                    cand = (naq, q)
                elif naq < cur[q] and naq <= bound:
                    push(heap, (naq, q))
                cur[q] = naq
            if cand is None:
                break
            i = cand[1]
    return [s + i for i in range(n) if cur[i] != dead]


def compress(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    bound = float((config or {}).get("area_under_curve_error", 0.0))
    if bound < 0 or not np.isfinite(bound):
        raise ValueError("area_under_curve_error must be finite and >= 0")
    keep: list[int] = []
    for rs, re, is_finite in finite_runs(v):
        if not is_finite:
            keep.append(rs)
        else:
            keep.extend(_simplify_run(v, rs, re, bound))
    out = np.empty(2 * len(keep), dtype=np.uint64)
    ki = np.asarray(keep, dtype=np.int64)
    out[0::2] = v[ki].view(np.uint64)
    out[1::2] = ki.astype(np.uint64)
    return out.tobytes()


def decompress(payload: bytes) -> np.ndarray:
    if len(payload) % 16 != 0:
        raise ValueError("corrupt VW payload")
    raw = np.frombuffer(payload, dtype=np.uint64)
    kv = raw[0::2].view(np.float64)
    ki = raw[1::2].astype(np.int64)
    return interp_knots(kv, ki)


def interp_knots(kv: np.ndarray, ki: np.ndarray) -> np.ndarray:
    """Vectorized knot interpolation shared by the knot-pair decoders
    (VW, LTTB): one searchsorted + one fused arithmetic pass instead of
    a Python loop per knot, with the SAME multiply-then-divide grouping
    as the scalar form (exact knot values are written last, so NaN/Inf
    singleton knots never contaminate their own position)."""
    if ki.size and (int(ki[0]) < 0 or np.any(np.diff(ki) <= 0)):
        raise ValueError("corrupt knot payload: indices not increasing")
    n = check_decode_count(int(ki[-1]) + 1 if ki.size else 0)
    if ki.size <= 1:
        out = np.empty(n, dtype=np.float64)
        if n:
            out[:] = kv[0]
        return out
    idx = np.arange(n, dtype=np.int64)
    seg = np.clip(np.searchsorted(ki, idx, side="right") - 1, 0, ki.size - 2)
    t = (idx - ki[seg]).astype(np.float64)
    span = (ki[seg + 1] - ki[seg]).astype(np.float64)
    with np.errstate(invalid="ignore"):
        out = kv[seg] + (kv[seg + 1] - kv[seg]) * t / span
    out[ki] = kv  # knots are exact (and immune to non-finite neighbors)
    return out


register(Method.VisvalingamWhyatt, compress, decompress)
