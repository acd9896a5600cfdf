"""Poor Man's Compression — Midrange (method 1) and Mean (method 2).

Reference semantics:
/root/reference/src/lossy_compression/functional_approximation/poor_mans_compression.zig:42-206
— streaming constant model. Midrange: grow the run while
``max - min <= 2ε``, emit ``(max+min)/2``; Mean: grow while
``max - mean <= ε and mean - min <= ε``, emit the running mean (the
reference uses an f80 accumulator at :87-91; the engine uses f64 prefix
sums — divergence documented, bound still enforced because the check
uses the same accumulator as the emitted value). ε = 0 takes the exact
change-point path (:59-85), which is lossless.

Engine payload: ``(value f64, end_index_exclusive u64)`` pairs — same
pair structure as the reference (decompress requires len % 16 == 0,
:217). Decompress is ``np.repeat``. Non-finite values are emitted as
exact singleton runs.
"""

from __future__ import annotations

import numpy as np

from ..methods import Method, check_decode_count
from .registry import register
from .segmentation import finite_runs, first_violation


def _max_feasible_window(x: np.ndarray, bound: float) -> np.ndarray:
    """For every start i, the exclusive end of the longest window with
    max - min <= bound — fully vectorized: O(n log n) sparse range
    min/max tables + a vectorized binary search over window lengths
    (feasibility is monotone in length, so the first violation equals
    the first infeasible window — same stopping point as the
    reference's streaming loop)."""
    n = x.size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    K = max(int(n).bit_length(), 1)
    maxt = np.empty((K, n), dtype=np.float64)
    mint = np.empty((K, n), dtype=np.float64)
    maxt[0] = x
    mint[0] = x
    for k in range(1, K):
        h = 1 << (k - 1)
        m = n - (1 << k) + 1
        if m <= 0:
            maxt[k, :] = maxt[k - 1, :]
            mint[k, :] = mint[k - 1, :]
            continue
        maxt[k, :m] = np.maximum(maxt[k - 1, :m], maxt[k - 1, h : h + m])
        mint[k, :m] = np.minimum(mint[k - 1, :m], mint[k - 1, h : h + m])
        maxt[k, m:] = maxt[k - 1, m:]
        mint[k, m:] = mint[k - 1, m:]

    idx = np.arange(n, dtype=np.int64)

    def feasible(length: np.ndarray) -> np.ndarray:
        # range query over [i, i+length) with k = floor(log2(length));
        # frexp exponent is exact for integer lengths < 2^53
        k = np.frexp(length.astype(np.float64))[1].astype(np.int64) - 1
        j = idx + length - (1 << k)
        rmax = np.maximum(maxt[k, idx], maxt[k, j])
        rmin = np.minimum(mint[k, idx], mint[k, j])
        return (rmax - rmin) <= bound

    lo = np.ones(n, dtype=np.int64)  # single point always feasible
    hi = (n - idx).astype(np.int64)
    while (lo < hi).any():
        mid = (lo + hi + 1) // 2
        ok = feasible(np.minimum(mid, n - idx))
        lo = np.where(ok, mid, lo)
        hi = np.where(ok, hi, mid - 1)
    return idx + lo  # exclusive end per start


def _segments_midrange(v: np.ndarray, s: int, e: int, eps: float, vl: list | None = None):
    """Greedy midrange runs over finite v[s:e]; returns parallel lists
    (values, ends_exclusive). Window ends are precomputed vectorized;
    the chain walk is plain int indexing; segment midranges come from
    two reduceat passes."""
    x = v[s:e]
    n = x.size
    ends_all = _max_feasible_window(x, 2 * eps).tolist()
    starts = []
    i = 0
    while i < n:  # pure-Python chain walk, no numpy inside
        starts.append(i)
        i = max(ends_all[i], i + 1)
    st = np.asarray(starts, dtype=np.int64)
    vmax = np.maximum.reduceat(x, st)
    vmin = np.minimum.reduceat(x, st)
    seg_ends = np.append(st[1:], n) + s
    # list-pair return (not a generator): ~1.3x — segments are short on
    # noisy data, so per-yield resume overhead dominates otherwise
    return ((vmax + vmin) / 2).tolist(), seg_ends.tolist()


def _segments_mean(v: np.ndarray, s: int, e: int, eps: float, vl: list | None = None):
    """Greedy mean runs, returned as parallel lists (values,
    ends_exclusive). Short segments (the common case) scan in plain
    Python over a list snapshot — scalar arithmetic and list indexing
    beat numpy per-call overhead ~5x there; long runs fall back to the
    vectorized gallop."""
    _PY_N = 32
    if vl is None:
        vl = v.tolist()
    out_v: list[float] = []
    out_e: list[int] = []
    while s < e:
        vmax = vmin = vsum = vl[s]
        j = s + 1
        stop_py = min(s + _PY_N, e)
        stop = -1
        while j < stop_py:
            x = vl[j]
            nmax = x if x > vmax else vmax
            nmin = x if x < vmin else vmin
            nsum = vsum + x
            nmean = nsum / (j - s + 1)
            if (nmax - nmean) > eps or (nmean - nmin) > eps:
                stop = j
                break
            vmax, vmin, vsum = nmax, nmin, nsum
            j += 1
        else:
            if stop_py == e:
                stop = e
        if stop < 0:  # undecided within the Python window: numpy gallop
            def scan(hi: int, s=s) -> int:
                x = v[s:hi]
                cmax = np.maximum.accumulate(x)
                cmin = np.minimum.accumulate(x)
                cmean = np.cumsum(x) / np.arange(1, x.size + 1)
                bad = ((cmax - cmean) > eps) | ((cmean - cmin) > eps)
                idx = np.flatnonzero(bad)
                return s + int(idx[0]) if idx.size else -1

            stop = max(first_violation(e, s, scan), s + 1)
            out_v.append(float(v[s:stop].mean()))
            out_e.append(stop)
        else:
            stop = max(stop, s + 1)
            out_v.append(vsum / (stop - s))
            out_e.append(stop)
        s = stop
    return out_v, out_e


def _compress(v: np.ndarray, eps: float, segfn) -> bytes:
    if eps < 0 or not np.isfinite(eps):
        raise ValueError("abs_error_bound must be a finite value >= 0")
    values: list[float] = []
    ends: list[int] = []
    vl: list | None = None
    for s, e, is_finite in finite_runs(v):
        if not is_finite:
            values.append(float(v[s]))
            ends.append(e)
            continue
        if eps == 0.0:
            # exact change-point path (reference :59-85): boundaries where
            # the value changes
            x = v[s:e]
            b = np.flatnonzero(x[1:] != x[:-1]) + 1
            starts = np.concatenate(([0], b)).astype(np.int64)
            stops = np.concatenate((b, [x.size])).astype(np.int64)
            values.extend(x[starts].tolist())
            ends.extend((stops + s).tolist())
            continue
        if vl is None and segfn is _segments_mean:
            vl = v.tolist()  # once per series, shared across runs
        seg_v, seg_e = segfn(v, s, e, eps, vl)
        values.extend(seg_v)
        ends.extend(seg_e)
    out = np.empty(2 * len(values), dtype=np.uint64)
    out[0::2] = np.asarray(values, dtype=np.float64).view(np.uint64)
    out[1::2] = np.asarray(ends, dtype=np.uint64)
    return out.tobytes()


def compress_midrange(values: np.ndarray, config: dict | None = None) -> bytes:
    eps = float((config or {}).get("abs_error_bound", 0.0))
    return _compress(np.ascontiguousarray(values, dtype=np.float64), eps, _segments_midrange)


def compress_mean(values: np.ndarray, config: dict | None = None) -> bytes:
    eps = float((config or {}).get("abs_error_bound", 0.0))
    return _compress(np.ascontiguousarray(values, dtype=np.float64), eps, _segments_mean)


def decompress(payload: bytes) -> np.ndarray:
    if len(payload) % 16 != 0:
        raise ValueError("corrupt PMC payload: length % 16 != 0")
    raw = np.frombuffer(payload, dtype=np.uint64)
    vals = raw[0::2].view(np.float64)
    ends = raw[1::2].astype(np.int64)
    if ends.size:
        check_decode_count(ends.max(initial=0), "segment end")
        if int(ends[0]) < 0 or np.any(np.diff(ends) < 0):
            raise ValueError("corrupt PMC payload: ends not nondecreasing")
    starts = np.concatenate(([0], ends[:-1]))
    return np.repeat(vals, ends - starts)


register(Method.PoorMansCompressionMidrange, compress_midrange, decompress)
register(Method.PoorMansCompressionMean, compress_mean, decompress)
