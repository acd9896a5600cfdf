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

from ..methods import Method
from .registry import register
from .segmentation import finite_runs, first_violation


def _segments_midrange(v: np.ndarray, s: int, e: int, eps: float):
    """Greedy midrange runs over finite v[s:e]; yields (value, end_excl)."""
    while s < e:
        def scan(hi: int, s=s) -> int:
            x = v[s:hi]
            cmax = np.maximum.accumulate(x)
            cmin = np.minimum.accumulate(x)
            bad = (cmax - cmin) > 2 * eps
            idx = np.flatnonzero(bad)
            return s + int(idx[0]) if idx.size else -1

        stop = max(first_violation(e, s, scan), s + 1)  # always advance
        seg = v[s:stop]
        yield (float(seg.max()) + float(seg.min())) / 2, stop
        s = stop


def _segments_mean(v: np.ndarray, s: int, e: int, eps: float):
    while s < e:
        def scan(hi: int, s=s) -> int:
            x = v[s:hi]
            cmax = np.maximum.accumulate(x)
            cmin = np.minimum.accumulate(x)
            cmean = np.cumsum(x) / np.arange(1, x.size + 1)
            bad = ((cmax - cmean) > eps) | ((cmean - cmin) > eps)
            idx = np.flatnonzero(bad)
            return s + int(idx[0]) if idx.size else -1

        stop = max(first_violation(e, s, scan), s + 1)  # always advance
        yield float(v[s:stop].mean()), stop
        s = stop


def _compress(v: np.ndarray, eps: float, segfn) -> bytes:
    if eps < 0 or not np.isfinite(eps):
        raise ValueError("abs_error_bound must be a finite value >= 0")
    values: list[float] = []
    ends: list[int] = []
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
        for val, stop in segfn(v, s, e, eps):
            values.append(val)
            ends.append(stop)
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
    starts = np.concatenate(([0], ends[:-1]))
    return np.repeat(vals, ends - starts)


register(Method.PoorMansCompressionMidrange, compress_midrange, decompress)
register(Method.PoorMansCompressionMean, compress_mean, decompress)
