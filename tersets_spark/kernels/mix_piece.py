"""Mix-Piece — Sim-Piece with mixed intercept quantization and
cross-intercept slope grouping (method 13).

Reference semantics (Kitsios VLDBJ'24):
/root/reference/src/lossy_compression/functional_approximation/mix_piece.zig
— phase 1 (:597-808) tracks floor- and ceil-quantized intercepts
simultaneously and keeps whichever segment lasts longer; phase 2
(:816-1073) emits three part types: same-intercept groups,
cross-intercept same-slope groups (:945-1050), and ungrouped leftovers.

The engine reuses Sim-Piece's phase machinery: phase 1 runs in 'best'
quantization mode (floor vs ceil, longer wins); phase 2 does the
intercept-group slope merge, then a second greedy interval-intersection
pass over the segments whose intercept group is a singleton — the
cross-intercept same-slope grouping. Payload container is identical to
Sim-Piece's columnar dictionary layout (slope sharing appears as a
smaller slope dictionary), distinguished only by the method byte.
"""

from __future__ import annotations

import numpy as np

from ..methods import Method
from .registry import register
from .sim_piece import (
    decompress,
    merge_slope_intervals,
    phase1_segments,
    serialize_segments,
)


def compress(values: np.ndarray, config: dict | None = None) -> bytes:
    eps = float((config or {}).get("abs_error_bound", 0.0))
    if eps <= 0:
        raise ValueError("MixPiece requires abs_error_bound > 0")
    v = np.ascontiguousarray(values, dtype=np.float64)
    segs = list(phase1_segments(v, eps, quantize="best"))
    starts, intercepts, slopes = merge_slope_intervals(segs)
    # cross-intercept same-slope grouping over segments whose intercept
    # occurs exactly once (mix_piece.zig:945-1050): sort their feasible
    # slope intervals by lower bound and greedily intersect.
    seg_by_start = sorted(segs, key=lambda t: t[0])
    los = np.array([s[3] for s in seg_by_start], dtype=np.float64)
    his = np.array([s[4] for s in seg_by_start], dtype=np.float64)
    keys = intercepts.view(np.uint64)
    uniq, counts = np.unique(keys, return_counts=True)
    singleton_keys = set(uniq[counts == 1].tolist())
    lone = np.flatnonzero(np.isin(keys, np.fromiter(singleton_keys, dtype=np.uint64)))
    if lone.size > 1:
        order = lone[np.argsort(los[lone], kind="stable")]
        cur_lo, cur_hi = -np.inf, np.inf
        members: list[int] = []
        for si in order:
            lo, hi = los[si], his[si]
            if not members or max(cur_lo, lo) <= min(cur_hi, hi):
                cur_lo, cur_hi = max(cur_lo, lo), min(cur_hi, hi)
                members.append(si)
            else:
                slopes[members] = (cur_lo + cur_hi) / 2
                cur_lo, cur_hi, members = lo, hi, [si]
        if members:
            slopes[members] = (cur_lo + cur_hi) / 2
    return serialize_segments(v.size, starts, intercepts, slopes)


register(Method.MixPiece, compress, decompress)
