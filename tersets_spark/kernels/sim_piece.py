"""Sim-Piece — PLA with quantized intercepts and segment grouping
(method 6).

Reference semantics (Kitsios VLDB'23):
/root/reference/src/lossy_compression/functional_approximation/sim_piece.zig
— phase 1 (:319-408): swing-style ε-segments whose intercept is the
start value quantized to ``floor(v/ε)*ε`` (:610-615); phase 2
(:413-521): per-intercept greedy merge of slope intervals (sort by lower
slope, intersect while possible); phases 3-4 (:527-605): group and
serialize. Requires ε > 0 (:62-64); ε is margin-shrunk (:326). Rejects
non-finite or |v| > 1e15 (:333-334, 349-351) — the engine instead
escapes such points as exact singleton segments.

Engine payload (columnar dictionary layout — same sharing the reference
achieves by grouping, but en/decodable as vectorized sections):

    u32 n            original series length
    u32 n_seg
    u32 n_intercepts
    u32 n_slopes
    f64 intercepts[n_intercepts]
    f64 slopes[n_slopes]
    uint_stream seg starts (ascending; delta coded: first then diffs)
    uint_stream intercept_id per segment
    uint_stream slope_id per segment

Decompress: segment k covers [start_k, start_{k+1}) and evaluates
``intercept + slope * (pos - start_k)`` — fully vectorized via
np.repeat + segment-local arange.
"""

from __future__ import annotations

import numpy as np

from ..methods import ERROR_BOUND_MARGIN, Method, check_decode_count
from .bitstream import pack_uint_stream, segment_intra_indices, unpack_uint_stream
from .registry import register
from .segmentation import finite_runs, first_violation

__all__ = [
    "compress",
    "decompress",
    "phase1_segments",
    "merge_slope_intervals",
    "serialize_segments",
]


def phase1_segments(v: np.ndarray, eps: float, quantize: str = "floor"):
    """Swing-style ε-segments with quantized intercept at the segment
    start. Yields (start, end_exclusive, intercept, slope_lo, slope_hi).
    ``quantize``: 'floor' (Sim-Piece) or 'best' (Mix-Piece phase 1 —
    tries floor and ceil, keeps whichever lasts longer,
    mix_piece.zig:597-808)."""
    eff = max(eps - ERROR_BOUND_MARGIN, 0.0)

    vl = v.tolist()  # plain floats: the scalar scan below is
    # indexing-bound, and list access is ~3x cheaper than numpy scalars

    def run_from(s: int, e: int, b: float):
        """Longest feasible segment from s with intercept b; returns
        (end_exclusive, intercept, lo, hi)."""
        if not np.isfinite(b) or abs(vl[s] - b) > eps:
            # quantization out of bound (precision loss on huge values):
            # escape to an exact singleton
            return s + 1, float(v[s]), 0.0, 0.0

        # plain-Python fast path for short segments (tight bounds make
        # ~8-point segments the common case; interpreter arithmetic
        # beats numpy per-call overhead there)
        _PY_N = 24
        up = np.inf
        lo = -np.inf
        j = s + 1
        stop_py = min(s + 1 + _PY_N, e)
        while j < stop_py:
            dt = j - s
            dy = vl[j] - b
            nup = (dy + eff) / dt
            nlo = (dy - eff) / dt
            p_up, p_lo = up, lo
            if nup < up:
                up = nup
            if nlo > lo:
                lo = nlo
            if lo > up:
                if dt == 1:
                    return s + 1, b, 0.0, 0.0
                return j, b, p_lo, p_up
            j += 1
        if stop_py == e:
            if e == s + 1:
                return s + 1, b, 0.0, 0.0
            return e, b, float(lo), float(up)

        def scan(hi_abs: int) -> int:
            j = np.arange(s + 1, hi_abs, dtype=np.float64)
            if j.size == 0:
                return -1
            x = v[s + 1 : hi_abs]
            dt = j - s
            up = np.minimum.accumulate((x + eff - b) / dt)
            lo = np.maximum.accumulate((x - eff - b) / dt)
            idx = np.flatnonzero(lo > up)
            return s + 1 + int(idx[0]) if idx.size else -1

        stop = first_violation(e, s + 1, scan)
        end = stop  # exclusive
        if end <= s + 1:
            return s + 1, b, 0.0, 0.0
        x = v[s + 1 : end]
        dt = np.arange(1, x.size + 1, dtype=np.float64)
        return end, b, float(np.max((x - eff - b) / dt)), float(np.min((x + eff - b) / dt))

    for rs, re, is_finite in finite_runs(v):
        if not is_finite:
            yield rs, rs + 1, float(v[rs]), 0.0, 0.0
            continue
        s = rs
        while s < re:
            # np.floor, not math.floor: v/eps can overflow to inf at
            # subnormal eps, which math.floor raises on while np.floor
            # propagates into the singleton-escape path
            b_floor = float(np.floor(vl[s] / eps) * eps)
            if quantize == "best":
                b_ceil = float(np.ceil(vl[s] / eps) * eps)
                endf, bf, lof, hif = run_from(s, re, b_floor)
                endc, bc, loc, hic = run_from(s, re, b_ceil)
                if endc > endf:
                    yield s, endc, bc, loc, hic
                    s = endc
                else:
                    yield s, endf, bf, lof, hif
                    s = endf
            else:
                end, b, lo, hi = run_from(s, re, b_floor)
                yield s, end, b, lo, hi
                s = end


def merge_slope_intervals(segs: list[tuple]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Phase 2+3: group segments by exact intercept bits, sort each group
    by lower slope, greedily intersect intervals; one shared slope per
    merged group (midpoint of the running intersection — reference
    sim_piece.zig:413-521). Returns per-segment (starts, intercepts,
    slopes) sorted by start."""
    starts = np.array([s[0] for s in segs], dtype=np.int64)
    intercepts = np.array([s[2] for s in segs], dtype=np.float64)
    los = np.array([s[3] for s in segs], dtype=np.float64)
    his = np.array([s[4] for s in segs], dtype=np.float64)
    # group on exact f64 bit patterns (reference uses a bitcast-keyed
    # hashmap, shared_structs.zig:77-91)
    keys = intercepts.view(np.uint64)
    order = np.lexsort((los, keys))
    k_sorted = keys[order]
    group_breaks = np.flatnonzero(k_sorted[1:] != k_sorted[:-1]) + 1
    bounds = np.concatenate(([0], group_breaks, [len(segs)])).tolist()
    # plain-Python loop state: the greedy intersect walks every segment
    # once and list indexing is ~5x cheaper than numpy scalars here
    los_l = los.tolist()
    his_l = his.tolist()
    order_l = order.tolist()
    inf = float("inf")
    slopes_out = [0.0] * len(segs)
    for gi in range(len(bounds) - 1):
        idx = order_l[bounds[gi] : bounds[gi + 1]]
        cur_lo, cur_hi = -inf, inf
        members: list[int] = []
        for si in idx:
            lo = los_l[si]
            hi = his_l[si]
            if max(cur_lo, lo) <= min(cur_hi, hi) and members or not members:
                cur_lo, cur_hi = max(cur_lo, lo), min(cur_hi, hi)
                members.append(si)
            else:
                shared = (cur_lo + cur_hi) / 2
                for m in members:
                    slopes_out[m] = shared
                cur_lo, cur_hi, members = lo, hi, [si]
        if members:
            shared = (cur_lo + cur_hi) / 2
            for m in members:
                slopes_out[m] = shared
    slopes = np.asarray(slopes_out, dtype=np.float64)
    srt = np.argsort(starts, kind="stable")
    return starts[srt], intercepts[srt], slopes[srt]


def serialize_segments(
    n: int, starts: np.ndarray, intercepts: np.ndarray, slopes: np.ndarray
) -> bytes:
    uniq_b, b_ids = np.unique(intercepts.view(np.uint64), return_inverse=True)
    uniq_a, a_ids = np.unique(slopes.view(np.uint64), return_inverse=True)
    start_deltas = np.diff(starts, prepend=0).astype(np.uint64)
    return b"".join(
        [
            np.uint32(n).tobytes(),
            np.uint32(starts.size).tobytes(),
            np.uint32(uniq_b.size).tobytes(),
            np.uint32(uniq_a.size).tobytes(),
            uniq_b.tobytes(),
            uniq_a.tobytes(),
            pack_uint_stream(start_deltas),
            pack_uint_stream(b_ids.astype(np.uint64)),
            pack_uint_stream(a_ids.astype(np.uint64)),
        ]
    )


def compress(values: np.ndarray, config: dict | None = None) -> bytes:
    eps = float((config or {}).get("abs_error_bound", 0.0))
    if eps <= 0:
        raise ValueError("SimPiece requires abs_error_bound > 0")  # :62-64
    v = np.ascontiguousarray(values, dtype=np.float64)
    segs = list(phase1_segments(v, eps, quantize="floor"))
    starts, intercepts, slopes = merge_slope_intervals(segs)
    return serialize_segments(v.size, starts, intercepts, slopes)


def decompress(payload: bytes) -> np.ndarray:
    buf = np.frombuffer(payload, dtype=np.uint8)
    n = check_decode_count(buf[0:4].view(np.uint32)[0])
    n_seg = int(buf[4:8].view(np.uint32)[0])
    n_b = int(buf[8:12].view(np.uint32)[0])
    n_a = int(buf[12:16].view(np.uint32)[0])
    pos = 16
    uniq_b = buf[pos : pos + 8 * n_b].view(np.float64)
    pos += 8 * n_b
    uniq_a = buf[pos : pos + 8 * n_a].view(np.float64)
    pos += 8 * n_a
    deltas, used = unpack_uint_stream(buf[pos:], n_seg)
    pos += used
    b_ids, used = unpack_uint_stream(buf[pos:], n_seg)
    pos += used
    a_ids, _ = unpack_uint_stream(buf[pos:], n_seg)
    starts = np.cumsum(deltas.astype(np.int64))
    lengths = np.diff(np.append(starts, n))
    intercept_per_pt = np.repeat(uniq_b[b_ids.astype(np.int64)], lengths)
    slope_per_pt = np.repeat(uniq_a[a_ids.astype(np.int64)], lengths)
    intra = segment_intra_indices(lengths).astype(np.float64)
    return intercept_per_pt + slope_per_pt * intra


register(Method.SimPiece, compress, decompress)
