"""Run-length encoding (method 15).

Reference: /root/reference/src/lossless_compression/run_length_encoding.zig:37-71
— exact (value: f64, count: u64) pairs. Run equality is *bitwise* so NaN
payloads and -0.0 vs 0.0 are preserved exactly; we compare on the u64 view
to mirror that.

Vectorization: run boundaries via ``np.flatnonzero(bits[1:] != bits[:-1])``,
reconstruction via ``np.repeat``.
"""

from __future__ import annotations

import numpy as np

from ..methods import MAX_DECODE_VALUES, check_decode_count


def compress(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    if v.size == 0:
        return b""
    bits = v.view(np.uint64)
    boundaries = np.flatnonzero(bits[1:] != bits[:-1]) + 1
    starts = np.concatenate(([0], boundaries))
    ends = np.concatenate((boundaries, [v.size]))
    counts = (ends - starts).astype(np.uint64)
    run_values = v[starts]
    out = np.empty(run_values.size * 2, dtype=np.uint64)
    out[0::2] = run_values.view(np.uint64)
    out[1::2] = counts
    return out.tobytes()


def decompress(payload: bytes) -> np.ndarray:
    if len(payload) % 16 != 0:
        raise ValueError("corrupt RLE payload: length % 16 != 0")
    raw = np.frombuffer(payload, dtype=np.uint64)
    values = raw[0::2].view(np.float64)
    counts = raw[1::2].astype(np.int64)
    if counts.size:
        if np.any(counts < 0):
            raise ValueError("corrupt RLE payload: negative run")
        # bound each run first; an int64 sum of several huge (individually
        # < 2^63) runs can wrap past 2^64 back to a small positive value
        # and sneak past the total check, so only trust the vectorized sum
        # when size*max proves overflow impossible — the exact big-int sum
        # is reserved for blobs already in implausible territory
        mx = int(counts.max())
        check_decode_count(mx, "run length")
        if counts.size * mx <= MAX_DECODE_VALUES:
            total = int(counts.sum())
        else:
            total = sum(int(c) for c in counts)
        check_decode_count(total, "total run length")
    return np.repeat(values, counts)
