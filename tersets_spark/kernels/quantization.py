"""Bit-packed uniform scalar quantization (method 14).

Reference semantics:
/root/reference/src/lossy_compression/value_representation/bitpacked_quantization.zig:45-123
— bucket size = 1.998·ε (shared_functions.zig:324-326), store min +
bucket + packed bucket indices; ε = 0 switches to the lossless
order-preserving bit-diff-vs-min path via ``floatBitsOrdered``
(shared_functions.zig:298-305). Rejects non-finite input (:64) — the
engine escapes non-finite values through a presence bitmask instead.

Engine payload:
    u8  mode        0 = quantized, 1 = ordered-bits lossless (ε=0 or
                    index-precision guard), 2 = mode-0 with escape mask
    u32 count
    f64 min (mode 0/2) | u64 ordered-min (mode 1)
    f64 bucket (mode 0/2)
    [mode 2: presence bitmask, count bits]
    uint_stream indices / ordered diffs
    [mode 2: raw f64 escapes]
"""

from __future__ import annotations

import numpy as np

from ..methods import Method, check_decode_count, QUANTIZATION_BUCKET_FACTOR
from .bitstream import (
    float_bits_ordered,
    float_bits_unordered,
    pack_bits,
    pack_uint_stream,
    unpack_bits,
    unpack_uint_stream,
)
from .registry import register


def compress(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = v.size
    eps = float((config or {}).get("abs_error_bound", 0.0))
    finite = np.isfinite(v)
    header = [np.uint8(0).tobytes(), np.uint32(n).tobytes()]
    if eps > 0 and finite.all():
        vmin = float(v.min())
        bucket = QUANTIZATION_BUCKET_FACTOR * eps
        idx = np.round((v - vmin) / bucket)
        # precision guard: indices beyond 2^52 can't round-trip within ε
        if idx.max() < 2**52:
            header.append(np.float64(vmin).tobytes())
            header.append(np.float64(bucket).tobytes())
            return b"".join(header) + pack_uint_stream(idx.astype(np.uint64))
    if eps > 0 and finite.any() and not finite.all():
        sub = v[finite]
        vmin = float(sub.min())
        bucket = QUANTIZATION_BUCKET_FACTOR * eps
        idx = np.round((sub - vmin) / bucket)
        if idx.max() < 2**52:
            parts = [
                np.uint8(2).tobytes(),
                np.uint32(n).tobytes(),
                np.float64(vmin).tobytes(),
                np.float64(bucket).tobytes(),
                pack_bits(finite.astype(np.uint64), 1),
                pack_uint_stream(idx.astype(np.uint64)),
                np.ascontiguousarray(v[~finite]).tobytes(),
            ]
            return b"".join(parts)
    # ε = 0 (or guard tripped): lossless order-preserving bit diff vs min
    ordered = float_bits_ordered(v)
    omin = ordered.min() if n else np.uint64(0)
    parts = [
        np.uint8(1).tobytes(),
        np.uint32(n).tobytes(),
        np.uint64(omin).tobytes(),
        pack_uint_stream(ordered - omin),
    ]
    return b"".join(parts)


def decompress(payload: bytes) -> np.ndarray:
    buf = np.frombuffer(payload, dtype=np.uint8)
    mode = int(buf[0])
    n = check_decode_count(buf[1:5].view(np.uint32)[0])
    if mode == 1:
        omin = buf[5:13].view(np.uint64)[0]
        diffs, _ = unpack_uint_stream(buf[13:], n)
        return float_bits_unordered(diffs + omin)
    vmin = buf[5:13].view(np.float64)[0]
    bucket = buf[13:21].view(np.float64)[0]
    pos = 21
    if mode == 0:
        idx, _ = unpack_uint_stream(buf[pos:], n)
        return vmin + idx.astype(np.float64) * bucket
    mask = unpack_bits(buf[pos:], np.full(n, 1, dtype=np.int64)).astype(bool)
    pos += (n + 7) // 8
    out = np.empty(n, dtype=np.float64)
    m = int(mask.sum())
    idx, used = unpack_uint_stream(buf[pos:], m)
    out[mask] = vmin + idx.astype(np.float64) * bucket
    pos += used
    out[~mask] = buf[pos : pos + 8 * (n - m)].view(np.float64)
    return out


register(Method.BitPackedQuantization, compress, decompress)
