"""SerfQT — streaming delta-vs-prediction quantization (method 17).

Reference semantics (SIGMOD'25):
/root/reference/src/lossy_compression/value_representation/serf_qt.zig:42-109
— ``q = round((v - prev) / bucket)``, zigzag + 1, Elias-Gamma coded;
the predictor advances ``prev += q * bucket``
(Elias-Gamma codec: shared_functions.zig:225-292, zigzag :197-217).

Vectorization note: because the predictor always sits on the grid
``first + k*bucket``, the sequential recurrence collapses to
``k_i = round((v_i - first)/bucket)`` and ``q_i = diff(k_i)`` — the same
reconstruction levels as the reference's streaming loop (modulo
round-half tie direction), computable in one vectorized pass. Error
per point ≤ bucket/2 ≤ ε.

Engine payload:
    u8  mode       0 = grid, 1 = raw escape (ε=0, non-finite present,
                   or grid-index precision guard)
    u32 count
    f64 first      (grid origin; mode 0)
    f64 bucket
    elias-gamma section of zigzag(q)+1
"""

from __future__ import annotations

import numpy as np

from ..methods import Method, check_decode_count, QUANTIZATION_BUCKET_FACTOR
from .bitstream import (
    pack_elias_gamma,
    unpack_elias_gamma,
    zigzag_decode,
    zigzag_encode,
)
from .registry import register


def compress(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = v.size
    eps = float((config or {}).get("abs_error_bound", 0.0))
    bucket = QUANTIZATION_BUCKET_FACTOR * eps if eps > 0 else 0.0
    usable = eps > 0 and bool(np.isfinite(v).all())
    if usable:
        k = np.round((v - v[0]) / bucket)
        usable = bool(np.abs(k).max() < 2**52)
    if not usable:
        return np.uint8(1).tobytes() + np.uint32(n).tobytes() + v.tobytes()
    q = np.diff(k, prepend=0.0).astype(np.int64)
    coded = zigzag_encode(q) + np.uint64(1)
    return (
        np.uint8(0).tobytes()
        + np.uint32(n).tobytes()
        + np.float64(v[0]).tobytes()
        + np.float64(bucket).tobytes()
        + pack_elias_gamma(coded)
    )


def decompress(payload: bytes) -> np.ndarray:
    buf = np.frombuffer(payload, dtype=np.uint8)
    mode = int(buf[0])
    n = check_decode_count(buf[1:5].view(np.uint32)[0])
    if mode == 1:
        return buf[5 : 5 + 8 * n].view(np.float64).copy()
    first = buf[5:13].view(np.float64)[0]
    bucket = buf[13:21].view(np.float64)[0]
    coded, _ = unpack_elias_gamma(buf[21:])
    q = zigzag_decode(coded - np.uint64(1))
    k = np.cumsum(q).astype(np.float64)
    return first + k * bucket


register(Method.SerfQT, compress, decompress)
