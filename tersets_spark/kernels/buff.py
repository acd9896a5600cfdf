"""BitPackedBUFF — bounded fast floats (method 18), VLDB'21.

Reference semantics:
/root/reference/src/lossy_compression/value_representation/bounded_fast_floats.zig:81-
— decompose each f64 into sign/integer/fraction fixed-point, truncate
the fraction to ``decimal_precision`` digits (Table-2 bit-count lookup
at :54), delta+zigzag the integers, bit-pack. Values with |v| >= 2^32 or
non-finite escape to raw. NOTE the reference's default-config builder
emits ``target_precision`` which its parser does not accept
(configuration.zig:214-221 vs the parsed field) — the engine uses
``decimal_precision`` (SURVEY.md §2 row 18).

Engine realization: fixed-point quantization to 10^-d (error <=
0.5*10^-d), integers through the delta int encoder, non-representable
values through a presence-bitmask raw escape — the same machinery as
the delta codec with a forced scale.
"""

from __future__ import annotations

import numpy as np

from ..methods import Method, check_decode_count
from .bitstream import pack_bits, unpack_bits
from .delta import _decode_ints, _encode_ints
from .registry import register


def compress(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = v.size
    d = int((config or {}).get("decimal_precision", 6))
    if not 1 <= d <= 10:
        raise ValueError("decimal_precision must be in 1..10")
    scale = 10.0**d
    with np.errstate(over="ignore", invalid="ignore"):
        scaled = np.round(v * scale)
        ok = np.isfinite(v) & (np.abs(v) < 2**32) & (np.abs(scaled) < 2**62)
    header = [
        np.uint8(0 if ok.all() else 1).tobytes(),
        np.uint32(n).tobytes(),
        np.uint8(d).tobytes(),
    ]
    if ok.all():
        return b"".join(header) + _encode_ints(scaled.astype(np.int64))
    parts = list(header)
    parts.append(pack_bits(ok.astype(np.uint64), 1))
    if ok.any():
        parts.append(_encode_ints(scaled[ok].astype(np.int64)))
    parts.append(np.ascontiguousarray(v[~ok]).tobytes())
    return b"".join(parts)


def decompress(payload: bytes) -> np.ndarray:
    buf = np.frombuffer(payload, dtype=np.uint8)
    mode = int(buf[0])
    n = check_decode_count(buf[1:5].view(np.uint32)[0])
    d = int(buf[5])
    scale = 10.0**d
    pos = 6
    if mode == 0:
        ints, _ = _decode_ints(buf[pos:], n)
        return ints.astype(np.float64) / scale
    mask = unpack_bits(buf[pos:], np.full(n, 1, dtype=np.int64)).astype(bool)
    pos += (n + 7) // 8
    out = np.empty(n, dtype=np.float64)
    m = int(mask.sum())
    if m:
        ints, used = _decode_ints(buf[pos:], m)
        out[mask] = ints.astype(np.float64) / scale
        pos += used
    if n - m:
        out[~mask] = buf[pos : pos + 8 * (n - m)].view(np.float64)
    return out


register(Method.BitPackedBUFF, compress, decompress)
