"""Bit-packed delta encoding (method 21) — the engine's
"delta-of-delta"-family lossless integer codec.

Reference semantics:
/root/reference/src/lossless_compression/bitpacked_delta_encoding.zig:45-343 —
choose a decimal scale so values become exact i64, store first value +
min-delta-rebased deltas with 2-bit width-class prefixes {8,16,32,64};
values that cannot be scaled exactly fall back to raw f64 (mixed mode with
a presence bitmask). Lossless; rejects non-finite input or |v| > 1e15
(:80-81).

Engine layout (little-endian, numpy-sectioned instead of interleaved so
both directions vectorize — SURVEY.md §7 risk register):

    u8   mode           0 = all-int, 1 = mixed (bitmask + raw f64 escape)
    u32  count          number of values
    f64  scale          decimal scale applied before integerization
    -- mode 0 --
    i64  first          first scaled integer
    i64  min_delta      minimum of consecutive deltas
    [2-bit class per delta]  (count-1 entries, packed MSB-first)
    [class-0 values @8b][class-1 @16b][class-2 @32b][class-3 @64b]
    -- mode 1 --
    [presence bitmask: count bits, 1 = int-representable]
    mode-0 style int section over the representable values
    raw f64 section for the escapes

Width classes mirror the reference's 2-bit prefix scheme
(/root/reference/src/utilities/shared_functions.zig:347-373).
"""

from __future__ import annotations

import numpy as np

from .bitstream import pack_bits, unpack_bits, pack_uint_stream, unpack_uint_stream

_MAX_VALUE = 1e15
_SCALES = 10.0 ** np.arange(0, 15)


class DeltaEncodingError(ValueError):
    pass


def _find_scale(v: np.ndarray) -> tuple[float, np.ndarray]:
    """Smallest power-of-ten scale making every value an exact i64.
    Returns (scale, mask_of_exact_values) for the best scale (the one
    covering the most values; ties -> smallest scale)."""
    best_scale, best_mask, best_n = 1.0, None, -1
    finite = np.isfinite(v) & (np.abs(v) <= _MAX_VALUE)
    for scale in _SCALES:
        with np.errstate(over="ignore", invalid="ignore"):
            scaled = v * scale
        with np.errstate(over="ignore", invalid="ignore"):
            ok = finite & (np.abs(scaled) < 2**62) & (scaled == np.floor(scaled))
        # exactness check is BITWISE: the de-scaled integer must reproduce
        # the original f64 bit pattern (-0.0 and friends escape to raw)
        ints = np.where(ok, scaled, 0.0).astype(np.int64)
        roundtrip = ints.astype(np.float64) / scale
        ok &= roundtrip.view(np.uint64) == v.view(np.uint64)
        n = int(ok.sum())
        if n > best_n:
            best_scale, best_mask, best_n = float(scale), ok, n
        if n == v.size:
            break
    return best_scale, best_mask


def _encode_ints(ints: np.ndarray) -> bytes:
    first = np.int64(ints[0])
    deltas = np.diff(ints)
    if deltas.size == 0:
        return first.tobytes() + np.int64(0).tobytes()
    min_delta = np.int64(deltas.min())
    md_u = np.array([min_delta], dtype=np.int64).view(np.uint64)[0]
    # modular uint64 subtraction: exact non-negative rebase even when the
    # delta span exceeds the int64 range
    rebased = deltas.view(np.uint64) - md_u
    return first.tobytes() + min_delta.tobytes() + pack_uint_stream(rebased)


def _decode_ints(buf: np.ndarray, n: int) -> tuple[np.ndarray, int]:
    """Decode ``n`` integers from ``buf`` (uint8 array); returns (ints,
    bytes_consumed)."""
    first = buf[:8].view(np.int64)[0]
    min_delta = buf[8:16].view(np.int64)[0]
    pos = 16
    if n == 1:
        return np.array([first], dtype=np.int64), pos
    rebased, used = unpack_uint_stream(buf[pos:], n - 1)
    pos += used
    md_u = np.array([min_delta], dtype=np.int64).view(np.uint64)[0]
    deltas = (rebased + md_u).view(np.int64)
    ints = np.empty(n, dtype=np.int64)
    ints[0] = first
    np.cumsum(deltas, out=ints[1:])
    ints[1:] += first
    return ints, pos


def compress(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = v.size
    if n == 0:
        return b""
    if n >= 2**31:
        raise DeltaEncodingError("too many values for delta encoding")
    scale, mask = _find_scale(v)
    header = [
        np.uint8(0 if mask.all() else 1).tobytes(),
        np.uint32(n).tobytes(),
        np.float64(scale).tobytes(),
    ]
    if mask.all():
        ints = np.round(v * scale).astype(np.int64)
        return b"".join(header) + _encode_ints(ints)
    # mixed mode
    parts = list(header)
    parts.append(pack_bits(mask.astype(np.uint64), 1))
    n_ok = int(mask.sum())
    if n_ok:
        ints = np.round(v[mask] * scale).astype(np.int64)
        parts.append(_encode_ints(ints))
    parts.append(np.ascontiguousarray(v[~mask]).tobytes())
    return b"".join(parts)


def decompress(payload: bytes) -> np.ndarray:
    if len(payload) == 0:
        return np.empty(0, dtype=np.float64)
    buf = np.frombuffer(payload, dtype=np.uint8)
    mode = int(buf[0])
    n = int(buf[1:5].view(np.uint32)[0])
    scale = buf[5:13].view(np.float64)[0]
    pos = 13
    if mode == 0:
        ints, _ = _decode_ints(buf[pos:], n)
        return ints.astype(np.float64) / scale
    mask_bits = unpack_bits(buf[pos:], np.full(n, 1, dtype=np.int64)).astype(bool)
    pos += (n + 7) // 8
    out = np.empty(n, dtype=np.float64)
    n_ok = int(mask_bits.sum())
    if n_ok:
        ints, used = _decode_ints(buf[pos:], n_ok)
        out[mask_bits] = ints.astype(np.float64) / scale
        pos += used
    n_raw = n - n_ok
    if n_raw:
        out[~mask_bits] = buf[pos : pos + 8 * n_raw].view(np.float64)
    return out
