"""MacaqueS / MacaqueV — error-bounded mantissa rewriting (methods 23,
24), ICDE'26.

Reference semantics:
/root/reference/src/lossy_compression/value_representation/macaque.zig:69-
— MacaqueS computes ``bits_needed`` per value under the absolute error
bound, zeroes the disposable low mantissa bits, and bit-packs the
rewritten values; MacaqueV additionally XORs consecutive rewritten
values with leading/trailing-zero windows (:103-).

Engine realization (fully vectorized):
* disposable bits t = clamp(floor(log2 ε) - (exp - 1023 - 52), 0, 52)
  — zeroing t low mantissa bits perturbs by < 2^(exp-1023-52+t) <= ε;
  ε = 0, subnormals, and non-finite values keep all 52 bits (exact).
* MacaqueS payload: u32 count | [12-bit sign+exponent] | [6-bit
  keep-count] | [variable kept mantissa bits].
* MacaqueV: rewritten bit patterns through the Chimp64 sectioned XOR
  codec (lossless over the rewritten stream, so the ε guarantee is
  unchanged).
"""

from __future__ import annotations

import math

import numpy as np

from ..methods import Method, check_decode_count
from .chimp import _decode_xor_sections, _encode_xor_sections
from .registry import register
from .bitstream import pack_bits, unpack_bits


def _rewrite(v: np.ndarray, eps: float) -> np.ndarray:
    """Zero disposable low mantissa bits under the absolute bound."""
    bits = v.view(np.uint64)
    if eps <= 0:
        return bits.copy()
    exp_field = ((bits >> np.uint64(52)) & np.uint64(0x7FF)).astype(np.int64)
    # value scale 2^(exp-1023); mantissa ulp 2^(exp-1023-52)
    log2eps = math.floor(math.log2(eps))
    t = log2eps - (exp_field - 1023 - 52)
    # keep everything for subnormals (exp 0) and inf/nan (exp 2047)
    t = np.where((exp_field == 0) | (exp_field == 0x7FF), 0, t)
    t = np.clip(t, 0, 52).astype(np.uint64)
    mask = ~((np.uint64(1) << t) - np.uint64(1))
    return bits & mask


def compress_s(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    eps = float((config or {}).get("abs_error_bound", 0.0))
    if eps < 0 or not np.isfinite(eps):
        raise ValueError("abs_error_bound must be finite and >= 0")
    n = v.size
    bits = _rewrite(v, eps)
    signexp = (bits >> np.uint64(52)).astype(np.uint64)  # 12 bits
    mant = bits & np.uint64((1 << 52) - 1)
    # kept bits: 52 - trailing zero count (of the mantissa), i.e. drop
    # the zeroed tail; store keep-count in 6 bits
    tz = np.zeros(n, dtype=np.int64)
    nzm = mant != 0
    if nzm.any():
        m = mant[nzm]
        iso = m & (np.uint64(0) - m)
        # log2 of an exact power of two via float exponent
        tz[nzm] = ((iso.astype(np.float64).view(np.uint64) >> np.uint64(52)).astype(np.int64) - 1023)
    keep = np.where(mant == 0, 0, 52 - tz).astype(np.int64)
    kept_bits = mant >> (np.uint64(52) - keep.astype(np.uint64))
    return b"".join(
        [
            np.uint32(n).tobytes(),
            pack_bits(signexp, 12),
            pack_bits(keep.astype(np.uint64), 6),
            pack_bits(kept_bits, keep),
        ]
    )


def decompress_s(payload: bytes) -> np.ndarray:
    buf = np.frombuffer(payload, dtype=np.uint8)
    n = check_decode_count(buf[:4].view(np.uint32)[0])
    pos = 4
    signexp = unpack_bits(buf[pos:], np.full(n, 12, dtype=np.int64))
    pos += (12 * n + 7) // 8
    keep = unpack_bits(buf[pos:], np.full(n, 6, dtype=np.int64)).astype(np.int64)
    pos += (6 * n + 7) // 8
    kept = unpack_bits(buf[pos:], keep)
    mant = kept << (np.uint64(52) - keep.astype(np.uint64))
    bits = (signexp << np.uint64(52)) | mant
    return bits.view(np.float64)


def compress_v(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    eps = float((config or {}).get("abs_error_bound", 0.0))
    if eps < 0 or not np.isfinite(eps):
        raise ValueError("abs_error_bound must be finite and >= 0")
    bits = _rewrite(v, eps)
    n = v.size
    parts = [np.uint32(n).tobytes(), bits[:1].tobytes()]
    if n > 1:
        parts.extend(_encode_xor_sections(bits[1:] ^ bits[:-1]))
    return b"".join(parts)


def decompress_v(payload: bytes) -> np.ndarray:
    buf = np.frombuffer(payload, dtype=np.uint8)
    n = check_decode_count(buf[:4].view(np.uint32)[0])
    first = buf[4:12].view(np.uint64)[0]
    if n == 1:
        return np.array([first], dtype=np.uint64).view(np.float64)
    xors, _, _ = _decode_xor_sections(buf[12:], n - 1)
    np.bitwise_xor.accumulate(xors, out=xors)
    bits = np.empty(n, dtype=np.uint64)
    bits[0] = first
    bits[1:] = xors ^ first
    return bits.view(np.float64)


register(Method.MacaqueS, compress_s, decompress_s)
register(Method.MacaqueV, compress_v, decompress_v)
