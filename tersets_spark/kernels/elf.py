"""Elf — erase-based lossless float compression (method 26), VLDB'23.

Reference semantics:
/root/reference/src/lossless_compression/elf.zig:107- — per value,
compute β (significant decimal digits), zero the mantissa "noise" bits
that are recoverable from the decimal representation, store β* in 4
bits, then Chimp-style XOR over the erased values; exact
negative-power-of-ten sentinel handling (:66-86).

Engine realization (verification-driven, guaranteed lossless):
* β = significant decimal digits via the shortest round-trip repr;
  erase t = 52 - (ceil(β·log2 10) + 1) low mantissa bits, clamped.
* recovery formula: round(erased, β - 1 - floor(log10 |erased|)) —
  applied identically by the decoder.
* compress VERIFIES recovery bitwise per value; failures fall back to
  the unerased bit pattern with flag 0, so the round-trip is always
  bit-exact regardless of decimal corner cases.
* payload: u32 count | [1-bit erased flag] | [4-bit β-1 for erased] |
  Chimp64 XOR sections over the (erased) bit stream.
"""

from __future__ import annotations

import numpy as np

from ..methods import Method, check_decode_count
from .chimp import _decode_xor_sections, _encode_xor_sections
from .bitstream import pack_bits, unpack_bits
from .registry import register

_LOG2_10 = 3.321928094887362


def _beta(v: np.ndarray) -> np.ndarray:
    """Significant decimal digits per value (1..17), vectorized.

    Estimate: the smallest k with v*10^k an exact integer gives the
    decimal-place count; significant digits = floor(log10|v|) + k + 1.
    Values that aren't short decimals keep beta=17 (their erasure will
    fail the compress-time verification and they are stored unerased —
    losslessness never depends on this estimate being right)."""
    n = v.size
    out = np.full(n, 17, dtype=np.int64)
    finite = np.isfinite(v) & (v != 0.0)
    if not finite.any():
        out[~np.isfinite(v) | (v == 0.0)] = 1
        return out
    x = np.abs(v)
    k = np.full(n, -1, dtype=np.int64)
    with np.errstate(over="ignore", invalid="ignore"):
        for kk in range(16):
            scaled = x * (10.0**kk)
            exact = (
                finite
                & (k < 0)
                & (scaled < 2**53)
                & (scaled == np.floor(scaled))
            )
            k[exact] = kk
        mag = np.full(n, 0, dtype=np.int64)
        mag[finite] = np.floor(np.log10(x[finite])).astype(np.int64)
    have = k >= 0
    out[have] = np.clip(mag[have] + k[have] + 1, 1, 17)
    out[~np.isfinite(v) | (v == 0.0)] = 1
    return out


def _decimal_round(v: np.ndarray, beta: np.ndarray) -> np.ndarray:
    """round(v, beta - 1 - floor(log10 |v|)) — shared by encoder
    (verification) and decoder (recovery)."""
    out = v.copy()
    nz = np.isfinite(v) & (v != 0)
    if nz.any():
        with np.errstate(divide="ignore"):
            mag = np.floor(np.log10(np.abs(v[nz]))).astype(np.int64)
        dec = (beta[nz] - 1 - mag).astype(np.int64)
        sub = v[nz].copy()
        # np.round with per-element decimals: group by decimal count
        with np.errstate(invalid="ignore", over="ignore"):
            for d in np.unique(dec):
                m = dec == d
                sub[m] = np.round(sub[m], int(d))
        out[nz] = sub
    return out


def compress(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = v.size
    bits = v.view(np.uint64)
    beta = _beta(v)
    needed = np.ceil(beta * _LOG2_10).astype(np.int64) + 1
    t = np.clip(52 - needed, 0, 52).astype(np.uint64)
    mask = ~((np.uint64(1) << t) - np.uint64(1))
    erased_bits = bits & mask
    erased = erased_bits.view(np.float64)
    # verification: keep the erasure only where decimal recovery is
    # bit-exact (guaranteed losslessness)
    recovered = _decimal_round(erased, beta)
    ok = (recovered.view(np.uint64) == bits) & (t > 0) & np.isfinite(v)
    stream = np.where(ok, erased_bits, bits)
    parts = [np.uint32(n).tobytes(), pack_bits(ok.astype(np.uint64), 1)]
    if ok.any():
        parts.append(pack_bits((beta[ok] - 1).astype(np.uint64), 4))
    parts.append(stream[:1].tobytes())
    if n > 1:
        parts.extend(_encode_xor_sections(stream[1:] ^ stream[:-1]))
    return b"".join(parts)


def decompress(payload: bytes) -> np.ndarray:
    buf = np.frombuffer(payload, dtype=np.uint8)
    n = check_decode_count(buf[:4].view(np.uint32)[0])
    pos = 4
    ok = unpack_bits(buf[pos:], np.full(n, 1, dtype=np.int64)).astype(bool)
    pos += (n + 7) // 8
    m = int(ok.sum())
    beta = np.empty(0, dtype=np.int64)
    if m:
        beta = unpack_bits(buf[pos:], np.full(m, 4, dtype=np.int64)).astype(np.int64) + 1
        pos += (4 * m + 7) // 8
    first = buf[pos : pos + 8].view(np.uint64)[0]
    pos += 8
    stream = np.empty(n, dtype=np.uint64)
    stream[0] = first
    if n > 1:
        xors, _, _ = _decode_xor_sections(buf[pos:], n - 1)
        np.bitwise_xor.accumulate(xors, out=xors)
        stream[1:] = xors ^ first
    out = stream.view(np.float64).copy()
    if m:
        full_beta = np.zeros(n, dtype=np.int64)
        full_beta[ok] = beta
        out[ok] = _decimal_round(out[ok], beta)
    return out


register(Method.Elf, compress, decompress)
