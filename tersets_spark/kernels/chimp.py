"""Chimp64 / Chimp128 — Gorilla-family XOR float codecs (methods 19, 20).

Reference semantics:
/root/reference/src/lossless_compression/chimp64.zig:47-195 and
chimp128.zig:58-171 — XOR each value against a predictor (previous value
for Chimp64; for Chimp128, the most recent of the last 128 values whose
low 14 mantissa bits match), then store leading-zero/significant-bit
windows. Bitwise lossless including NaN payloads and -0.0
(chimp64.zig:239-254).

Engine layout: the reference's per-value marker state machine
(bucket-reuse markers 00/01/10/11) is inherently sequential, so the
engine uses a *sectioned* columnar layout carrying the same information —
every section is en/decodable as one vectorized numpy pass
(SURVEY.md §7 risk register documents this deviation; semantics — bitwise
round-trip — are identical):

    u32  count
    u64  first value (raw bits)
    [flags: count-1 bits, 1 = xor != 0]
    -- for flag==1 values, fixed 12-bit headers: 6-bit leading-zero count
       (clamped to 63) + 6-bit (significant-bit-count - 1) --
    [headers]
    [payload: significant xor bits, variable width per value]
    -- Chimp128 only: 7-bit predictor back-offsets for flag==1 values,
       before the headers section --

Chimp128 predictor reconstruction is a parent-pointer forest
(value[i] = xor[i] ^ value[i - off[i]]); decode resolves it with
binary-lifting XOR accumulation — O(n log n) vectorized, no Python loop.
"""

from __future__ import annotations

import numpy as np

from .bitstream import pack_bits, unpack_bits


def _leading_zeros(u: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (0 -> 64)."""
    u = np.asarray(u, dtype=np.uint64)
    out = np.full(u.shape, 64, dtype=np.int64)
    nz = u != 0
    if nz.any():
        # float64 exponent trick is exact for the *high* bits: shift right
        # so at most 53 significant bits remain, keeping clz exact.
        hi = u[nz] >> np.uint64(11)
        # bitlength(u) = exp(hi) + 12 when hi > 0 (exact: hi has <= 53 bits)
        lz = np.where(
            hi > 0,
            52 - (((hi.astype(np.float64)).view(np.uint64) >> np.uint64(52)).astype(np.int64) - 1023),
            64,
        )
        # values whose only set bits are in the low 11 bits
        low_only = hi == 0
        if low_only.any():
            lo = u[nz][low_only].astype(np.float64)
            lz_lo = 63 - (((lo).view(np.uint64) >> np.uint64(52)).astype(np.int64) - 1023)
            lz = lz.copy()
            lz[low_only] = lz_lo
        out[nz] = lz
    return out


def _trailing_zeros(u: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (0 -> 64)."""
    u = np.asarray(u, dtype=np.uint64)
    isolated = u & (np.uint64(0) - u)  # lowest set bit
    lz = _leading_zeros(isolated)
    return np.where(u == 0, 64, 63 - lz)


def _encode_xor_sections(xors: np.ndarray) -> list[bytes]:
    """Shared Chimp section encoder: flags, 12-bit (lz, tz) headers,
    significant-bit payload. Storing the trailing-zero count in the
    header (like the reference's trailing>6 marker-01 path,
    chimp64.zig:47-122) keeps decimal-ish data compact: the payload is
    ``xor >> tz`` with width 64 - lz - tz.

    The payload is GROUPED BY WIDTH (ascending; original order within a
    group) so both directions run on the fixed-width fast path, and the
    batch codec can pack whole width-groups of many rows at once."""
    n = xors.size
    flags = (xors != 0).astype(np.uint64)
    parts = [pack_bits(flags, 1) if n else b""]
    changed = xors[xors != 0]
    if changed.size:
        lz = _leading_zeros(changed)  # <= 63 since xor != 0
        tz = _trailing_zeros(changed)
        headers = (lz.astype(np.uint64) << np.uint64(6)) | tz.astype(np.uint64)
        parts.append(pack_bits(headers, 12))
        sig = 64 - lz - tz  # in 1..64
        vals = changed >> tz.astype(np.uint64)
        for w in np.unique(sig):
            parts.append(pack_bits(vals[sig == w], int(w)))
    return parts


def _decode_xor_sections(buf: np.ndarray, n: int) -> tuple[np.ndarray, int, np.ndarray]:
    """Returns (xors, bytes_consumed, flags_bool) for n values."""
    flags = unpack_bits(buf, np.full(n, 1, dtype=np.int64)).astype(bool)
    pos = (n + 7) // 8
    xors = np.zeros(n, dtype=np.uint64)
    m = int(flags.sum())
    if m:
        headers = unpack_bits(buf[pos:], np.full(m, 12, dtype=np.int64))
        pos += (12 * m + 7) // 8
        lz = (headers >> np.uint64(6)).astype(np.int64)
        tz = (headers & np.uint64(0x3F)).astype(np.int64)
        sig = 64 - lz - tz
        vals = np.empty(m, dtype=np.uint64)
        for w in np.unique(sig):
            mask = sig == w
            cnt = int(mask.sum())
            vals[mask] = unpack_bits(buf[pos:], np.full(cnt, int(w), np.int64))
            pos += (int(w) * cnt + 7) // 8
        xors[flags] = vals << tz.astype(np.uint64)
    return xors, pos, flags


def compress_chimp64(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = v.size
    if n == 0:
        return b""
    bits = v.view(np.uint64)
    parts = [np.uint32(n).tobytes(), bits[:1].tobytes()]
    if n > 1:
        xors = bits[1:] ^ bits[:-1]
        parts.extend(_encode_xor_sections(xors))
    return b"".join(parts)


def decompress_chimp64(payload: bytes) -> np.ndarray:
    if len(payload) == 0:
        return np.empty(0, dtype=np.float64)
    buf = np.frombuffer(payload, dtype=np.uint8)
    n = int(buf[:4].view(np.uint32)[0])
    first = buf[4:12].view(np.uint64)[0]
    if n == 1:
        return np.array([first], dtype=np.uint64).view(np.float64)
    xors, _, _ = _decode_xor_sections(buf[12:], n - 1)
    bits = np.empty(n, dtype=np.uint64)
    bits[0] = first
    # prefix-xor scan: value[i] = first ^ xor[1] ^ ... ^ xor[i]
    np.bitwise_xor.accumulate(xors, out=xors)
    bits[1:] = xors ^ first
    return bits.view(np.float64)


def _chimp128_predictors(bits: np.ndarray) -> np.ndarray:
    """For each i >= 1, the predictor index j < i: the most recent index
    within the last 128 whose low-14-bit key matches bits[i-1]'s... —
    following chimp128.zig:77-91, the table is keyed by the low 14 bits of
    the *incoming* value and stores the last index that had that key.
    Falls back to i-1 when no match is in the 128-window.

    Vectorized: previous-occurrence-of-same-key via argsort over
    (key, position)."""
    n = bits.size
    keys = (bits & np.uint64(0x3FFF)).astype(np.int64)
    order = np.lexsort((np.arange(n), keys))
    sorted_keys = keys[order]
    prev_sorted = np.full(n, -1, dtype=np.int64)
    same = np.empty(n - 1, dtype=bool) if n > 1 else np.empty(0, dtype=bool)
    if n > 1:
        same = sorted_keys[1:] == sorted_keys[:-1]
        prev_sorted[1:][same] = order[:-1][same]
    prev = np.empty(n, dtype=np.int64)
    prev[order] = prev_sorted
    idx = np.arange(n, dtype=np.int64)
    in_window = (prev >= 0) & (idx - prev <= 128)
    pred = np.where(in_window, prev, idx - 1)
    return pred  # pred[0] == -1, unused


def compress_chimp128(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = v.size
    if n == 0:
        return b""
    bits = v.view(np.uint64)
    parts = [np.uint32(n).tobytes(), bits[:1].tobytes()]
    if n > 1:
        pred = _chimp128_predictors(bits)[1:]
        offs = (np.arange(1, n, dtype=np.int64) - pred).astype(np.uint64)  # 1..128
        xors = bits[1:] ^ bits[pred]
        # 7-bit back-offset (offset-1 in 0..127) per value — needed even for
        # xor==0 values, which decode as an exact copy of their predictor.
        parts.append(pack_bits((offs - np.uint64(1)), 7))
        parts.extend(_encode_xor_sections(xors))
    return b"".join(parts)


def decompress_chimp128(payload: bytes) -> np.ndarray:
    if len(payload) == 0:
        return np.empty(0, dtype=np.float64)
    buf = np.frombuffer(payload, dtype=np.uint8)
    n = int(buf[:4].view(np.uint32)[0])
    first = buf[4:12].view(np.uint64)[0]
    if n == 1:
        return np.array([first], dtype=np.uint64).view(np.float64)
    pos = 12
    m = n - 1
    offs = unpack_bits(buf[pos:], np.full(m, 7, dtype=np.int64)).astype(np.int64) + 1
    pos += (7 * m + 7) // 8
    xors, _, _ = _decode_xor_sections(buf[pos:], m)
    # parent-pointer forest rooted at 0: value[i] = xor[i] ^ value[parent[i]].
    # Resolve by pointer jumping: jump_xor[i] holds the xor along the path
    # from p[i] to i; each round folds in the parent's jump and squares the
    # pointer, so all chains collapse to the root in O(log n) rounds.
    p = np.concatenate(([0], np.arange(1, n) - offs)).astype(np.int64)
    jump_xor = np.concatenate(([np.uint64(0)], xors))
    while True:
        pending = p > 0
        if not pending.any():
            break
        par = p[pending]
        jump_xor[pending] = jump_xor[pending] ^ jump_xor[par]
        p[pending] = p[par]
    bits = jump_xor ^ first
    return bits.view(np.float64)
