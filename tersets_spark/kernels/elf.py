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
    losslessness never depends on this estimate being right).

    The 16 scale probes run over a shrinking working set: a value
    leaves it once resolved (smallest k found) or once scaled >= 2^53
    (scaled only grows with k, so it can never become an exact
    integer later) — short-decimal corpora resolve almost everything
    by k<=4, cutting the probe cost ~4x vs full-array passes."""
    n = v.size
    out = np.full(n, 17, dtype=np.int64)
    finite = np.isfinite(v) & (v != 0.0)
    if not finite.any():
        out[~np.isfinite(v) | (v == 0.0)] = 1
        return out
    x = np.abs(v)
    k = np.full(n, -1, dtype=np.int64)
    idx = np.flatnonzero(finite)
    xx = x[idx]
    with np.errstate(over="ignore", invalid="ignore"):
        for kk in range(16):
            if idx.size == 0:
                break
            scaled = xx * (10.0**kk)
            small = scaled < 2**53
            exact = small & (scaled == np.floor(scaled))
            k[idx[exact]] = kk
            keep = small & ~exact
            idx = idx[keep]
            xx = xx[keep]
        mag = np.full(n, 0, dtype=np.int64)
        mag[finite] = np.floor(np.log10(x[finite])).astype(np.int64)
    have = k >= 0
    out[have] = np.clip(mag[have] + k[have] + 1, 1, 17)
    out[~np.isfinite(v) | (v == 0.0)] = 1
    return out


def _build_pow10_table(size: int = 1200) -> np.ndarray:
    """Exact replica of numpy's C power_of_ten (calculation.c): literal
    1e0..1e8, then repeated *10.0 from 1e9 (overflowing to inf).  Using
    this table keeps the vectorized _decimal_round bit-identical to the
    per-group np.round(…, d) it replaced — np.round computes its scale
    factor with exactly this algorithm, and already-written blobs'
    decimal recovery must never change."""
    p = np.empty(size, dtype=np.float64)
    for i in range(9):
        p[i] = float(10**i)
    r = 1e9
    with np.errstate(over="ignore"):
        for i in range(9, size):
            p[i] = r
            r = r * 10.0
    return p


_POW10 = _build_pow10_table()


def _decimal_round(v: np.ndarray, beta: np.ndarray) -> np.ndarray:
    """round(v, beta - 1 - floor(log10 |v|)) — shared by encoder
    (verification) and decoder (recovery).

    Fully vectorized, bit-identical to np.round(sub, d) per decimal
    count d: scale factor from the power_of_ten replica table, then
    rint-multiply/divide in numpy's exact op order (multiply-rint-
    divide for d>=0, divide-rint-multiply for d<0; d==0 degenerates to
    rint(v*1.0)/1.0 == rint(v) bitwise for finite v)."""
    out = v.copy()
    nz = np.isfinite(v) & (v != 0)
    if nz.any():
        sub = v[nz]
        with np.errstate(divide="ignore"):
            mag = np.floor(np.log10(np.abs(sub))).astype(np.int64)
        dec = (beta[nz] - 1 - mag).astype(np.int64)
        f = _POW10[np.minimum(np.abs(dec), _POW10.size - 1)]
        with np.errstate(invalid="ignore", over="ignore"):
            pos = np.true_divide(np.rint(np.multiply(sub, f)), f)
            neg = np.multiply(np.rint(np.true_divide(sub, f)), f)
        out[nz] = np.where(dec >= 0, pos, neg)
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


_ELF_BYTE = 26


def compress_batch(flat: np.ndarray, offsets: np.ndarray) -> list[bytes]:
    """Batched Elf: β estimation, erasure and the bitwise recovery
    verification run ONCE over the whole Arrow batch (the erasure is a
    per-value op, so batching amortizes the 16 scale probes of _beta and
    the per-decimal rounding groups across every row); the ok-flag / β /
    xor sections then pack globally with per-row byte slices. Produces
    blobs byte-identical to the single-series encoder (incl. the
    registry's empty/single-value edge rules)."""
    from .chimp import _batch_xor_section_bytes
    from .bitstream import segment_intra_indices

    offsets = np.asarray(offsets, dtype=np.int64)
    n_rows = offsets.size - 1
    lens = np.diff(offsets)
    blobs: list[bytes | None] = [None] * n_rows
    big = np.flatnonzero(lens >= 2)
    for r in np.flatnonzero(lens == 1):
        blobs[r] = flat[offsets[r] : offsets[r] + 1].tobytes() + bytes([0])
    for r in np.flatnonzero(lens == 0):
        blobs[r] = b""
    if big.size == 0:
        return blobs  # type: ignore[return-value]
    v = np.ascontiguousarray(flat, dtype=np.float64)
    bits = v.view(np.uint64)
    # ---- global erasure + verification (identical math to compress) ----
    beta = _beta(v)
    needed = np.ceil(beta * _LOG2_10).astype(np.int64) + 1
    t = np.clip(52 - needed, 0, 52).astype(np.uint64)
    mask = ~((np.uint64(1) << t) - np.uint64(1))
    erased_bits = bits & mask
    recovered = _decimal_round(erased_bits.view(np.float64), beta)
    ok = (recovered.view(np.uint64) == bits) & (t > 0) & np.isfinite(v)
    stream = np.where(ok, erased_bits, bits)
    # ---- ok-flag section: 1-bit per value, per-row pad to x8 ----
    fpad = lens + (-lens) % 8
    fvals = np.zeros(int(fpad.sum()), dtype=np.uint64)
    dst = np.repeat(np.concatenate(([0], np.cumsum(fpad)))[:-1], lens) + (
        segment_intra_indices(lens)
    )
    fvals[dst] = ok.astype(np.uint64)
    flags_packed = memoryview(pack_bits(fvals, 1))
    f_boff = np.concatenate(([0], np.cumsum(fpad // 8)))
    f_real = (lens + 7) // 8
    # ---- beta section: 4-bit per ok value, per-row pad to x2 ----
    row_of = np.repeat(np.arange(n_rows), lens)
    m_ok = np.bincount(row_of[ok], minlength=n_rows).astype(np.int64)
    bpad = m_ok + m_ok % 2
    bvals = np.zeros(int(bpad.sum()), dtype=np.uint64)
    dst = np.repeat(np.concatenate(([0], np.cumsum(bpad)))[:-1], m_ok) + (
        segment_intra_indices(m_ok)
    )
    bvals[dst] = (beta[ok] - 1).astype(np.uint64)
    beta_packed = memoryview(pack_bits(bvals, 4))
    b_boff = np.concatenate(([0], np.cumsum(bpad * 4 // 8)))
    b_real = (4 * m_ok + 7) // 8
    # ---- per-row lag-1 xors over the erased stream ----
    x_all = stream[1:] ^ stream[:-1] if stream.size > 1 else np.empty(0, np.uint64)
    keep = row_of[1:] == row_of[:-1] if row_of.size > 1 else np.empty(0, bool)
    xors = x_all[keep]
    m_r = np.maximum(lens - 1, 0)
    xrow = np.repeat(np.arange(n_rows), m_r)
    sflags, s_boff, headers_packed, h_boff, payload_buf, p_boff = (
        _batch_xor_section_bytes(xors, xrow, m_r, n_rows)
    )
    head = lens.astype(np.uint32)[:, None].view(np.uint8)
    firsts = np.zeros(n_rows, dtype=np.uint64)
    firsts[lens > 0] = stream[offsets[:-1][lens > 0]]
    first_bytes = firsts[:, None].view(np.uint8)
    tail = bytes([_ELF_BYTE])
    for r in big:
        blobs[r] = (
            head[r].tobytes()
            + bytes(flags_packed[f_boff[r] : f_boff[r] + f_real[r]])
            + bytes(beta_packed[b_boff[r] : b_boff[r] + b_real[r]])
            + first_bytes[r].tobytes()
            + bytes(sflags[s_boff[r] : s_boff[r + 1]])
            + bytes(headers_packed[h_boff[r] : h_boff[r + 1]])
            + payload_buf[p_boff[r] : p_boff[r + 1]].tobytes()
            + tail
        )
    return blobs  # type: ignore[return-value]


def decompress_batch(blobs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Batched inverse of :func:`compress_batch` (round 7, r6 verdict
    #3): ok-flags and 4-bit betas unpack in one global fixed-width pass
    each, the Chimp xor sections reuse the shared global decoder, the
    per-row prefix-xor is one global scan with row resets, and decimal
    recovery (`_decimal_round`) runs ONCE over every erased value in
    the batch — its per-decimal-count rounding groups amortize across
    rows exactly like the encoder's. Foreign/corrupt blobs fall back to
    the per-row registry decoder."""
    from . import registry
    from .bitstream import segment_intra_indices
    from .chimp import (
        _batch_blob_layout,
        _batch_decode_xor_sections,
        _rowwise_prefix_xor,
    )

    n_rows = len(blobs)
    buf, blob_lens, blob_off, is_fast, counts = _batch_blob_layout(
        blobs, _ELF_BYTE, 14
    )
    out_parts: dict[int, np.ndarray] = {}
    sel = np.flatnonzero(is_fast)
    if sel.size:
        starts = blob_off[sel]
        n_r = counts[sel]  # >= 2 per the layout guard
        # ---- ok-flag section: 1-bit x n values, real bytes == padded
        fpad = n_r + (-n_r) % 8
        f_real = fpad // 8  # == ceil(n/8)
        f_starts = starts + 4
        gidx = np.repeat(f_starts, f_real) + segment_intra_indices(f_real)
        gidx = np.minimum(gidx, buf.size - 1)  # clipped: validated below
        okbits = unpack_bits(buf[gidx], np.full(int(fpad.sum()), 1, np.int64))
        src = np.repeat(np.concatenate(([0], np.cumsum(fpad)))[:-1], n_r) + (
            segment_intra_indices(n_r)
        )
        ok = okbits[src].astype(bool)
        okrow = np.repeat(np.arange(sel.size), n_r)
        m_ok = np.bincount(okrow[ok], minlength=sel.size).astype(np.int64)
        # ---- beta section: 4-bit x m_ok, real bytes == padded
        bpad = m_ok + m_ok % 2
        b_real = bpad * 4 // 8  # == ceil(4*m_ok/8)
        b_starts = f_starts + f_real
        gidx = np.repeat(b_starts, b_real) + segment_intra_indices(b_real)
        gidx = np.minimum(gidx, buf.size - 1)  # clipped: validated below
        bbits = unpack_bits(buf[gidx], np.full(int(bpad.sum()), 4, np.int64))
        src = np.repeat(np.concatenate(([0], np.cumsum(bpad)))[:-1], m_ok) + (
            segment_intra_indices(m_ok)
        )
        beta = bbits[src].astype(np.int64) + 1
        # ---- first value + xor sections over the erased stream
        first_pos = b_starts + b_real
        firsts = (
            buf[np.minimum(first_pos[:, None] + np.arange(8)[None, :], buf.size - 1)]
            .copy()
            .view(np.uint64)
            .ravel()
        )
        m_r = n_r - 1
        xors, consumed, bad_hdr = _batch_decode_xor_sections(
            buf, first_pos + 8, m_r
        )
        tail_bits = _rowwise_prefix_xor(xors, firsts, m_r)
        expected = 4 + f_real + b_real + 8 + consumed + 1
        valid = (expected == blob_lens[sel]) & ~bad_hdr
        # ---- assemble the full erased stream, then ONE global recovery
        g_off = np.concatenate(([0], np.cumsum(n_r)))
        stream = np.empty(int(g_off[-1]), dtype=np.uint64)
        first_slots = g_off[:-1]
        stream[first_slots] = firsts
        non_first = np.ones(stream.size, dtype=bool)
        non_first[first_slots] = False
        stream[non_first] = tail_bits
        out = stream.view(np.float64).copy()
        idx_ok = np.flatnonzero(ok)
        if idx_ok.size:
            out[idx_ok] = _decimal_round(out[idx_ok], beta)
        for k, r in enumerate(sel):
            if not valid[k]:
                is_fast[r] = False
                continue
            out_parts[r] = out[g_off[k] : g_off[k + 1]]
    for r in np.flatnonzero(~is_fast):
        out_parts[r] = registry.decompress(bytes(blobs[r]))
        counts[r] = out_parts[r].size
    flat = (
        np.concatenate([out_parts[r] for r in range(n_rows)])
        if n_rows
        else np.empty(0, dtype=np.float64)
    )
    return flat, np.concatenate(([0], np.cumsum(counts)))


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
