"""Vectorized variable-width bit packing.

Engine analog of the reference's ``BitWriter``/``BulkBitWriter`` /
``BitReader``/``BulkBitReader`` (reference:
/root/reference/src/utilities/shared_structs.zig:130-454). The reference
streams bits one value at a time in Zig; here the whole array is packed
in a handful of numpy operations so the kernels stay vectorized inside
Arrow UDF batches (no per-row Python in the hot path, per
BASELINE.json.input_hint).

Layout matches the reference's convention: MSB-first within the stream
(shared_structs.zig:130-140), i.e. the first bit written lands in the
most significant bit of byte 0.

Strategy: explode every value into its individual bits at absolute bit
positions (``np.repeat`` + segment-local arange), then ``np.packbits``.
Decoding mirrors it with ``np.unpackbits`` + ``np.add.reduceat`` over
per-value segments. O(total_bits) numpy work, no Python loop.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "pack_bits",
    "unpack_bits",
    "segment_intra_indices",
    "zigzag_encode",
    "zigzag_decode",
    "float_bits_ordered",
    "float_bits_unordered",
    "bit_length",
    "pack_uint_stream",
    "unpack_uint_stream",
    "pack_elias_gamma",
    "unpack_elias_gamma",
]

#: Width classes for the 2-bit length-prefix scheme, mirroring the
#: reference's 8/16/32/64 prefix codes
#: (/root/reference/src/utilities/shared_functions.zig:347-373).
CLASS_WIDTHS = np.array([8, 16, 32, 64], dtype=np.int64)


def segment_intra_indices(widths: np.ndarray) -> np.ndarray:
    """For segments of sizes ``widths``, return 0..w-1 within each segment,
    concatenated. E.g. [2, 0, 3] -> [0, 1, 0, 1, 2]."""
    widths = np.asarray(widths, dtype=np.int64)
    total = int(widths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.repeat(np.cumsum(widths) - widths, widths)
    return np.arange(total, dtype=np.int64) - starts


def pack_bits(values: np.ndarray, widths) -> bytes:
    """Pack ``values[i]`` into ``widths[i]`` bits each, MSB-first.

    ``values`` must be unsigned (uint64); only the low ``widths[i]`` bits
    of each value are stored. ``widths`` may be a scalar or an array;
    zero widths are legal and contribute no bits. Fixed (scalar) widths
    take a 2-D broadcast fast path.
    """
    if np.isscalar(widths) or getattr(widths, "ndim", 1) == 0:
        w = int(widths)
        n = values.shape[0]
        if n == 0 or w == 0:
            return b""
        # round-6 fast paths (measured on the Chimp batch encoder —
        # flags 1-bit ~7x, 12-bit headers ~4x): every path produces the
        # identical MSB-first stream as the generic bit-explode below.
        # Work in the SMALLEST uint dtype that holds w bits — the
        # conversion copy (and every later pass) then moves 2-8x fewer
        # bytes than an unconditional uint64 upcast.
        if w == 1:
            # packbits is already MSB-first 1-bit packing
            v8 = values if values.dtype == np.uint8 else values.astype(np.uint8)
            return np.packbits(v8 & np.uint8(1)).tobytes()
        isz = next(s for s in (1, 2, 4, 8) if 8 * s >= w)
        work = np.dtype(f"u{isz}")
        v = values if values.dtype == work else values.astype(work)
        if w % 8 == 0:
            # whole bytes: MSB-first == trailing big-endian byte slice
            nbytes = w // 8
            be = (
                np.ascontiguousarray(v)
                .astype(f">u{isz}")
                .view(np.uint8)
                .reshape(n, isz)[:, isz - nbytes :]
            )
            return np.ascontiguousarray(be).tobytes()
        if w == 12:
            # the Chimp header width: two 12-bit values = three bytes,
            # computed pairwise (~3x over the nibble explode)
            v16 = v if v.dtype == np.uint16 else v.astype(np.uint16)
            head = v16[: (n // 2) * 2].reshape(-1, 2)
            out = np.empty((head.shape[0], 3), dtype=np.uint8)
            out[:, 0] = head[:, 0] >> 4
            out[:, 1] = ((head[:, 0] & 0xF) << 4) | (head[:, 1] >> 8)
            out[:, 2] = head[:, 1] & 0xFF
            if n % 2:  # trailing lone value: 12 bits + 4 zero pad bits
                last = int(v16[-1])
                return out.tobytes() + bytes([last >> 4, (last & 0xF) << 4])
            return out.tobytes()
        if w % 4 == 0:
            # nibble explode (4 bits/cell, 4x fewer cells than bits)
            k = w // 4
            shifts = (np.uint64(4) * np.arange(k - 1, -1, -1)).astype(work)
            nibs = (
                ((v[:, None] >> shifts[None, :]) & work.type(0xF))
                .astype(np.uint8)
                .reshape(-1)
            )
            if nibs.size % 2:
                nibs = np.concatenate([nibs, np.zeros(1, np.uint8)])
            pairs = nibs.reshape(-1, 2)
            return ((pairs[:, 0] << 4) | pairs[:, 1]).tobytes()
        if 33 <= w <= 56:
            # byte-window scatter (round 7, inverse of the unpack
            # window): the output repeats every w bytes per 8 values,
            # so each residue class j writes its w bits at a fixed
            # (byte, bit) offset of the row — 8 shift+byteswap+OR
            # passes, no per-bit explode. Classes' bits are disjoint
            # so the row-matrix ORs never collide. Up to 2x over the
            # generic path at these widths, bit-identical; needs
            # (j*w)%8 + w <= 64, i.e. w <= 57.
            m = (n + 7) // 8
            vpad = np.zeros(8 * m, dtype=np.uint64)
            vpad[:n] = v.astype(np.uint64) & np.uint64((1 << w) - 1)
            rowmat = np.zeros((m, w + 8), dtype=np.uint8)
            for j in range(8):
                sh = (j * w) % 8
                byte0 = (j * w) // 8
                word = vpad[j::8] << np.uint64(64 - w - sh)
                rowmat[:, byte0 : byte0 + 8] |= (
                    word.byteswap().view(np.uint8).reshape(m, 8)
                )
            return rowmat[:, :w].tobytes()[: (n * w + 7) // 8]
        # generic: explode to 1 byte/bit via unpackbits on the
        # BIG-endian value bytes (already MSB-first — a forward column
        # slice, no reversed-stride copy), then packbits.
        be = np.ascontiguousarray(v).astype(f">u{isz}").view(np.uint8)
        bits = np.unpackbits(be).reshape(n, 8 * isz)[:, 8 * isz - w :]
        return np.packbits(bits.reshape(-1)).tobytes()
    values = np.ascontiguousarray(values, dtype=np.uint64)
    n = values.shape[0]
    widths = np.asarray(widths, dtype=np.int64)
    if n == 0 or widths.sum() == 0:
        return b""
    intra = segment_intra_indices(widths)
    vals_rep = np.repeat(values, widths)
    widths_rep = np.repeat(widths, widths)
    shifts = (widths_rep - 1 - intra).astype(np.uint64)
    bits = ((vals_rep >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits).tobytes()


def unpack_bits(buf: bytes | np.ndarray, widths, bit_offset: int = 0) -> np.ndarray:
    """Inverse of :func:`pack_bits` — decode values of the given bit
    widths starting at ``bit_offset`` bits into ``buf``.

    Returns a uint64 array with one entry per width (zero-width entries
    decode to 0).
    """
    if np.isscalar(widths) or getattr(widths, "ndim", 1) == 0:
        raise ValueError("unpack_bits needs an explicit widths array")
    widths = np.asarray(widths, dtype=np.int64)
    n = widths.shape[0]
    if n and widths[0] > 0 and (widths == widths[0]).all():
        w = int(widths[0])
        raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
        # round-6 fast paths mirroring pack_bits (bit_offset == 0 is
        # every codec call site); all bit-identical to the generic
        # matrix path below. A too-short buffer falls through to the
        # generic path so corrupt blobs keep raising (fuzz contract).
        if bit_offset == 0 and raw.size >= (n * w + 7) // 8:
            if w == 1:
                nb = (n + 7) // 8
                return np.unpackbits(raw[:nb])[:n].astype(np.uint64)
            if w % 8 == 0:
                # big-endian byte columns summed by shift — nb <= 8
                # vector ops, no per-bit explode
                nb = w // 8
                cols = raw[: n * nb].reshape(n, nb).astype(np.uint64)
                out = cols[:, 0]
                for j in range(1, nb):
                    out = (out << np.uint64(8)) | cols[:, j]
                return out
            if w == 12:
                # pairwise inverse of the 2-values-in-3-bytes pack
                npairs = n // 2
                tri = raw[: 3 * npairs].reshape(-1, 3).astype(np.uint64)
                v = np.empty(n, dtype=np.uint64)
                v[0 : 2 * npairs : 2] = (tri[:, 0] << np.uint64(4)) | (
                    tri[:, 1] >> np.uint64(4)
                )
                v[1 : 2 * npairs : 2] = (
                    (tri[:, 1] & np.uint64(0xF)) << np.uint64(8)
                ) | tri[:, 2]
                if n % 2:  # trailing lone value: 12 bits + 4 pad bits
                    b0 = np.uint64(raw[3 * npairs])
                    b1 = np.uint64(raw[3 * npairs + 1])
                    v[-1] = (b0 << np.uint64(4)) | (b1 >> np.uint64(4))
                return v
            if w in (4, 28):
                # nibble gather: k <= 7 vector combines (beats the byte
                # window only at these two widths — measured r7)
                k = w // 4
                nnib = n * k
                nb = (nnib + 1) // 2
                b = raw[:nb].astype(np.uint64)
                nibs = np.empty(nb * 2, dtype=np.uint64)
                nibs[0::2] = b >> np.uint64(4)
                nibs[1::2] = b & np.uint64(0xF)
                m = nibs[:nnib].reshape(n, k)
                out = m[:, 0]
                for j in range(1, k):
                    out = (out << np.uint64(4)) | m[:, j]
                return out
            if w <= 57:
                # byte-window gather (round 7): value i spans bits
                # [i*w, i*w + w) — read the nb-byte window holding it,
                # big-endian combine, then one per-element shift + mask.
                # No per-bit explode, no (n, 64) matrix: 2-3x for
                # w <= 25 (u32 windows) and up to 3x at w >= 44 (u64)
                # over the generic path below, bit-identical. shift is
                # in [0, 7] so shift + w <= W holds for w <= W - 7.
                if w <= 25:
                    wt, wbits, nb = np.uint32, 32, 4
                else:
                    wt, wbits, nb = np.uint64, 64, 8
                p = np.arange(n, dtype=np.int64) * w
                shift = (p & 7).astype(wt)
                padded = np.concatenate(
                    [raw[: (n * w + 7) // 8], np.zeros(nb, np.uint8)]
                )
                win = padded[(p >> 3)[:, None] + np.arange(nb)[None, :]]
                out = win[:, 0].astype(wt)
                for j in range(1, nb):
                    out = (out << wt(8)) | win[:, j]
                return (
                    (out >> (wt(wbits - w) - shift)) & wt((1 << w) - 1)
                ).astype(np.uint64)
        # fixed-width generic: byte-level bit matrix, reorder to
        # LSB-first, packbits back into little-endian value bytes
        total = n * w
        nbytes_needed = (bit_offset + total + 7) // 8
        bits = np.unpackbits(raw[:nbytes_needed])[bit_offset : bit_offset + total]
        msb = bits.reshape(n, w)
        le = np.zeros((n, 64), dtype=np.uint8)
        le[:, :w] = msb[:, ::-1]  # bit k of value = column k
        packed = np.packbits(le, axis=1, bitorder="little")  # (n, 8) LE bytes
        return packed.reshape(n, 8).copy().view("<u8").ravel().astype(np.uint64)
    total = int(widths.sum())
    if n == 0 or total == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if raw.size < (bit_offset + total + 7) // 8:
        # preserve the truncated-stream raise of the old per-bit path
        # (corrupt blobs must keep raising through the registry wrapper)
        raise ValueError("unpack_bits: buffer shorter than declared widths")
    return unpack_bits_at(raw, widths, bit_offset + np.cumsum(widths) - widths)


def unpack_bits_at(
    raw: np.ndarray, widths: np.ndarray, bit_starts: np.ndarray
) -> np.ndarray:
    """Unpack MSB-first values with PER-ELEMENT bit widths (0..64) at
    absolute bit positions, in one vectorized pass — no per-width loop,
    no per-bit explode (round 7; measured 7.6x over the bit-explode +
    reduceat path on a mixed-width stream).

    Each value reads the 8-byte window at its start byte:
    ``(word << (start & 7)) >> (64 - w)`` leaves exactly the value's
    top bits; when ``(start & 7) + w > 64`` the 1..7 missing low bits
    spill into a 9th byte, OR-ed in from the window's tail column.
    Byte indices are CLAMPED to the buffer and the window padding is
    zeros, so corrupt/short inputs return garbage values instead of
    faulting — callers that accept untrusted blobs must validate the
    declared byte totals (exactly what the batch decoders do)."""
    n = widths.shape[0]
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    b = np.minimum(bit_starts >> 3, raw.size)  # clamp: reads land in pad
    sh = (bit_starts & 7).astype(np.uint64)
    padded = np.concatenate([raw, np.zeros(16, np.uint8)])
    win = padded[b[:, None] + np.arange(9)[None, :]]
    word = win[:, 0].astype(np.uint64)
    for j in range(1, 8):
        word = (word << np.uint64(8)) | win[:, j]
    wv = widths.astype(np.uint64)
    nz = widths > 0
    out = (word << sh) >> np.where(nz, np.uint64(64) - wv, np.uint64(63))
    out[~nz] = 0
    missing = (sh + wv).astype(np.int64) - 64
    need = missing > 0
    if need.any():
        out[need] |= win[need, 8].astype(np.uint64) >> (
            np.uint64(8) - missing[need].astype(np.uint64)
        )
    return out


def bit_length(u: np.ndarray) -> np.ndarray:
    """Bit length of each uint64 (0 -> 0), vectorized via float64 exponent
    extraction with an exact correction for values >= 2^53 (where the
    int->float conversion may round up past a power of two)."""
    u = np.asarray(u, dtype=np.uint64)
    out = np.zeros(u.shape, dtype=np.int64)
    nz = u > 0
    if not nz.any():
        return out
    f = u[nz].astype(np.float64)
    exp = ((f.view(np.uint64) >> np.uint64(52)) & np.uint64(0x7FF)).astype(np.int64) - 1023
    too_big = np.ones(exp.shape, dtype=bool)
    safe = exp < 64
    pow2 = np.zeros(exp.shape, dtype=np.uint64)
    pow2[safe] = np.uint64(1) << exp[safe].astype(np.uint64)
    too_big[safe] = pow2[safe] > u[nz][safe]
    out[nz] = exp - too_big.astype(np.int64) + 1
    return out


def pack_uint_stream(u: np.ndarray) -> bytes:
    """Pack non-negative uint64 values as [2-bit class per value] followed
    by four class-ordered sections at 8/16/32/64 bits per value."""
    u = np.asarray(u, dtype=np.uint64)
    classes = np.digitize(bit_length(u), CLASS_WIDTHS, right=True).astype(np.uint64)
    parts = [pack_bits(classes, 2)]
    for ci, w in enumerate(CLASS_WIDTHS):
        sel = u[classes == np.uint64(ci)]
        if sel.size:
            parts.append(pack_bits(sel, int(w)))
    return b"".join(parts)


def unpack_uint_stream(buf: np.ndarray | bytes, n: int) -> tuple[np.ndarray, int]:
    """Inverse of :func:`pack_uint_stream`; returns (values, bytes_used)."""
    buf = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if n == 0:
        return np.empty(0, dtype=np.uint64), 0
    classes = unpack_bits(buf, np.full(n, 2, dtype=np.int64)).astype(np.int64)
    pos = (2 * n + 7) // 8
    out = np.zeros(n, dtype=np.uint64)
    for ci, w in enumerate(CLASS_WIDTHS):
        idx = np.flatnonzero(classes == ci)
        if idx.size:
            out[idx] = unpack_bits(buf[pos:], np.full(idx.size, int(w), dtype=np.int64))
            pos += (int(w) * idx.size + 7) // 8
    return out, pos


def pack_elias_gamma(u: np.ndarray) -> bytes:
    """Sectioned Elias-Gamma for values >= 1 (reference codec:
    /root/reference/src/utilities/shared_functions.zig:225-292).

    The classic interleaved code ((N-1) zeros, then the N-bit value) needs
    a sequential parse; the engine stores the same information in two
    vectorizable sections: a unary section (N-1 zeros + terminating 1 per
    value — the 1s mark code boundaries) and a remainder section (the low
    N-1 bits of each value)."""
    u = np.asarray(u, dtype=np.uint64)
    if (u == 0).any():
        raise ValueError("Elias-Gamma requires values >= 1")
    nbits = bit_length(u)
    unary = pack_bits(np.ones(u.size, dtype=np.uint64), nbits)  # 0...01 per value
    top = np.uint64(1) << (nbits - 1).astype(np.uint64)
    rem = u ^ top  # strip the leading 1 bit
    return (
        np.uint32(u.size).tobytes()
        + np.uint32((int(nbits.sum()) + 7) // 8).tobytes()
        + unary
        + pack_bits(rem, nbits - 1)
    )


def unpack_elias_gamma(buf: np.ndarray | bytes) -> tuple[np.ndarray, int]:
    """Inverse of :func:`pack_elias_gamma`; returns (values, bytes_used)."""
    buf = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    n = int(buf[:4].view(np.uint32)[0])
    unary_bytes = int(buf[4:8].view(np.uint32)[0])
    pos = 8
    if n == 0:
        return np.empty(0, dtype=np.uint64), pos
    ubits = np.unpackbits(buf[pos : pos + unary_bytes])
    ones = np.flatnonzero(ubits == 1)[:n]
    nbits = np.diff(np.concatenate(([-1], ones))).astype(np.int64)  # code lengths
    pos += unary_bytes
    rem = unpack_bits(buf[pos:], nbits - 1)
    pos += (int((nbits - 1).sum()) + 7) // 8
    top = (np.uint64(1) << (nbits - 1).astype(np.uint64)).astype(np.uint64)
    return top | rem, pos


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    """Signed -> unsigned zigzag (reference:
    /root/reference/src/utilities/shared_functions.zig:197-217)."""
    v = np.asarray(v, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = np.asarray(u, dtype=np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(u & np.uint64(1)).astype(np.int64)


def float_bits_ordered(v: np.ndarray) -> np.ndarray:
    """Order-preserving f64 -> u64 mapping (reference:
    /root/reference/src/utilities/shared_functions.zig:298-305):
    negative floats get all bits flipped, positives get the sign bit set,
    so unsigned integer order == float order."""
    bits = np.ascontiguousarray(v, dtype=np.float64).view(np.uint64)
    sign = (bits >> np.uint64(63)).astype(bool)
    out = np.where(sign, ~bits, bits | np.uint64(1) << np.uint64(63))
    return out.astype(np.uint64)


def float_bits_unordered(u: np.ndarray) -> np.ndarray:
    """Inverse of :func:`float_bits_ordered`."""
    u = np.asarray(u, dtype=np.uint64)
    sign = (u >> np.uint64(63)).astype(bool)
    bits = np.where(sign, u & ~(np.uint64(1) << np.uint64(63)), ~u)
    return bits.astype(np.uint64).view(np.float64)
