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

from ..methods import check_decode_count

from .bitstream import pack_bits, unpack_bits, unpack_bits_at


def _leading_zeros(u: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (0 -> 64).

    One float64 conversion: the exponent of float(u) is floor(log2 u)
    EXCEPT when rounding to 53 bits bumps u up to the next power of two
    (u in [2^k - 2^(k-54), 2^k)); the one-shift check repairs exactly
    that case. Round-6 rewrite — the previous two-conversion hi/lo
    split cost ~2x (measured, KERNELS batch work)."""
    u = np.asarray(u, dtype=np.uint64)
    e = (
        (u.astype(np.float64).view(np.uint64) >> np.uint64(52)).astype(np.int64)
        - 1023
    )
    # clip first: bitlength <= 64 caps floor(log2) at 63 (values just
    # under 2^64 round UP to 2^64 → raw e == 64), and u == 0 gives a
    # negative raw exponent that must not become a negative shift
    e = np.clip(e, 0, 63)
    # rounding may claim one power too high: then u >> e == 0
    e = e - ((u >> e.astype(np.uint64)) == 0)
    return np.where(u == 0, 64, 63 - e)


def _trailing_zeros(u: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (0 -> 64).

    The isolated lowest set bit is a power of two <= 2^63, which
    converts to float64 EXACTLY — its exponent IS the trailing-zero
    count, no correction needed (round-6 rewrite, ~4x)."""
    u = np.asarray(u, dtype=np.uint64)
    isolated = u & (np.uint64(0) - u)  # lowest set bit (0 for u == 0)
    t = (
        (isolated.astype(np.float64).view(np.uint64) >> np.uint64(52)).astype(
            np.int64
        )
        - 1023
    )
    return np.where(u == 0, 64, t)


def _pad_count(cnt: int, w: int) -> int:
    """Values of width w padded so the section is byte-aligned:
    count rounded up to a multiple of 8/gcd(w, 8)."""
    g = 8 // np.gcd(w, 8)
    return cnt + (-cnt) % g


def _encode_xor_sections(xors: np.ndarray) -> list[bytes]:
    """Shared Chimp section encoder: flags, 12-bit (lz, tz) headers,
    significant-bit payload. Storing the trailing-zero count in the
    header (like the reference's trailing>6 marker-01 path,
    chimp64.zig:47-122) keeps decimal-ish data compact: the payload is
    ``xor >> tz`` with width 64 - lz - tz.

    Layout rules shared with the batch codec: the payload is GROUPED BY
    WIDTH (ascending; original order within a group) and every section's
    value count is padded (with zeros) so its bit length is a byte
    multiple — which is what lets the batch codec pack the same section
    of MANY rows in one fixed-width call."""
    n = xors.size
    flags = (xors != 0).astype(np.uint64)
    fpad = _pad_count(n, 1)
    parts = [
        pack_bits(np.concatenate([flags, np.zeros(fpad - n, np.uint64)]), 1)
        if n
        else b""
    ]
    changed = xors[xors != 0]
    if changed.size:
        m = changed.size
        lz = _leading_zeros(changed)  # <= 63 since xor != 0
        tz = _trailing_zeros(changed)
        headers = (lz.astype(np.uint64) << np.uint64(6)) | tz.astype(np.uint64)
        hpad = _pad_count(m, 12)
        parts.append(
            pack_bits(np.concatenate([headers, np.zeros(hpad - m, np.uint64)]), 12)
        )
        sig = 64 - lz - tz  # in 1..64
        vals = changed >> tz.astype(np.uint64)
        for w in np.unique(sig):
            sel = vals[sig == w]
            ppad = _pad_count(sel.size, int(w))
            parts.append(
                pack_bits(
                    np.concatenate([sel, np.zeros(ppad - sel.size, np.uint64)]),
                    int(w),
                )
            )
    return parts


def _decode_xor_sections(buf: np.ndarray, n: int) -> tuple[np.ndarray, int, np.ndarray]:
    """Returns (xors, bytes_consumed, flags_bool) for n values."""
    fpad = _pad_count(n, 1)
    flags = unpack_bits(buf, np.full(fpad, 1, dtype=np.int64))[:n].astype(bool)
    pos = fpad // 8
    xors = np.zeros(n, dtype=np.uint64)
    m = int(flags.sum())
    if m:
        hpad = _pad_count(m, 12)
        headers = unpack_bits(buf[pos:], np.full(hpad, 12, dtype=np.int64))[:m]
        pos += hpad * 12 // 8
        lz = (headers >> np.uint64(6)).astype(np.int64)
        tz = (headers & np.uint64(0x3F)).astype(np.int64)
        sig = 64 - lz - tz
        # cells sit in ascending-width order (np.unique order on the
        # encode side); one variable-width window unpack over every
        # value at its absolute bit position replaces the per-width
        # loop (round 7 — same rework as the batch reader). A corrupt
        # header claiming lz + tz > 64 (sig < 0) is a typed error, as
        # on the legacy per-width path; lz + tz == 64 (sig == 0) keeps
        # its legacy zero-width decode (0 bits, value 0).
        if (sig < 0).any():
            raise ValueError("corrupt chimp xor header: lz + tz > 64")
        order = np.argsort(sig, kind="stable")
        s = sig[order]
        cell_break = np.flatnonzero(s[1:] != s[:-1]) + 1
        cstarts = np.concatenate(([0], cell_break))
        c_w = s[cstarts]
        c_cnt = np.diff(np.append(cstarts, s.size))
        c_pad = c_cnt + (-c_cnt) % (8 // np.gcd(np.maximum(c_w, 1), 8))
        c_bytes = c_pad * c_w // 8
        total = int(c_bytes.sum())
        if pos + total > buf.size:
            raise ValueError("truncated chimp xor payload")
        c_abs = pos + np.cumsum(c_bytes) - c_bytes
        rank = np.arange(s.size, dtype=np.int64) - np.repeat(cstarts, c_cnt)
        pv = np.repeat(c_abs, c_cnt) * 8 + rank * s
        vals = np.empty(m, dtype=np.uint64)
        vals[order] = unpack_bits_at(buf, s, pv)
        pos += total
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
    n = check_decode_count(buf[:4].view(np.uint32)[0])
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


_CHIMP64_BYTE = 19
_CHIMP128_BYTE = 20


def compress_batch(flat: np.ndarray, offsets: np.ndarray) -> list[bytes]:
    """Batched Chimp64: many float series in a handful of numpy passes.

    Produces exactly the per-row blob :func:`compress_chimp64` produces
    (the padded-section layout above makes every section of every row a
    whole number of bytes, so each section kind packs GLOBALLY with one
    fixed-width call and per-row byte slices fall out of cumsum).
    """
    from .bitstream import segment_intra_indices

    offsets = np.asarray(offsets, dtype=np.int64)
    n_rows = offsets.size - 1
    lens = np.diff(offsets)
    bits = np.ascontiguousarray(flat, dtype=np.float64).view(np.uint64)
    blobs: list[bytes | None] = [None] * n_rows
    big = np.flatnonzero(lens >= 2)
    for r in np.flatnonzero(lens == 1):
        blobs[r] = flat[offsets[r] : offsets[r] + 1].tobytes() + bytes([0])
    for r in np.flatnonzero(lens == 0):
        blobs[r] = b""
    if big.size == 0:
        return blobs  # type: ignore[return-value]
    # per-row xors (drop cross-row deltas)
    x_all = bits[1:] ^ bits[:-1] if bits.size > 1 else np.empty(0, np.uint64)
    row_of = np.repeat(np.arange(n_rows), lens)
    keep = row_of[1:] == row_of[:-1] if row_of.size > 1 else np.empty(0, bool)
    xors = x_all[keep]  # concatenated per-row xor streams (m_r = len_r - 1)
    m_r = np.maximum(lens - 1, 0)
    xrow = np.repeat(np.arange(n_rows), m_r)
    flags_packed, f_boff, headers_packed, h_boff, payload_buf, p_boff = (
        _batch_xor_section_bytes(xors, xrow, m_r, n_rows)
    )
    # ---- assemble rows
    head = np.zeros((n_rows, 12), dtype=np.uint8)
    head[:, 0:4] = lens.astype(np.uint32)[:, None].view(np.uint8)
    firsts = np.zeros(n_rows, dtype=np.uint64)
    firsts[lens > 0] = bits[offsets[:-1][lens > 0]]
    head[:, 4:12] = firsts[:, None].view(np.uint8)
    tail = bytes([_CHIMP64_BYTE])
    for r in big:
        blobs[r] = (
            head[r].tobytes()
            + bytes(flags_packed[f_boff[r] : f_boff[r + 1]])
            + bytes(headers_packed[h_boff[r] : h_boff[r + 1]])
            + payload_buf[p_boff[r] : p_boff[r + 1]].tobytes()
            + tail
        )
    return blobs  # type: ignore[return-value]


def _padded_scatter_dst(counts: np.ndarray, pads: np.ndarray) -> np.ndarray:
    """Destination indices that lay ``counts[i]`` consecutive values into
    blocks of ``pads[i]`` slots (zero-gap padding between blocks):
    original position + the cumulative padding gap of preceding blocks.
    One repeat + one arange — ~40% less index traffic than the
    repeat(starts) + segment_intra_indices formulation (round 6)."""
    gaps = np.cumsum(pads - counts) - (pads - counts)
    return np.arange(int(counts.sum()), dtype=np.int64) + np.repeat(gaps, counts)


def _batch_xor_section_bytes(xors, xrow, m_r, n_rows):
    """Shared batch section builder: given the concatenated per-row xor
    streams, produce per-row flag/header/payload byte sections (the same
    padded layout _encode_xor_sections emits, packed GLOBALLY with one
    fixed-width call per section kind / payload width)."""
    # ---- flags section: global fixed-width pack, per-row padded to x8
    nzmask = xors != 0  # shared by the flags scatter and the header gather
    fpad = m_r + (-m_r) % 8
    fvals = np.zeros(int(fpad.sum()), dtype=np.uint8)  # u8: packbits input
    fvals[_padded_scatter_dst(m_r, fpad)] = nzmask
    flags_packed = memoryview(pack_bits(fvals, 1))
    f_bytes = fpad // 8
    f_boff = np.concatenate(([0], np.cumsum(f_bytes)))
    # ---- headers section
    ch = np.flatnonzero(nzmask)
    changed = xors[ch]
    crow = xrow[ch]
    c_r = np.bincount(crow, minlength=n_rows).astype(np.int64)
    # nonzero-specialized lz/tz (changed has no zeros): skips the
    # u == 0 selects of the public helpers
    e = (
        changed.astype(np.float64).view(np.uint64) >> np.uint64(52)
    ).astype(np.int64) - 1023
    e = np.minimum(e, 63)
    e -= (changed >> e.astype(np.uint64)) == 0
    lz = 63 - e
    iso = changed & (np.uint64(0) - changed)
    tzu = (iso.astype(np.float64).view(np.uint64) >> np.uint64(52)) - np.uint64(
        1023
    )
    tz = tzu.astype(np.int64)
    sig = 64 - lz - tz
    vals = changed >> tzu
    # 12-bit headers fit uint16 — the scatter array and the nibble pack
    # then move 4x fewer bytes than uint64
    headers = ((lz << 6) | tz).astype(np.uint16)
    hpad = c_r + (-c_r) % 2
    hvals = np.zeros(int(hpad.sum()), dtype=np.uint16)
    hvals[_padded_scatter_dst(c_r, hpad)] = headers
    headers_packed = memoryview(pack_bits(hvals, 12))
    h_bytes = hpad * 12 // 8
    h_boff = np.concatenate(([0], np.cumsum(h_bytes)))
    # ---- payload: ONE width-major stable sort + ONE global padded
    # scatter; per width the padded values are then a contiguous SLICE
    # (no per-width gathers), and per-cell byte ranges fall out of one
    # global cumsum. Round-6 rewrite of the (row, width)-major variant
    # — the width-major key visits each row's cells in ascending-width
    # order exactly as the blob layout requires, and a uint16 key takes
    # numpy's radix argsort (~7x over 64-bit stable merge sort).
    payload_buf = np.empty(0, dtype=np.uint8)
    p_boff = np.zeros(n_rows + 1, dtype=np.int64)
    if ch.size:
        # max key = 64*(n_rows+1) + (n_rows-1) = 65*n_rows + 63; must
        # fit uint16, so n_rows <= (65535-63)//65 = 1007. (1008 already
        # overflows: 65*1008+63 = 65583, wrapping sig=64 cells in rows
        # >= 960 onto keys 0-47 — silent blob corruption.)
        if 65 * n_rows + 63 <= 0xFFFF:  # n_rows <= 1007
            key = (sig * np.int64(n_rows + 1) + crow).astype(np.uint16)
        else:
            key = (sig * np.int64(n_rows + 1) + crow).astype(np.uint32)
        order = np.argsort(key, kind="stable")  # (w, row, original pos)
        s_key = key[order]  # ONE small-dtype gather; (w, row) decoded
        s_val = vals[order]  # from cell-boundary keys only, below
        # cell boundaries in the sorted stream
        cell_break = np.flatnonzero(s_key[1:] != s_key[:-1]) + 1
        cstarts = np.concatenate(([0], cell_break))
        cends = np.concatenate((cell_break, [s_key.size]))
        ckey = s_key[cstarts].astype(np.int64)
        c_w = ckey // np.int64(n_rows + 1)  # ascending (width-major)
        c_rw = ckey % np.int64(n_rows + 1)
        c_cnt = cends - cstarts
        # per-cell pad counts, vectorized: g = 8 / gcd(w, 8) by table
        g_tab = (8 // np.gcd(np.arange(65, dtype=np.int64), 8)).astype(np.int64)
        g_c = g_tab[c_w]
        pads = c_cnt + (-c_cnt) % g_c
        pstarts = np.concatenate(([0], np.cumsum(pads)))
        gv = np.zeros(int(pstarts[-1]), dtype=np.uint64)
        gv[_padded_scatter_dst(c_cnt, pads)] = s_val
        # per-cell byte offsets within the global packed stream
        cell_bytes = pads * c_w // 8
        boffs = np.concatenate(([0], np.cumsum(cell_bytes)))
        # width group boundaries: pack each width's contiguous slice
        wbreak = np.flatnonzero(c_w[1:] != c_w[:-1]) + 1
        wstarts = np.concatenate(([0], wbreak))
        wends = np.concatenate((wbreak, [c_w.size]))
        chunks: list[memoryview] = []
        for ws, we in zip(wstarts, wends):
            chunks.append(
                memoryview(
                    pack_bits(gv[pstarts[ws] : pstarts[we]], int(c_w[ws]))
                )
            )
        packed = memoryview(b"".join(chunks)) if len(chunks) > 1 else chunks[0]
        # rearrange the width-major packed stream into ROW-major payload
        # bytes with ONE gather (round 7): the stable row sort keeps each
        # row's cells in ascending-width order — exactly the blob layout
        # — and callers slice one contiguous range per row instead of
        # joining ~20 per-cell bytes objects (a 21k-iteration Python
        # loop at the 1000-row corpus shape, measured ~25% of the pass)
        from .bitstream import segment_intra_indices

        row_order = np.argsort(c_rw, kind="stable")
        rb = cell_bytes[row_order]
        src = np.repeat(boffs[:-1][row_order], rb) + segment_intra_indices(rb)
        payload_buf = np.frombuffer(packed, dtype=np.uint8)[src]
        row_bytes = np.bincount(
            c_rw, weights=cell_bytes, minlength=n_rows
        ).astype(np.int64)
        p_boff = np.concatenate(([0], np.cumsum(row_bytes)))
    return flags_packed, f_boff, headers_packed, h_boff, payload_buf, p_boff


def compress_batch_chimp128(flat: np.ndarray, offsets: np.ndarray) -> list[bytes]:
    """Batched Chimp128: per-row 14-bit-key predictors computed in one
    lexsort over the whole batch, then the shared global section packs.
    Byte-identical to :func:`compress_chimp128` per row.

    Dispatch: the global lexsort amortizes per-row overhead 4-5x for
    SHORT rows but costs more than per-row sorts on long ones (measured
    break-even ~1-2k values/row) — long-row batches run the per-row
    encoder instead, same blobs either way."""
    offsets = np.asarray(offsets, dtype=np.int64)
    n_rows = offsets.size - 1
    lens = np.diff(offsets)
    if n_rows and flat.size / n_rows > 1024:
        out: list[bytes] = []
        for r in range(n_rows):
            v = flat[offsets[r] : offsets[r + 1]]
            if v.size == 0:
                out.append(b"")
            elif v.size == 1:
                out.append(v.tobytes() + bytes([0]))
            else:
                out.append(compress_chimp128(v) + bytes([_CHIMP128_BYTE]))
        return out
    from .bitstream import segment_intra_indices
    bits = np.ascontiguousarray(flat, dtype=np.float64).view(np.uint64)
    blobs: list[bytes | None] = [None] * n_rows
    big = np.flatnonzero(lens >= 2)
    for r in np.flatnonzero(lens == 1):
        blobs[r] = flat[offsets[r] : offsets[r] + 1].tobytes() + bytes([0])
    for r in np.flatnonzero(lens == 0):
        blobs[r] = b""
    if big.size == 0:
        return blobs  # type: ignore[return-value]
    n_all = bits.size
    row_of = np.repeat(np.arange(n_rows), lens)
    pred = _chimp128_predictors(bits, row_of)
    idx = np.arange(n_all, dtype=np.int64)
    # non-first positions of each row, in order
    is_first = np.zeros(n_all, dtype=bool)
    is_first[offsets[:-1][lens > 0]] = True
    tail_pos = idx[~is_first]
    m_r = np.maximum(lens - 1, 0)
    xrow = np.repeat(np.arange(n_rows), m_r)
    offs_local = (tail_pos - pred[tail_pos]).astype(np.uint64)  # 1..128
    xors = bits[tail_pos] ^ bits[pred[tail_pos]]
    # ---- 7-bit back-offset section: per-row pad to x8 values, pack
    # globally, slice each row's ceil(7m/8) real bytes
    opad = m_r + (-m_r) % 8
    ovals = np.zeros(int(opad.sum()), dtype=np.uint64)
    dst = np.repeat(np.concatenate(([0], np.cumsum(opad)))[:-1], m_r) + (
        segment_intra_indices(m_r)
    )
    ovals[dst] = offs_local - np.uint64(1)
    offs_packed = memoryview(pack_bits(ovals, 7))
    o_pad_bytes = opad * 7 // 8
    o_real_bytes = (7 * m_r + 7) // 8
    o_boff = np.concatenate(([0], np.cumsum(o_pad_bytes)))
    flags_packed, f_boff, headers_packed, h_boff, payload_buf, p_boff = (
        _batch_xor_section_bytes(xors, xrow, m_r, n_rows)
    )
    head = np.zeros((n_rows, 12), dtype=np.uint8)
    head[:, 0:4] = lens.astype(np.uint32)[:, None].view(np.uint8)
    firsts = np.zeros(n_rows, dtype=np.uint64)
    firsts[lens > 0] = bits[offsets[:-1][lens > 0]]
    head[:, 4:12] = firsts[:, None].view(np.uint8)
    tail = bytes([_CHIMP128_BYTE])
    for r in big:
        blobs[r] = (
            head[r].tobytes()
            + bytes(offs_packed[o_boff[r] : o_boff[r] + o_real_bytes[r]])
            + bytes(flags_packed[f_boff[r] : f_boff[r + 1]])
            + bytes(headers_packed[h_boff[r] : h_boff[r + 1]])
            + payload_buf[p_boff[r] : p_boff[r + 1]].tobytes()
            + tail
        )
    return blobs  # type: ignore[return-value]


def _batch_blob_layout(blobs: list[bytes], method_byte: int, min_len: int):
    """Shared batch-decode preamble: concatenate blobs, find the rows
    carrying ``method_byte`` with a plausible declared count and enough
    bytes for the count + a 1-bit-per-value flag section. Returns
    ``(buf, blob_lens, blob_off, is_fast, counts)`` — ``is_fast`` rows
    are candidates for the global path (still re-validated against the
    exact expected byte length before being trusted); everything else
    goes to the per-row registry decoder."""
    n_rows = len(blobs)
    buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    blob_lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=n_rows)
    blob_off = np.concatenate(([0], np.cumsum(blob_lens)))
    is_fast = np.zeros(n_rows, dtype=bool)
    idx = np.flatnonzero(blob_lens >= min_len)
    if idx.size:
        is_fast[idx] = buf[blob_off[idx + 1] - 1] == method_byte
    counts = np.zeros(n_rows, dtype=np.int64)
    if is_fast.any():
        # corrupt-count guard (blocks are read back from storage): rows
        # whose declared count is implausible, or whose flag section
        # alone exceeds the blob, fall back to the per-row registry
        # decoder below (typed error instead of a multi-GB gather)
        chk = np.flatnonzero(is_fast)
        cnt = (
            buf[blob_off[chk][:, None] + np.arange(4)[None, :]]
            .copy()
            .view(np.uint32)
            .ravel()
            .astype(np.int64)
        )
        m = np.maximum(cnt - 1, 0)
        flag_bytes = (m + (-m) % 8) // 8
        ok = (cnt >= 2) & (cnt <= 1 << 27) & (
            min_len - 1 + flag_bytes <= blob_lens[chk]
        )
        is_fast[chk[~ok]] = False
        counts[chk[ok]] = cnt[ok]
    return buf, blob_lens, blob_off, is_fast, counts


def _batch_decode_xor_sections(buf, sec_starts, m_r):
    """Decode the (flags, 12-bit headers, width-grouped payload) xor
    sections of MANY rows in global fixed-width passes — the read-side
    mirror of :func:`_batch_xor_section_bytes`. ``sec_starts[k]`` is the
    absolute byte offset of row k's flag section in ``buf``; ``m_r[k]``
    its xor-stream length. Returns ``(xors, consumed, bad_hdr)``:
    ``xors`` the concatenated per-row xor streams, ``consumed[k]`` the
    section byte total (callers validate it against the blob length
    before trusting the row), ``bad_hdr`` rows whose headers claim
    sig < 1 (corrupt; caller must route them to the per-row decoder).
    Gather indices are clipped to the buffer — safe because callers
    only accept rows whose ``consumed`` matches exactly."""
    from .bitstream import segment_intra_indices

    k_rows = sec_starts.size
    # flags
    fpad = m_r + (-m_r) % 8
    f_bytes = fpad // 8
    gidx = np.repeat(sec_starts, f_bytes) + segment_intra_indices(f_bytes)
    gidx = np.minimum(gidx, buf.size - 1)  # clipped: validated by caller
    fbits = unpack_bits(buf[gidx], np.full(int(fpad.sum()), 1, np.int64))
    # drop per-row pads
    src = np.repeat(np.concatenate(([0], np.cumsum(fpad)))[:-1], m_r) + (
        segment_intra_indices(m_r)
    )
    flags = fbits[src].astype(bool)
    xrow_l = np.repeat(np.arange(k_rows), m_r)
    # headers
    c_r = np.zeros(k_rows, dtype=np.int64)
    if flags.size:
        c_r = np.bincount(xrow_l[flags], minlength=k_rows).astype(np.int64)
    hpad = c_r + (-c_r) % 2
    h_bytes = hpad * 12 // 8
    h_starts = sec_starts + f_bytes
    gidx = np.repeat(h_starts, h_bytes) + segment_intra_indices(h_bytes)
    gidx = np.minimum(gidx, buf.size - 1)  # clipped: validated by caller
    hbits = unpack_bits(buf[gidx], np.full(int(hpad.sum()), 12, np.int64))
    src = np.repeat(np.concatenate(([0], np.cumsum(hpad)))[:-1], c_r) + (
        segment_intra_indices(c_r)
    )
    headers = hbits[src]
    lz = (headers >> np.uint64(6)).astype(np.int64)
    tz = (headers & np.uint64(0x3F)).astype(np.int64)
    sig = 64 - lz - tz
    crow = np.repeat(np.arange(k_rows), c_r)
    # corrupt headers can claim lz+tz > 63 -> sig < 1, which would
    # size NEGATIVE payload cells; mark those rows for the registry
    # path and clamp so the batch math stays well-formed
    bad_hdr = np.zeros(k_rows, dtype=bool)
    oob = sig < 1
    if oob.any():
        np.logical_or.at(bad_hdr, crow[oob], True)
        sig = np.maximum(sig, 1)
    # payload cells (row-major changed order; cells sorted by width
    # within each row)
    vals = np.empty(sig.size, dtype=np.uint64)
    payload_bytes = np.zeros(k_rows, dtype=np.int64)
    if sig.size:
        order = np.lexsort((np.arange(sig.size), sig, crow))
        s_sig = sig[order]
        s_row = crow[order]
        cell_break = np.flatnonzero(
            (s_sig[1:] != s_sig[:-1]) | (s_row[1:] != s_row[:-1])
        ) + 1
        cstarts = np.concatenate(([0], cell_break))
        c_w = s_sig[cstarts]
        c_rw = s_row[cstarts]
        c_cnt = np.concatenate((cell_break, [s_sig.size])) - cstarts
        # vectorized _pad_count over all cells (a per-cell Python call
        # here was ~25% of the whole batch decode)
        c_pad = c_cnt + (-c_cnt) % (8 // np.gcd(c_w, 8))
        c_bytes = c_pad * c_w // 8
        # absolute byte start of each cell: row payload start + within-row
        # cumsum (cells are already sorted (row, w))
        p_starts = h_starts + h_bytes  # per selected row
        within = np.cumsum(c_bytes) - c_bytes
        # rebase at each row's FIRST cell (rows with zero cells have
        # no entries here, so index by cell runs, not by row id)
        row_change = np.concatenate(([True], c_rw[1:] != c_rw[:-1]))
        first_idx = np.flatnonzero(row_change)
        run_len = np.diff(np.append(first_idx, c_rw.size))
        within = within - np.repeat(within[first_idx], run_len)
        c_abs = p_starts[c_rw] + within
        # one variable-width window unpack over EVERY payload value at
        # its absolute bit position (cells pack contiguously from their
        # byte-aligned start, so value j of a width-w cell sits at
        # cell_byte*8 + j*w) — replaces the per-unique-width
        # gather/unpack/scatter loop, which was the measured residual
        # of the r7 batch decoders (~44 constant-cost iterations)
        rank = np.arange(s_sig.size, dtype=np.int64) - np.repeat(cstarts, c_cnt)
        pv = np.repeat(c_abs, c_cnt) * 8 + rank * s_sig
        vals[order] = unpack_bits_at(buf, s_sig, pv)
        np.add.at(payload_bytes, c_rw, c_bytes)
    xors = np.zeros(flags.size, dtype=np.uint64)
    xors[flags] = vals << tz.astype(np.uint64)
    consumed = f_bytes + h_bytes + payload_bytes
    return xors, consumed, bad_hdr


def _rowwise_prefix_xor(xors: np.ndarray, firsts: np.ndarray, m_r: np.ndarray) -> np.ndarray:
    """value bits for the non-first positions of every row: one global
    xor-scan with per-row resets (G ^ G[row_start-1] ^ first[row])."""
    if xors.size == 0:
        return np.empty(0, dtype=np.uint64)
    x_off = np.concatenate(([0], np.cumsum(m_r)))
    G = np.bitwise_xor.accumulate(xors)
    g_before = np.zeros(m_r.size, dtype=np.uint64)
    nz_rows = m_r > 0
    row_start = x_off[:-1]
    pick = nz_rows & (row_start > 0)
    g_before[pick] = G[row_start[pick] - 1]
    within = G ^ np.repeat(g_before, m_r)
    return np.repeat(firsts, m_r) ^ within


def decompress_batch(blobs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Batched inverse of :func:`compress_batch`; Chimp64 blobs decode in
    a few global passes, anything else falls back per row."""
    from . import registry

    n_rows = len(blobs)
    buf, blob_lens, blob_off, is_c64, counts = _batch_blob_layout(
        blobs, _CHIMP64_BYTE, 13
    )
    out_parts: dict[int, np.ndarray] = {}
    sel = np.flatnonzero(is_c64)
    if sel.size:
        starts = blob_off[sel]
        head = buf[starts[:, None] + np.arange(12)[None, :]]
        firsts = head[:, 4:12].copy().view(np.uint64).ravel()
        m_r = np.maximum(counts[sel] - 1, 0)
        x_off = np.concatenate(([0], np.cumsum(m_r)))
        xors, consumed, bad_hdr = _batch_decode_xor_sections(buf, starts + 12, m_r)
        series_bits = _rowwise_prefix_xor(xors, firsts, m_r)
        expected = 12 + consumed + 1
        valid = (expected == blob_lens[sel]) & ~bad_hdr
        for k, r in enumerate(sel):
            if not valid[k]:
                is_c64[r] = False  # structural mismatch -> registry path
                continue
            part = np.empty(counts[r], dtype=np.uint64)
            part[0] = firsts[k]
            part[1:] = series_bits[x_off[k] : x_off[k + 1]]
            out_parts[r] = part.view(np.float64)
    for r in np.flatnonzero(~is_c64):
        out_parts[r] = registry.decompress(bytes(blobs[r]))
        counts[r] = out_parts[r].size
    flat = (
        np.concatenate([out_parts[r] for r in range(n_rows)])
        if n_rows
        else np.empty(0, dtype=np.float64)
    )
    return flat, np.concatenate(([0], np.cumsum(counts)))


def decompress_batch_chimp128(blobs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Batched inverse of :func:`compress_batch_chimp128` (round 7,
    r6 verdict #3): the 7-bit back-offset section unpacks in one global
    fixed-width pass, the xor sections reuse the shared global decoder,
    and the parent-pointer forests of ALL rows resolve together with
    one pointer-jumping loop over the concatenated batch (parents are
    within-row, so global positions preserve the forest structure) —
    O(total · log max_row_len) instead of per-row Python passes.
    Foreign/corrupt blobs fall back to the per-row registry decoder."""
    from . import registry
    from .bitstream import segment_intra_indices

    n_rows = len(blobs)
    buf, blob_lens, blob_off, is_fast, counts = _batch_blob_layout(
        blobs, _CHIMP128_BYTE, 13
    )
    out_parts: dict[int, np.ndarray] = {}
    sel = np.flatnonzero(is_fast)
    if sel.size:
        starts = blob_off[sel]
        head = buf[starts[:, None] + np.arange(12)[None, :]]
        firsts = head[:, 4:12].copy().view(np.uint64).ravel()
        m_r = np.maximum(counts[sel] - 1, 0)
        x_off = np.concatenate(([0], np.cumsum(m_r)))
        # 7-bit back-offsets: gather the PADDED byte count per row (the
        # first ceil(7m/8) real bytes fully contain the m real values;
        # the padded tail reads into the next section but only feeds
        # discarded pad slots)
        opad = m_r + (-m_r) % 8
        o_pad_bytes = opad * 7 // 8
        o_real_bytes = (7 * m_r + 7) // 8
        o_starts = starts + 12
        gidx = np.repeat(o_starts, o_pad_bytes) + segment_intra_indices(o_pad_bytes)
        gidx = np.minimum(gidx, buf.size - 1)  # clipped: validated below
        obits = unpack_bits(buf[gidx], np.full(int(opad.sum()), 7, np.int64))
        src = np.repeat(np.concatenate(([0], np.cumsum(opad)))[:-1], m_r) + (
            segment_intra_indices(m_r)
        )
        offs = obits[src].astype(np.int64) + 1  # 1..128
        xors, consumed, bad_hdr = _batch_decode_xor_sections(
            buf, o_starts + o_real_bytes, m_r
        )
        expected = 12 + o_real_bytes + consumed + 1
        valid = (expected == blob_lens[sel]) & ~bad_hdr
        # globalized parent-pointer forests: non-first position i of row
        # k sits at global g = k_first + local; parent = g - offs
        n_r = counts[sel]
        g_off = np.concatenate(([0], np.cumsum(n_r)))
        root = np.repeat(g_off[:-1], n_r)
        pos = np.arange(int(g_off[-1]), dtype=np.int64)
        is_first = pos == root
        p = pos.copy()
        jump = np.zeros(pos.size, dtype=np.uint64)
        p[~is_first] = pos[~is_first] - offs
        jump[~is_first] = xors
        # corrupt offsets can point before the row start — send those
        # rows to the registry path and clamp so the loop terminates
        oob = p < root
        if oob.any():
            bad_rows = np.unique(np.searchsorted(g_off, pos[oob], side="right") - 1)
            valid[bad_rows] = False
            p[oob] = root[oob]
        while True:
            pending = p != root
            if not pending.any():
                break
            par = p[pending]
            jump[pending] ^= jump[par]
            p[pending] = p[par]
        bits = jump ^ np.repeat(firsts, n_r)
        series = bits.view(np.float64)
        for k, r in enumerate(sel):
            if not valid[k]:
                is_fast[r] = False
                continue
            out_parts[r] = series[g_off[k] : g_off[k + 1]]
    for r in np.flatnonzero(~is_fast):
        out_parts[r] = registry.decompress(bytes(blobs[r]))
        counts[r] = out_parts[r].size
    flat = (
        np.concatenate([out_parts[r] for r in range(n_rows)])
        if n_rows
        else np.empty(0, dtype=np.float64)
    )
    return flat, np.concatenate(([0], np.cumsum(counts)))


def _chimp128_predictors(bits: np.ndarray, row_of: np.ndarray | None = None) -> np.ndarray:
    """For each i >= 1, the predictor index j < i: the most recent index
    within the last 128 whose low-14-bit key matches bits[i-1]'s... —
    following chimp128.zig:77-91, the table is keyed by the low 14 bits of
    the *incoming* value and stores the last index that had that key.
    Falls back to i-1 when no match is in the 128-window.

    Vectorized: previous-occurrence-of-same-key via argsort over
    (key, position). With ``row_of`` (the batch path), matches are
    additionally confined to the same row, so the SINGLE definition of
    the predictor rule serves both encoders."""
    n = bits.size
    keys = (bits & np.uint64(0x3FFF)).astype(np.int64)
    if row_of is None:
        order = np.lexsort((np.arange(n), keys))
        same_group = (
            keys[order][1:] == keys[order][:-1]
            if n > 1
            else np.empty(0, dtype=bool)
        )
    else:
        order = np.lexsort((np.arange(n), keys, row_of))
        same_group = (
            (keys[order][1:] == keys[order][:-1])
            & (row_of[order][1:] == row_of[order][:-1])
            if n > 1
            else np.empty(0, dtype=bool)
        )
    prev_sorted = np.full(n, -1, dtype=np.int64)
    if n > 1:
        prev_sorted[1:][same_group] = order[:-1][same_group]
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
    n = check_decode_count(buf[:4].view(np.uint32)[0])
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
