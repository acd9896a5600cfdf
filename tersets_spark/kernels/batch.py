"""Batched codec dispatch: route whole Arrow batches of blobs/series to
the fastest kernel implementation.

Batched implementations exist for the four lossless codecs
(BitPackedDeltaEncoding, Chimp64, Chimp128, Elf); everything else runs
per row
through the registry. Batch-produced blobs are byte-identical to the
single-series encoders, so the two paths interoperate freely.
"""

from __future__ import annotations

import numpy as np

from ..methods import Method
from . import chimp, delta, elf, registry

_BATCH_COMPRESS = {
    Method.BitPackedDeltaEncoding: delta.compress_batch,
    Method.Chimp64: chimp.compress_batch,
    Method.Chimp128: chimp.compress_batch_chimp128,
    Method.Elf: elf.compress_batch,
}


def compress_batch(
    flat: np.ndarray, offsets: np.ndarray, method: Method, config: dict | None = None
) -> list[bytes]:
    """Compress many series (concatenated in ``flat`` with ``offsets``)
    into per-row self-describing blobs."""
    fn = _BATCH_COMPRESS.get(Method(method))
    if fn is not None and not config:
        return fn(flat, offsets)
    offsets = np.asarray(offsets, dtype=np.int64)
    return [
        registry.compress(flat[offsets[i] : offsets[i + 1]], method, config or {})
        for i in range(offsets.size - 1)
    ]


_BATCH_DECOMPRESS = {
    Method.BitPackedDeltaEncoding: delta.decompress_batch,
    Method.Chimp64: chimp.decompress_batch,
    Method.Chimp128: chimp.decompress_batch_chimp128,
    Method.Elf: elf.decompress_batch,
}


def _decompress_rows(blobs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Per-row registry decode with the (flat, offsets) batch shape —
    the obviously-correct fallback for method bytes that have no batch
    decoder (r7 verdict #5: previously these piggybacked on the
    dominant fast decoder's INTERNAL fallback, correct but subtle)."""
    arrs = [registry.decompress(b) for b in blobs]
    offs = np.concatenate(
        ([0], np.cumsum([a.size for a in arrs]))
    ).astype(np.int64)
    flat = (
        np.concatenate(arrs).astype(np.float64, copy=False)
        if arrs
        else np.empty(0, dtype=np.float64)
    )
    return flat, offs


def decompress_batch(blobs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Decode a batch of self-describing blobs -> (flat float64,
    offsets). Rows are ROUTED BY METHOD BYTE: each of the four lossless
    batch codecs (delta, Chimp64, Chimp128, Elf) decodes ALL of its
    rows in one global vectorized pass, so a mixed-method batch (tiers
    compacted at different epochs with different codecs) never degrades
    a method's rows to the per-row path; genuinely foreign methods
    (no batch decoder) decode per row through the registry."""
    if not blobs:
        return np.empty(0, dtype=np.float64), np.zeros(1, dtype=np.int64)
    n_rows = len(blobs)
    tails = np.fromiter(
        ((b[-1] if len(b) else 255) for b in blobs), dtype=np.int64, count=n_rows
    )
    groups: list[tuple[np.ndarray, object]] = []
    routed = np.zeros(n_rows, dtype=bool)
    for meth, fn in _BATCH_DECOMPRESS.items():
        sel = np.flatnonzero(tails == int(meth))
        if sel.size:
            groups.append((sel, fn))
            routed[sel] = True
    rest = np.flatnonzero(~routed)
    if rest.size:  # methods without a batch decoder: registry, per row
        groups.append((rest, _decompress_rows))
    if len(groups) == 1:
        return groups[0][1](blobs)
    parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    for sel, fn in groups:
        gflat, goffs = fn([blobs[i] for i in sel])
        parts.append((sel, gflat, goffs))
    counts = np.zeros(n_rows, dtype=np.int64)
    for sel, _, goffs in parts:
        counts[sel] = np.diff(goffs)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    flat = np.empty(int(offsets[-1]), dtype=np.float64)
    from .bitstream import segment_intra_indices

    for sel, gflat, goffs in parts:
        # scatter each group's rows back to their original slots
        dst = np.repeat(offsets[sel], counts[sel]) + segment_intra_indices(
            counts[sel]
        )
        flat[dst] = gflat
    return flat, offsets
