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


def decompress_batch(blobs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Decode a batch of self-describing blobs -> (flat float64,
    offsets). All four lossless batch codecs (delta, Chimp64, Chimp128,
    Elf) decode in global vectorized passes; other methods fall back
    per row."""
    if not blobs:
        return np.empty(0, dtype=np.float64), np.zeros(1, dtype=np.int64)
    tails = np.fromiter(
        ((b[-1] if len(b) else 255) for b in blobs), dtype=np.int64, count=len(blobs)
    )
    # choose the dominant fast path; its batch decoder falls back per-row
    # for foreign blobs, so one call always suffices
    best, best_n = Method.BitPackedDeltaEncoding, -1
    for meth in _BATCH_DECOMPRESS:
        n = int((tails == int(meth)).sum())
        if n > best_n:
            best, best_n = meth, n
    return _BATCH_DECOMPRESS[best](blobs)
