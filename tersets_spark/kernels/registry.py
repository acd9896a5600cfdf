"""Kernel dispatch — the engine analog of the reference's method switch
(/root/reference/src/tersets.zig:136-351 compress, :377-458 decompress).

Top-level :func:`compress` / :func:`decompress` keep the reference's
conventions:

* the last byte of every blob is the method code
  (/root/reference/src/tersets.zig:352, read back at :370-374);
* empty input -> empty blob; a single value is stored raw with method
  byte ``Uncompressed`` regardless of the requested method
  (/root/reference/src/tersets.zig:127-134).
"""

from __future__ import annotations

import numpy as np

from ..methods import Method
from . import chimp, delta, rle, uncompressed

__all__ = ["compress", "decompress", "KERNELS", "register"]

# method -> (compress_fn(values, config) -> payload_bytes,
#            decompress_fn(payload_bytes) -> np.ndarray[float64])
KERNELS: dict[Method, tuple] = {
    Method.Uncompressed: (uncompressed.compress, uncompressed.decompress),
    Method.RunLengthEncoding: (rle.compress, rle.decompress),
    Method.BitPackedDeltaEncoding: (delta.compress, delta.decompress),
    Method.Chimp64: (chimp.compress_chimp64, chimp.decompress_chimp64),
    Method.Chimp128: (chimp.compress_chimp128, chimp.decompress_chimp128),
}


def register(method: Method, compress_fn, decompress_fn) -> None:
    KERNELS[method] = (compress_fn, decompress_fn)


def _load_optional_kernels() -> None:
    """Import the rest of the catalog (each module self-registers via
    :func:`register`); a missing long-tail kernel never blocks the core
    lossless path."""
    import importlib

    for mod in (
        "pmc",
        "quantization",
        "swing_slide",
        "sim_piece",
        "mix_piece",
        "lttb",
        "dft",
        "serf_qt",
        "histogram",
        "seg_rmse",
        "vw",
        "abc_linear",
        "buff",
        "macaque",
        "elf",
        "nonlinear",
    ):
        try:
            importlib.import_module(f".{mod}", __package__)
        except ImportError:
            continue


_load_optional_kernels()


def compress(values: np.ndarray, method: Method, config: dict | None = None) -> bytes:
    """Compress one series; returns payload + trailing method byte."""
    from ..methods import MAX_DECODE_VALUES, validate_config

    method = Method(method)
    v = np.ascontiguousarray(values, dtype=np.float64)
    # strict config validation runs BEFORE the size edge rules — a
    # misconfigured pipeline must fail on short series too (the
    # reference parses config before compressing, configuration.zig:90)
    cfg = validate_config(method, config)
    if v.size > MAX_DECODE_VALUES:
        # symmetric with the decoder's corrupt-count cap: never emit a
        # blob decompress() would refuse — chunk longer series upstream
        # (operators/compress.py CHUNK)
        raise ValueError(
            f"series of {v.size} values exceeds MAX_DECODE_VALUES "
            f"({MAX_DECODE_VALUES}); chunk before compressing"
        )
    if v.size == 0:
        return b""
    if v.size == 1:
        # reference edge rule: single value stored raw (tersets.zig:127-134)
        return v.tobytes() + bytes([int(Method.Uncompressed)])
    if method not in KERNELS:
        raise NotImplementedError(f"method {method.name} not implemented")
    payload = KERNELS[method][0](v, cfg)
    return payload + bytes([int(method)])


class CorruptBlobError(ValueError):
    """A blob failed structural validation during decode (mirrors the
    reference's CorruptedCompressedData paths, e.g.
    poor_mans_compression.zig:217, swing_slide_filter.zig:767)."""


def decompress(blob: bytes) -> np.ndarray:
    """Decompress a self-describing blob (method code in last byte)."""
    if len(blob) == 0:
        return np.empty(0, dtype=np.float64)
    try:
        method = Method(blob[-1])
    except ValueError as ex:
        raise CorruptBlobError(f"unknown method byte {blob[-1]}") from ex
    if method not in KERNELS:
        raise NotImplementedError(f"method {method.name} not implemented")
    try:
        return KERNELS[method][1](blob[:-1])
    except CorruptBlobError:
        raise
    except (ValueError, IndexError) as ex:
        raise CorruptBlobError(
            f"corrupt {method.name} blob ({len(blob)} bytes): {ex}"
        ) from ex
