"""Uncompressed passthrough codec (method 0).

Reference: /root/reference/src/tersets.zig:337-342 — raw 8-byte IEEE-754
little-endian per value. Bit-for-bit lossless including NaN payloads and
-0.0.
"""

from __future__ import annotations

import numpy as np


def compress(values: np.ndarray, config: dict | None = None) -> bytes:
    return np.ascontiguousarray(values, dtype=np.float64).tobytes()


def decompress(payload: bytes) -> np.ndarray:
    if len(payload) % 8 != 0:
        raise ValueError("corrupt Uncompressed payload: length % 8 != 0")
    return np.frombuffer(payload, dtype=np.float64).copy()
