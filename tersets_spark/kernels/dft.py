"""Discrete Fourier Transform compression (method 22).

Reference semantics:
/root/reference/src/lossy_compression/domain_transformation/discrete_fourier_transform.zig:47-
— real FFT (PocketFFT in the reference; ``np.fft`` here), keep the
top-K-magnitude coefficients (DC and Nyquist live in the same rfft
spectrum), inverse FFT on decompress. Limit 2^32-1 values (:53-56).

Engine payload:
    u32 n | u32 k | u32 indices[k] | f64 re[k] | f64 im[k]
"""

from __future__ import annotations

import numpy as np

from ..methods import Method, check_decode_count
from .registry import register


def compress(values: np.ndarray, config: dict | None = None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = v.size
    k = int((config or {}).get("number_of_coefficients", 0))
    if k < 1:
        raise ValueError("DFT requires number_of_coefficients >= 1")
    spec = np.fft.rfft(v)
    k = min(k, spec.size)
    top = np.argpartition(np.abs(spec), -k)[-k:]
    top = np.sort(top)
    return b"".join(
        [
            np.uint32(n).tobytes(),
            np.uint32(k).tobytes(),
            top.astype(np.uint32).tobytes(),
            np.ascontiguousarray(spec[top].real).tobytes(),
            np.ascontiguousarray(spec[top].imag).tobytes(),
        ]
    )


def decompress(payload: bytes) -> np.ndarray:
    buf = np.frombuffer(payload, dtype=np.uint8)
    n = check_decode_count(buf[0:4].view(np.uint32)[0])
    k = check_decode_count(buf[4:8].view(np.uint32)[0], "coefficient count")
    pos = 8
    idx = buf[pos : pos + 4 * k].view(np.uint32).astype(np.int64)
    pos += 4 * k
    re = buf[pos : pos + 8 * k].view(np.float64)
    pos += 8 * k
    im = buf[pos : pos + 8 * k].view(np.float64)
    spec = np.zeros(n // 2 + 1, dtype=np.complex128)
    # component-wise assignment, NOT re + 1j*im: the complex addition
    # would turn a stored -0.0 real part into +0.0 and the reconstructed
    # spectrum would no longer be bit-exact (invariant check_dft)
    spec.real[idx] = re
    spec.imag[idx] = im
    return np.fft.irfft(spec, n=n)


register(Method.DiscreteFourierTransform, compress, decompress)
