"""extract / rebuild — decompose blobs into (indices, coefficients) and
re-serialize byte-identically.

Reference semantics: /root/reference/src/tersets.zig:467-628 (extract)
and :633-791 (rebuild) — the 15 segment/coefficient methods decompose
into u64 structural metadata + f64 model coefficients; callers may edit
coefficients; an untouched round-trip is byte-identical
(/root/reference/src/tersets.zig:887-888). Bit-stream codecs return an
unsupported-method error (:611-626) — mirrored here with
``UnsupportedMethodError``.

Layout registry mirrors the reference's extractor families
(/root/reference/src/utilities/extractors.zig): pairs (:47-69),
leading-coefficient forms (:81-102), triples (:113-133), adapted to the
engine's own payload formats.
"""

from __future__ import annotations

import numpy as np

from ..methods import Method

PAIR_METHODS = {
    Method.PoorMansCompressionMidrange,
    Method.PoorMansCompressionMean,
    Method.PiecewiseConstantHistogram,
    Method.SwingFilter,
    Method.VisvalingamWhyatt,
}
TRIPLE_METHODS = {
    Method.SwingFilterDisconnected,
    Method.SlideFilter,
    Method.PiecewiseLinearHistogram,
    Method.ABCLinearApproximation,
    Method.SlidingWindow,
    Method.BottomUp,
}
SUPPORTED = (
    PAIR_METHODS
    | TRIPLE_METHODS
    | {
        Method.SimPiece,
        Method.MixPiece,
        Method.LargestTriangleThreeBuckets,
        Method.DiscreteFourierTransform,
        Method.NonLinearApproximation,
    }
)


class UnsupportedMethodError(NotImplementedError):
    pass


def extract(blob: bytes) -> tuple[np.ndarray, np.ndarray, Method]:
    """Decompose a self-describing blob into (indices u64[],
    coefficients f64[], method)."""
    if not blob:
        return np.empty(0, np.uint64), np.empty(0, np.float64), Method.Uncompressed
    method = Method(blob[-1])
    payload = np.frombuffer(blob[:-1], dtype=np.uint8)
    if method == Method.Uncompressed:
        return (
            np.empty(0, np.uint64),
            payload.view(np.float64).copy(),
            method,
        )
    if method not in SUPPORTED:
        raise UnsupportedMethodError(
            f"extract unsupported for bit-stream method {method.name}"
        )  # mirrors src/tersets.zig:611-626
    u = payload.view(np.uint64) if payload.size % 8 == 0 else None
    if method in PAIR_METHODS:
        return u[1::2].copy(), u[0::2].view(np.float64).copy(), method
    if method in TRIPLE_METHODS:
        coeffs = np.empty(2 * (u.size // 3), dtype=np.float64)
        coeffs[0::2] = u[0::3].view(np.float64)
        coeffs[1::2] = u[1::3].view(np.float64)
        return u[2::3].copy(), coeffs, method
    if method == Method.LargestTriangleThreeBuckets:
        coeffs = np.concatenate(
            ([u[:1].view(np.float64)[0]], u[1::2].view(np.float64))
        )
        return u[2::2].copy(), coeffs, method
    if method in (Method.SimPiece, Method.MixPiece):
        head = payload[:16].view(np.uint32).astype(np.uint64)
        n_b, n_a = int(head[2]), int(head[3])
        pos = 16
        intercepts = payload[pos : pos + 8 * n_b].view(np.float64)
        pos += 8 * n_b
        slopes = payload[pos : pos + 8 * n_a].view(np.float64)
        pos += 8 * n_a
        tail = payload[pos:]
        # structural tail kept verbatim as u64-padded words
        pad = (-tail.size) % 8
        tail_words = np.concatenate([tail, np.zeros(pad, np.uint8)]).view(np.uint64)
        # NB: concatenate only uint64 arrays — mixing in a Python list
        # would promote to float64 and corrupt arbitrary bit patterns
        indices = np.concatenate(
            [head, np.array([tail.size], dtype=np.uint64), tail_words]
        )
        return indices, np.concatenate([intercepts, slopes]), method
    if method == Method.DiscreteFourierTransform:
        n = int(payload[0:4].view(np.uint32)[0])
        k = int(payload[4:8].view(np.uint32)[0])
        idx = payload[8 : 8 + 4 * k].view(np.uint32).astype(np.uint64)
        coeffs = payload[8 + 4 * k :].view(np.float64).copy()
        return (
            np.concatenate([np.array([n, k], dtype=np.uint64), idx]),
            coeffs,
            method,
        )
    if method == Method.NonLinearApproximation:
        n_seg = int(payload[0:4].view(np.uint32)[0])
        fams = np.empty(n_seg, np.uint64)
        ends = np.empty(n_seg, np.uint64)
        coeffs = np.empty(3 * n_seg, np.float64)
        pos, rec = 4, 33
        for i in range(n_seg):
            fams[i] = payload[pos]
            ends[i] = payload[pos + 1 : pos + 9].view(np.uint64)[0]
            coeffs[3 * i : 3 * i + 3] = payload[pos + 9 : pos + 33].view(np.float64)
            pos += rec
        return (
            np.concatenate([np.array([n_seg], dtype=np.uint64), fams, ends]),
            coeffs,
            method,
        )
    raise UnsupportedMethodError(method.name)


def rebuild(indices: np.ndarray, coefficients: np.ndarray, method: Method) -> bytes:
    """Inverse of :func:`extract`; untouched round-trip is
    byte-identical."""
    method = Method(method)
    indices = np.ascontiguousarray(indices, dtype=np.uint64)
    coefficients = np.ascontiguousarray(coefficients, dtype=np.float64)
    tail = bytes([int(method)])
    if method == Method.Uncompressed:
        return coefficients.tobytes() + tail
    if method in PAIR_METHODS:
        out = np.empty(2 * indices.size, dtype=np.uint64)
        out[0::2] = coefficients.view(np.uint64)
        out[1::2] = indices
        return out.tobytes() + tail
    if method in TRIPLE_METHODS:
        out = np.empty(3 * indices.size, dtype=np.uint64)
        out[0::3] = coefficients[0::2].view(np.uint64)
        out[1::3] = coefficients[1::2].view(np.uint64)
        out[2::3] = indices
        return out.tobytes() + tail
    if method == Method.LargestTriangleThreeBuckets:
        out = np.empty(1 + 2 * indices.size, dtype=np.uint64)
        out[0] = coefficients[:1].view(np.uint64)[0]
        out[1::2] = coefficients[1:].view(np.uint64)
        out[2::2] = indices
        return out.tobytes() + tail
    if method in (Method.SimPiece, Method.MixPiece):
        head = indices[:4].astype(np.uint32)
        n_b, n_a = int(head[2]), int(head[3])
        tail_len = int(indices[4])
        tail_words = indices[5:]
        tail_bytes = tail_words.view(np.uint8)[:tail_len]
        return (
            head.tobytes()
            + coefficients[:n_b].tobytes()
            + coefficients[n_b : n_b + n_a].tobytes()
            + tail_bytes.tobytes()
            + tail
        )
    if method == Method.DiscreteFourierTransform:
        n, k = int(indices[0]), int(indices[1])
        return (
            np.uint32(n).tobytes()
            + np.uint32(k).tobytes()
            + indices[2:].astype(np.uint32).tobytes()
            + coefficients.tobytes()
            + tail
        )
    if method == Method.NonLinearApproximation:
        n_seg = int(indices[0])
        fams = indices[1 : 1 + n_seg]
        ends = indices[1 + n_seg :]
        out = bytearray(np.uint32(n_seg).tobytes())
        for i in range(n_seg):
            out += np.uint8(int(fams[i])).tobytes()
            out += np.uint64(ends[i]).tobytes()
            out += coefficients[3 * i : 3 * i + 3].tobytes()
        return bytes(out) + tail
    raise UnsupportedMethodError(method.name)
