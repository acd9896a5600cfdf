"""Method-specific driver invariants — the engine analogs of the
reference's per-method inline test blocks, checkable in-kernel so the
driver's DuckDB oracle can gate them as an all-true column.

Each check receives ``(v, blob, out, cfg)`` — the original series, the
self-describing compressed blob (trailing method byte, reference
``src/tersets.zig:352``), the decompressed reconstruction and the
compression config — and returns True iff the method's published
invariant holds:

* SlidingWindow / BottomUp — per-segment RMSE of the endpoint line
  <= ``aggregate_error_bound`` (reference
  ``src/lossy_compression/line_simplification/sliding_window.zig:54-100``,
  ``bottom_up.zig:51``).
* VisvalingamWhyatt — surviving knots are exact input points, endpoints
  kept, and every surviving interior knot's effective triangle area
  exceeds ``area_under_curve_error``
  (``visvalingam_whyatt.zig:53``, area at ``shared_functions.zig:389-398``).
* PWCH / PWLH — at most ``histogram_bins_number`` buckets covering the
  series; PWCH bucket values are the exact midrange of their bucket,
  PWLH segments the least-squares line (``histogram_representation.zig:63-130``).
* BUFF — |v - out| <= 0.5 * 10^-decimal_precision for representable
  values, raw escapes bit-exact (``bounded_fast_floats.zig:81``,
  Table-2 lookup ``:54``).
* DFT — the kept coefficients are a top-K-magnitude subset of the
  series' own rfft spectrum, stored bit-exactly, and the reconstruction
  is the inverse transform of that truncated spectrum
  (``discrete_fourier_transform.zig:47``).
* LTTB — first/last kept, selected points are EXACT input points, one
  knot per bucket, knot count == min(target, n)
  (``largest_triangle_three_buckets.zig:49-127``).

All functions are pure numpy and run inside the mapInPandas kernel on
executors (imported from the shipped package zip — never pickled as
closures).
"""

from __future__ import annotations

import numpy as np

_TOL = 1e-9


def _bits_eq(a: np.ndarray, b: np.ndarray) -> bool:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return a.size == b.size and bool(
        np.array_equal(a.view(np.uint64), b.view(np.uint64))
    )


def _edge(v: np.ndarray, blob: bytes, out: np.ndarray) -> bool | None:
    """Reference edge rules: empty -> empty blob; single value stored
    Uncompressed. Returns the verdict, or None when the blob really is
    the method under test."""
    if v.size == 0:
        return len(blob) == 0 and out.size == 0
    if len(blob) and blob[-1] == 0:  # Method.Uncompressed escape
        return _bits_eq(v, out)
    return None


def _triples(blob: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    raw = np.frombuffer(blob[:-1], dtype=np.uint64)
    sv = raw[0::3].view(np.float64)
    ev = raw[1::3].view(np.float64)
    ends = raw[2::3].astype(np.int64)
    return sv, ev, ends


def check_error_bound(v, blob, out, cfg) -> bool:
    """Generic lossy gate (reference tester.zig:508-533): the
    reconstruction has the input's length and every finite point is
    within ``abs_error_bound``. The consolidated-catalog form of
    operators.compress.error_bound_verify — identical tolerance."""
    if out.size != v.size:
        return False
    eps = float(cfg.get("abs_error_bound", 0.0))
    if eps > 0 and v.size:
        finite = np.isfinite(v)
        err = np.abs(v[finite] - out[finite])
        return bool(err.size == 0 or err.max() <= eps + _TOL)
    return True


def check_rmse_segments(v, blob, out, cfg) -> bool:
    edge = _edge(v, blob, out)
    if edge is not None:
        return edge
    bound = float(cfg["aggregate_error_bound"])
    sv, ev, ends = _triples(blob)
    if out.size != v.size or ends.size == 0 or int(ends[-1]) != v.size - 1:
        return False
    if np.any(np.diff(ends) <= 0):
        return False
    starts = np.concatenate(([0], ends[:-1] + 1))
    for s, e, a, b in zip(starts, ends, sv, ev):
        seg = v[s : e + 1]
        if not np.isfinite(seg).all():
            if e != s:
                return False  # non-finite values must be singletons
            continue
        if abs(a - seg[0]) > _TOL or abs(b - seg[-1]) > _TOL:
            return False
        if e == s:
            continue
        t = np.arange(0, e - s + 1, dtype=np.float64)
        line = a + (b - a) * t / (e - s)
        rmse = float(np.sqrt(np.mean((seg - line) ** 2)))
        if rmse > bound + _TOL:
            return False
    return True


def check_vw_knots(v, blob, out, cfg) -> bool:
    edge = _edge(v, blob, out)
    if edge is not None:
        return edge
    bound = float(cfg["area_under_curve_error"])
    raw = np.frombuffer(blob[:-1], dtype=np.uint64)
    kv = raw[0::2].view(np.float64)
    ki = raw[1::2].astype(np.int64)
    if out.size != v.size or ki.size < 2:
        return False
    if ki[0] != 0 or int(ki[-1]) != v.size - 1 or np.any(np.diff(ki) <= 0):
        return False
    if not _bits_eq(kv, v[ki]):
        return False  # knots must be EXACT input points
    # every surviving interior knot's effective triangle area > bound
    if ki.size > 2:
        x1, x2, x3 = ki[:-2].astype(np.float64), ki[1:-1].astype(np.float64), ki[2:].astype(np.float64)
        y1, y2, y3 = kv[:-2], kv[1:-1], kv[2:]
        area = np.abs((x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)) / 2
        finite = np.isfinite(area)
        if np.any(area[finite] <= bound - _TOL):
            return False
    return True


def check_pwch(v, blob, out, cfg) -> bool:
    edge = _edge(v, blob, out)
    if edge is not None:
        return edge
    # the histogram kernels REJECT non-finite input (histogram.py raises
    # before encoding), so no valid multi-point blob exists for such a
    # series — fail deterministically instead of letting NaN comparisons
    # decide (NaN != NaN would redden PWCH and silently green PWLH)
    if not np.isfinite(v).all():
        return False
    k = int(cfg["histogram_bins_number"])
    raw = np.frombuffer(blob[:-1], dtype=np.uint64)
    vals = raw[0::2].view(np.float64)
    ends = raw[1::2].astype(np.int64)  # end-exclusive
    if ends.size == 0 or ends.size > k or int(ends[-1]) != v.size:
        return False
    if np.any(np.diff(ends) <= 0) or out.size != v.size:
        return False
    starts = np.concatenate(([0], ends[:-1]))
    for s, e, val in zip(starts, ends, vals):
        seg = v[s:e]
        mid = (float(seg.max()) + float(seg.min())) / 2
        if abs(val - mid) > _TOL * max(1.0, abs(mid)):
            return False
        if np.any(out[s:e] != val):
            return False
    return True


def check_pwlh(v, blob, out, cfg) -> bool:
    edge = _edge(v, blob, out)
    if edge is not None:
        return edge
    if not np.isfinite(v).all():  # see check_pwch — kernel rejects these
        return False
    k = int(cfg["histogram_bins_number"])
    sv, ev, ends = _triples(blob)
    if ends.size == 0 or ends.size > k or int(ends[-1]) != v.size - 1:
        return False
    if np.any(np.diff(ends) <= 0) or out.size != v.size:
        return False
    from ..kernels.histogram import _lsq_prefix, _lsq_sse

    pref = _lsq_prefix(v)
    starts = np.concatenate(([0], ends[:-1] + 1))
    for s, e, a, b in zip(starts, ends, sv, ev):
        # endpoints must be the least-squares line over [s, e] — same
        # normal equations (and prefix sums) as the encoder, so exact
        _, slope, b0 = _lsq_sse(pref, int(s), int(e))
        scale = max(1.0, float(np.abs(v[s : e + 1]).max()))
        if abs(a - b0) > _TOL * scale or abs(b - (b0 + slope * (e - s))) > _TOL * scale:
            return False
    return True


def check_buff(v, blob, out, cfg) -> bool:
    edge = _edge(v, blob, out)
    if edge is not None:
        return edge
    d = int(cfg.get("decimal_precision", 6))
    tol = 0.5 * 10.0 ** (-d) * (1 + 1e-9) + 1e-12
    if out.size != v.size:
        return False
    with np.errstate(over="ignore", invalid="ignore"):
        scaled = np.round(v * 10.0**d)
        ok = np.isfinite(v) & (np.abs(v) < 2**32) & (np.abs(scaled) < 2**62)
    if np.any(np.abs(v[ok] - out[ok]) > tol):
        return False
    return _bits_eq(v[~ok], out[~ok])


def check_dft(v, blob, out, cfg) -> bool:
    edge = _edge(v, blob, out)
    if edge is not None:
        return edge
    k_cfg = int(cfg["number_of_coefficients"])
    buf = np.frombuffer(blob[:-1], dtype=np.uint8)
    n = int(buf[0:4].view(np.uint32)[0])
    k = int(buf[4:8].view(np.uint32)[0])
    pos = 8
    idx = buf[pos : pos + 4 * k].view(np.uint32).astype(np.int64)
    pos += 4 * k
    re = buf[pos : pos + 8 * k].view(np.float64)
    pos += 8 * k
    im = buf[pos : pos + 8 * k].view(np.float64)
    spec = np.fft.rfft(v)
    if n != v.size or k != min(k_cfg, spec.size):
        return False
    if np.any(np.diff(idx) <= 0):
        return False
    # stored coefficients are bit-exact spectrum entries
    if not (_bits_eq(re, spec[idx].real) and _bits_eq(im, spec[idx].imag)):
        return False
    # top-K optimality: every kept magnitude >= every dropped magnitude
    mags = np.abs(spec)
    dropped = np.setdiff1d(np.arange(spec.size), idx, assume_unique=True)
    if dropped.size and mags[idx].min() < mags[dropped].max() - _TOL:
        return False
    trunc = np.zeros_like(spec)
    trunc[idx] = spec[idx]
    return _bits_eq(out, np.fft.irfft(trunc, n=n))


def check_lttb(v, blob, out, cfg) -> bool:
    edge = _edge(v, blob, out)
    if edge is not None:
        return edge
    k = int(cfg["target_point_count"])
    raw = np.frombuffer(blob[:-1], dtype=np.uint64)
    kv = np.concatenate(([raw[:1].view(np.float64)[0]], raw[1::2].view(np.float64)))
    ki = np.concatenate(([0], raw[2::2].astype(np.int64)))
    n = v.size
    expect = n if k >= n else (k if k >= 3 else 2)
    if ki.size != expect or int(ki[-1]) != n - 1 or np.any(np.diff(ki) <= 0):
        return False
    if not _bits_eq(kv, v[ki]):
        return False  # selected points must be EXACT input points
    if 3 <= k < n:
        # one knot per interior bucket (reference bucket split :58-66)
        edges = np.linspace(1, n - 1, k - 1).astype(np.int64)
        for b in range(k - 2):
            lo, hi = int(edges[b]), int(edges[b + 1])
            if hi <= lo:
                hi = lo + 1
            if not (lo <= ki[b + 1] < hi):
                return False
    return out.size == n


#: method code -> in-kernel invariant, resolved by NAME on executors
CHECKS = {
    "error_bound": check_error_bound,
    "rmse_segments": check_rmse_segments,
    "vw_knots": check_vw_knots,
    "pwch": check_pwch,
    "pwlh": check_pwlh,
    "buff": check_buff,
    "dft": check_dft,
    "lttb": check_lttb,
}
