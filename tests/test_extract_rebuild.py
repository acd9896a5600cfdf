"""extract/rebuild invariant: untouched round-trip is byte-identical
(port of /root/reference/src/tersets.zig:798-890)."""

from __future__ import annotations

import numpy as np
import pytest

from tersets_spark import Method, compress
from tersets_spark.kernels.extract import SUPPORTED, UnsupportedMethodError, extract, rebuild

_CFG = {
    "abs_error_bound": 0.5,
    "histogram_bins_number": 10,
    "area_under_curve_error": 1.0,
    "aggregate_error_type": "rmse",
    "aggregate_error_bound": 0.5,
    "target_point_count": 30,
    "number_of_coefficients": 8,
}

UNSUPPORTED = [
    Method.BitPackedQuantization,
    Method.SerfQT,
    Method.RunLengthEncoding,
    Method.BitPackedBUFF,
    Method.Chimp64,
    Method.Chimp128,
    Method.BitPackedDeltaEncoding,
    Method.MacaqueS,
    Method.MacaqueV,
    Method.Elf,
]


def _series() -> np.ndarray:
    rng = np.random.default_rng(17)
    i = np.arange(140, dtype=np.float64)
    return 40 * np.sin(i * 0.15) + 0.3 * i + rng.normal(0, 0.05, 140)


@pytest.mark.parametrize(
    "method", sorted(SUPPORTED, key=int), ids=lambda m: m.name
)
def test_extract_rebuild_byte_identical(method: Method) -> None:
    blob = compress(_series(), method, _CFG)
    indices, coeffs, m = extract(blob)
    assert m == method
    assert rebuild(indices, coeffs, m) == blob


@pytest.mark.parametrize("method", UNSUPPORTED, ids=lambda m: m.name)
def test_bitstream_methods_unsupported(method: Method) -> None:
    blob = compress(_series(), method, _CFG)
    with pytest.raises(UnsupportedMethodError):
        extract(blob)


def test_uncompressed_extract() -> None:
    v = _series()
    blob = compress(v, Method.Uncompressed)
    indices, coeffs, m = extract(blob)
    assert m == Method.Uncompressed and indices.size == 0
    assert np.array_equal(coeffs, v)
    assert rebuild(indices, coeffs, m) == blob


def test_coefficient_edit_changes_reconstruction() -> None:
    """The extract -> edit -> rebuild pipeline (src/tersets.zig §3.3)."""
    from tersets_spark import decompress

    blob = compress(_series(), Method.PoorMansCompressionMidrange, _CFG)
    indices, coeffs, m = extract(blob)
    shifted = rebuild(indices, coeffs + 100.0, m)
    out = decompress(shifted)
    base = decompress(blob)
    assert np.allclose(out - base, 100.0)
