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


def test_edit_scale_by_power_of_two_is_bit_exact():
    """extract → coeffs*2 → rebuild → decode == 2 * decode(original),
    bit-for-bit, for every linear-in-coefficients segment method (the
    edit path of reference src/tersets.zig:467-791). 2.0 is a power of
    two, so scaling is rounding-free and distributes exactly through
    any +/-/*// decoder dataflow."""
    import numpy as np

    import __spark_entry__ as e
    from tersets_spark.kernels import registry
    from tersets_spark.kernels.extract import extract, rebuild
    from tersets_spark.methods import Method

    rng = np.random.default_rng(11)
    series = [
        rng.integers(32, 1000, 300).astype(np.float64),
        np.sin(np.linspace(0, 15, 257)) * 250 + 400,
        np.repeat(rng.integers(0, 50, 12), 25).astype(np.float64),
        rng.normal(0, 1e6, 64),
    ]
    for code, cfg in sorted(e._EDIT_CONFIGS.items()):
        m = Method(code)
        for v in series:
            blob = registry.compress(v, m, cfg)
            base = registry.decompress(blob)
            idx, coeffs, m2 = extract(blob)
            out = registry.decompress(rebuild(idx, coeffs * 2.0, m2))
            want = base * 2.0
            assert out.size == want.size, m.name
            assert np.array_equal(out.view(np.uint64), want.view(np.uint64)), (
                m.name,
                np.nonzero(out != want)[0][:5],
            )


def test_neats_edit_exclusion_rationale():
    """Pin WHY NonLinearApproximation is excluded from _EDIT_CONFIGS:
    when an exp-family segment wins, the decode is a*exp(b*x) —
    nonlinear in b — so doubling every coefficient does NOT double the
    curve. If this ever stops failing (e.g. the family set changes),
    reconsider including NeaTS in the edit sweep."""
    import numpy as np

    from tersets_spark.kernels import registry
    from tersets_spark.kernels.extract import extract, rebuild
    from tersets_spark.methods import Method

    x = np.arange(200, dtype=np.float64)
    v = 3.0 * np.exp(0.04 * x)  # clean exponential → fam-2 segment
    blob = registry.compress(v, Method.NonLinearApproximation, {"abs_error_bound": 0.5})
    idx, coeffs, m2 = extract(blob)
    fams = idx[1 : 1 + int(idx[0])]
    if not (fams == 2).any():  # pragma: no cover - guards the premise
        import pytest

        pytest.skip("encoder no longer picks the exp family here")
    base = registry.decompress(blob)
    out = registry.decompress(rebuild(idx, coeffs * 2.0, m2))
    assert not np.array_equal(out, base * 2.0)
