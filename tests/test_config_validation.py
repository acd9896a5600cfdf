"""Strict configuration validation at kernel dispatch — the engine
analog of the reference's InvalidConfiguration negative tests
(/root/reference/src/configuration.zig:303-344)."""

from __future__ import annotations

import numpy as np
import pytest

from tersets_spark import Method, compress
from tersets_spark.methods import (
    REQUIRED_CONFIG_FIELDS,
    InvalidConfigurationError,
    validate_config,
)

V = np.arange(10, dtype=np.float64)


def test_unknown_field_rejected():
    with pytest.raises(InvalidConfigurationError, match="unknown"):
        compress(V, Method.SwingFilter, {"abs_error_bound": 1.0, "epsilon": 1.0})
    # the reference's own known quirk: its default builder emits
    # target_precision, which the parser does not accept
    # (configuration.zig:214-221) — strict parse rejects it here too
    with pytest.raises(InvalidConfigurationError, match="unknown"):
        compress(V, Method.BitPackedBUFF, {"target_precision": 4})


@pytest.mark.parametrize(
    "method", sorted(REQUIRED_CONFIG_FIELDS, key=int), ids=lambda m: m.name
)
def test_missing_required_field_rejected(method):
    with pytest.raises(InvalidConfigurationError, match="requires"):
        compress(V, method, {})


def test_lossless_methods_accept_empty_config():
    for m in (Method.Uncompressed, Method.Chimp64, Method.BitPackedDeltaEncoding,
              Method.RunLengthEncoding, Method.Elf, Method.Chimp128,
              Method.BitPackedBUFF):
        compress(V, m, {})
        compress(V, m, None)


def test_union_config_accepted():
    """A config carrying every known field is valid for any method
    (the reference Configuration struct holds all fields at once)."""
    cfg = {
        "abs_error_bound": 0.5,
        "histogram_bins_number": 4,
        "area_under_curve_error": 1.0,
        "aggregate_error_type": "rmse",
        "aggregate_error_bound": 0.5,
        "target_point_count": 5,
        "number_of_coefficients": 3,
        "decimal_precision": 6,
    }
    for m in (Method.SwingFilter, Method.BottomUp, Method.DiscreteFourierTransform,
              Method.LargestTriangleThreeBuckets, Method.Chimp64):
        out = compress(V, m, cfg)
        assert out and out[-1] in (int(m), int(Method.Uncompressed))


def test_validate_config_returns_dict():
    assert validate_config(Method.Chimp64, None) == {}
    with pytest.raises(InvalidConfigurationError):
        validate_config(Method.SwingFilter, {"abs_error_bound": 1.0, "x": 1})
