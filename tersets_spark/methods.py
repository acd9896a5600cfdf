"""Method catalog for the tersets_spark engine.

Mirrors the reference TerseTS ``Method`` enum with the same stable
integer codes 0-26 (reference: /root/reference/src/tersets.zig:81-112,
codes pinned at /root/reference/src/capi.zig:290-318). The engine keeps
the reference's self-describing blob convention: the LAST byte of every
compressed blob is the method code (/root/reference/src/tersets.zig:352),
so blobs survive shuffles and checkpoints without side metadata.

The payload layouts are the engine's own numpy-vectorized formats
(sectioned/columnar where the reference uses interleaved bit streams);
we claim *semantic* equivalence — lossless methods round-trip
bit-for-bit, lossy methods satisfy the per-point absolute error bound —
not byte-compatibility with the Zig formats (see SURVEY.md §7 risk
register).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


class Method(enum.IntEnum):
    """Compression methods, codes identical to the reference.

    Reference: /root/reference/src/tersets.zig:81-112 and
    /root/reference/src/capi.zig:290-318 (code pinning test).
    """

    Uncompressed = 0
    PoorMansCompressionMidrange = 1
    PoorMansCompressionMean = 2
    SwingFilter = 3
    SwingFilterDisconnected = 4
    SlideFilter = 5
    SimPiece = 6
    PiecewiseConstantHistogram = 7
    PiecewiseLinearHistogram = 8
    ABCLinearApproximation = 9
    VisvalingamWhyatt = 10
    SlidingWindow = 11
    BottomUp = 12
    MixPiece = 13
    BitPackedQuantization = 14
    RunLengthEncoding = 15
    NonLinearApproximation = 16
    SerfQT = 17
    BitPackedBUFF = 18
    Chimp64 = 19
    Chimp128 = 20
    BitPackedDeltaEncoding = 21
    DiscreteFourierTransform = 22
    MacaqueS = 23
    MacaqueV = 24
    LargestTriangleThreeBuckets = 25
    Elf = 26


#: Methods whose decompress(compress(x)) is bit-for-bit identical to x
#: (reference gate: /root/reference/src/tester.zig:427-447).
LOSSLESS_METHODS = frozenset(
    {
        Method.Uncompressed,
        Method.RunLengthEncoding,
        Method.BitPackedDeltaEncoding,
        Method.Chimp64,
        Method.Chimp128,
        Method.Elf,
    }
)

#: Methods bounded by ``abs_error_bound`` per point
#: (reference gate: /root/reference/src/tester.zig:508-533).
ERROR_BOUNDED_METHODS = frozenset(
    {
        Method.PoorMansCompressionMidrange,
        Method.PoorMansCompressionMean,
        Method.SwingFilter,
        Method.SwingFilterDisconnected,
        Method.SlideFilter,
        Method.SimPiece,
        Method.MixPiece,
        Method.ABCLinearApproximation,
        Method.BitPackedQuantization,
        Method.SerfQT,
        Method.MacaqueS,
        Method.MacaqueV,
        Method.NonLinearApproximation,
    }
)

#: Error-bound shrink margin applied by Swing/Slide/Sim-Piece/Mix-Piece for
#: numerical stability (reference:
#: /root/reference/src/utilities/shared_structs.zig:24-27).
ERROR_BOUND_MARGIN = 1e-7

#: Quantization bucket safety factor (reference:
#: /root/reference/src/utilities/shared_functions.zig:317-326).
QUANTIZATION_BUCKET_FACTOR = 1.998

#: Reference input envelope: values above this are rejected by the
#: delta/quantization/Sim-Piece families (reference:
#: /root/reference/src/lossless_compression/bitpacked_delta_encoding.zig:80-81).
MAX_VALUE = 1e15


@dataclass(frozen=True)
class Config:
    """Engine-side analog of the reference's per-method JSON config
    (reference: /root/reference/src/configuration.zig:33-83).

    A plain dataclass; broadcast into UDF kernels as a dict. Unknown
    method/field combinations raise at kernel dispatch, mirroring the
    reference's strict ``InvalidConfiguration`` parsing
    (/root/reference/src/configuration.zig:90-140).
    """

    abs_error_bound: float = 0.0
    histogram_bins_number: int = 0
    area_under_curve_error: float = 0.0
    aggregate_error_type: str = "rmse"
    aggregate_error_bound: float = 0.0
    target_point_count: int = 0
    number_of_coefficients: int = 0
    decimal_precision: int = 6
    #: engine extension (not in the reference config): NeaTS segmentation
    #: strategy — 'greedy' (vectorized default) or 'dp' (reference-style
    #: optimal segmentation, non_linear_approximation.zig:61-82)
    segmentation: str = "greedy"
    extra: dict = field(default_factory=dict)

    KNOWN_FIELDS = frozenset(
        {
            "abs_error_bound",
            "histogram_bins_number",
            "area_under_curve_error",
            "aggregate_error_type",
            "aggregate_error_bound",
            "target_point_count",
            "number_of_coefficients",
            "decimal_precision",
            "segmentation",
        }
    )

    def as_dict(self) -> dict:
        return {
            "abs_error_bound": self.abs_error_bound,
            "histogram_bins_number": self.histogram_bins_number,
            "area_under_curve_error": self.area_under_curve_error,
            "aggregate_error_type": self.aggregate_error_type,
            "aggregate_error_bound": self.aggregate_error_bound,
            "target_point_count": self.target_point_count,
            "number_of_coefficients": self.number_of_coefficients,
            "decimal_precision": self.decimal_precision,
            "segmentation": self.segmentation,
        }


class InvalidConfigurationError(ValueError):
    """Config rejected at dispatch — the engine analog of the
    reference's strict ``Error.InvalidConfiguration`` parse
    (/root/reference/src/configuration.zig:90-140; negative tests
    :303-344 cover unknown and missing fields)."""


#: method -> config fields that MUST be present (the reference's parser
#: requires the field its method reads; everything else may be omitted)
REQUIRED_CONFIG_FIELDS: dict[Method, frozenset[str]] = {
    **{m: frozenset({"abs_error_bound"}) for m in ERROR_BOUNDED_METHODS},
    Method.PiecewiseConstantHistogram: frozenset({"histogram_bins_number"}),
    Method.PiecewiseLinearHistogram: frozenset({"histogram_bins_number"}),
    Method.VisvalingamWhyatt: frozenset({"area_under_curve_error"}),
    Method.SlidingWindow: frozenset({"aggregate_error_bound"}),
    Method.BottomUp: frozenset({"aggregate_error_bound"}),
    Method.LargestTriangleThreeBuckets: frozenset({"target_point_count"}),
    Method.DiscreteFourierTransform: frozenset({"number_of_coefficients"}),
}


def validate_config(method: Method, config: dict | None) -> dict:
    """Strict config validation at kernel dispatch: unknown keys raise,
    and the field the method's kernel reads must be present. Returns
    the config dict (never None) for the kernel."""
    cfg = dict(config or {})
    unknown = set(cfg) - Config.KNOWN_FIELDS
    if unknown:
        raise InvalidConfigurationError(
            f"unknown configuration field(s) {sorted(unknown)!r} "
            f"(known: {sorted(Config.KNOWN_FIELDS)})"
        )
    missing = REQUIRED_CONFIG_FIELDS.get(Method(method), frozenset()) - set(cfg)
    if missing:
        raise InvalidConfigurationError(
            f"method {Method(method).name} requires configuration "
            f"field(s) {sorted(missing)!r}"
        )
    return cfg


#: decode-size safety valve: no engine blob legitimately decodes to more
#: values than this (compress chunks at 4096 tokens; whole-series paths
#: reject n >= 2^31 — see delta.compress). A corrupt count field would
#: otherwise drive multi-GB allocations or minutes-long FFT grinds that
#: Python signals cannot preempt (found by the decode fuzz suite).
MAX_DECODE_VALUES = 1 << 27


def check_decode_count(n: int, what: str = "value count") -> int:
    """Validate a count/index parsed from an untrusted blob."""
    n = int(n)
    if n < 0 or n > MAX_DECODE_VALUES:
        raise ValueError(f"implausible {what} {n} in compressed payload")
    return n
