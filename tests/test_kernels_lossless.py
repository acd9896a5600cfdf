"""Lossless kernel round-trip properties.

Port of the reference's lossless gate: length equality + bit-for-bit
value equality including -0.0 and NaN payloads
(/root/reference/src/tester.zig:355-447, expectLosslessRoundTrip at
:427-447), over the reference's distribution families
(/root/reference/src/tester.zig:118-133) adapted per FIXTURES.md §2.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pytest

from tersets_spark import Method, compress, decompress
from tersets_spark.methods import LOSSLESS_METHODS
from tersets_spark.kernels import registry

LOSSLESS_IMPLEMENTED = sorted(
    (m for m in LOSSLESS_METHODS if m in registry.KERNELS), key=int
)


def _timed_sort(x: np.ndarray) -> float:
    """One unit of the bench.py single-core calm probe (CLAUDE.md)."""
    t0 = time.perf_counter()
    np.sort(x.copy())
    return time.perf_counter() - t0


def _distributions(seed: int = 42) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    n = 140  # reference envelope: 100-150 points (tester.zig:1123)
    out = {
        "constant-runs": np.repeat(
            rng.integers(0, 50, 12), rng.integers(1, 25, 12)
        ).astype(np.float64),
        "linear-ramp": np.round(3.0 + 0.5 * np.arange(n)) % 131072,
        "sinusoidal": np.round(1000 * np.sin(np.arange(n) * 0.05)),
        "uniform-tokens": rng.integers(0, 131072, n).astype(np.float64),
        "finite-random": rng.uniform(-1e15, 1e15, n),
        "tight-random": rng.normal(100.0, 0.1, n),
        "decimals": np.round(rng.normal(50, 10, n), 3),
        "single": np.array([3.25]),
        "pair": np.array([1.0, -1.0]),
        "empty": np.empty(0, dtype=np.float64),
    }
    # NaN/Inf injection at p=0.05 (tester.zig:88-95,659)
    noisy = rng.normal(0, 1e6, n)
    inject = rng.random(n) < 0.05
    specials = rng.choice([np.nan, np.inf, -np.inf, -0.0], n)
    noisy[inject] = specials[inject]
    out["special-injected"] = noisy
    out["nan-payloads"] = np.array(
        [0x7FF8000000000001, 0x7FF800000000DEAD, 0xFFF8000000000001] * 40,
        dtype=np.uint64,
    ).view(np.float64)
    return out


@pytest.mark.parametrize("method", LOSSLESS_IMPLEMENTED, ids=lambda m: m.name)
@pytest.mark.parametrize("dist", sorted(_distributions().keys()))
def test_bitwise_roundtrip(method: Method, dist: str) -> None:
    v = _distributions()[dist]
    blob = compress(v, method)
    out = decompress(blob)
    assert out.size == v.size
    assert np.array_equal(v.view(np.uint64), out.view(np.uint64)), (
        f"{method.name} not bit-identical on {dist}"
    )


@pytest.mark.parametrize("method", LOSSLESS_IMPLEMENTED, ids=lambda m: m.name)
def test_method_byte_is_last(method: Method) -> None:
    v = np.array([1.0, 2.0, 3.0])
    blob = compress(v, method)
    assert blob[-1] == int(method)


def test_single_value_stored_uncompressed() -> None:
    # reference edge rule: /root/reference/src/tersets.zig:127-134
    v = np.array([3.14])
    for method in LOSSLESS_IMPLEMENTED:
        blob = compress(v, method)
        assert blob[-1] == int(Method.Uncompressed)
        assert np.array_equal(decompress(blob), v)


def test_empty_input_empty_blob() -> None:
    for method in LOSSLESS_IMPLEMENTED:
        assert compress(np.empty(0), method) == b""


@pytest.mark.parametrize("seed", range(5))
def test_property_random_token_arrays(seed: int) -> None:
    """Token-array invariant (BASELINE.json.input_hint): int32 tokens in
    [0, 131071], mixture of lengths, bitwise round-trip."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 5000))
    tokens = rng.integers(0, 131072, n).astype(np.int32)
    v = tokens.astype(np.float64)
    for method in LOSSLESS_IMPLEMENTED:
        out = decompress(compress(v, method))
        assert np.array_equal(out.astype(np.int32), tokens), method.name


def test_chimp64_batch_beats_single_ab():
    """Round-6 verdict #6: the batched Chimp64 encoder must beat the
    single-series path per core on the bench-corpus shape (64 x 4096
    token rows). Same-process interleaved pairs with a median-of-ratios
    readout so a hypervisor throttle window can't flip the verdict; the
    gate is 1.15x (noise floor) while the measured median is ~1.5x
    (recorded in KERNELS.md).

    Perf test (r6 ADVICE): a throttle window that lands on the batch
    halves of the interleave can still flip the median, so the timing
    is gated behind the single-core calm probe — skipped (not failed)
    on a throttled host, or explicitly via SPARK_GRAFT_SKIP_PERF=1.
    The byte-identity precondition always runs."""
    import time

    import numpy as np

    from tersets_spark.kernels import chimp

    rng = np.random.default_rng(5)
    rows = [rng.integers(0, 131072, 4096).astype(np.float64) for _ in range(64)]
    flat = np.concatenate(rows)
    offs = np.zeros(65, dtype=np.int64)
    offs[1:] = np.cumsum([r.size for r in rows])
    # correctness first: byte-identity is the precondition of the race
    blobs = chimp.compress_batch(flat, offs)
    assert all(
        blobs[i] == chimp.compress_chimp64(r) + bytes([19])
        for i, r in enumerate(rows)
    )
    if os.environ.get("SPARK_GRAFT_SKIP_PERF") == "1":
        pytest.skip("perf timing skipped via SPARK_GRAFT_SKIP_PERF")
    probe = np.random.default_rng(0).normal(0, 1, 1_000_000)
    calm = min(
        _timed_sort(probe) for _ in range(3)
    )
    if calm >= 0.040:
        pytest.skip(f"host throttled (probe {calm*1e3:.0f} ms >= 40 ms)")
    ratios = []
    for _ in range(9):
        t0 = time.perf_counter()
        for r in rows:
            chimp.compress_chimp64(r)
        s = time.perf_counter() - t0
        t0 = time.perf_counter()
        chimp.compress_batch(flat, offs)
        ratios.append(s / (time.perf_counter() - t0))
    ratios.sort()
    assert ratios[4] >= 1.15, f"median batch speedup {ratios[4]:.2f}x, all={ratios}"


def test_chimp64_batch_u32_key_fallback():
    """Batches wider than 1007 rows exceed the uint16 radix key space
    (max key = 65*n_rows + 63, which overflows 2^16 already at exactly
    n_rows == 1008) and must take the uint32 stable-sort path —
    byte-identity holds on both sides of the boundary."""
    import numpy as np

    from tersets_spark.kernels import chimp

    rng = np.random.default_rng(9)
    rows = [
        rng.integers(0, 131072, int(n)).astype(np.float64)
        for n in rng.integers(2, 40, 1500)
    ]
    flat = np.concatenate(rows)
    offs = np.zeros(len(rows) + 1, dtype=np.int64)
    offs[1:] = np.cumsum([r.size for r in rows])
    blobs = chimp.compress_batch(flat, offs)
    for i, r in enumerate(rows):
        assert blobs[i] == chimp.compress_chimp64(r) + bytes([19]), i
    fl, of = chimp.decompress_batch(blobs)
    assert np.array_equal(fl.view(np.uint64), flat.view(np.uint64))
    assert np.array_equal(of, offs)


@pytest.mark.parametrize("n_rows", [1006, 1007, 1008, 1009])
def test_chimp64_batch_u16_boundary_full_width(n_rows: int) -> None:
    """r6 ADVICE (high): the uint16 radix key overflowed at exactly
    n_rows == 1008 — key = sig*(n_rows+1)+crow with sig == 64 wraps for
    rows >= 960, silently emitting width-0 cells for the wrong rows
    (reproduced pre-fix: 48 corrupt blobs, CorruptBlobError on decode).
    Pin the boundary: every row is a 2-value series whose xor has BOTH
    bit 63 and bit 0 set (lz=0, tz=0 -> sig=64), so every row index up
    to n_rows-1 carries a max-width cell. 1007 must take the uint16
    path, 1008 the uint32 path; both must be byte-identical to the
    single-series encoder and decode losslessly."""
    import numpy as np

    from tersets_spark.kernels import chimp

    v0 = np.float64(1.0)
    v1 = (
        np.array([v0]).view(np.uint64) ^ np.uint64(0x8000000000000001)
    ).view(np.float64)[0]
    assert (
        np.array([v0]).view(np.uint64)[0]
        ^ np.array([v1]).view(np.uint64)[0]
    ) == np.uint64(0x8000000000000001)
    rows = [np.array([v0, v1], dtype=np.float64)] * n_rows
    flat = np.concatenate(rows)
    offs = np.arange(0, 2 * n_rows + 1, 2, dtype=np.int64)
    blobs = chimp.compress_batch(flat, offs)
    expect = chimp.compress_chimp64(rows[0]) + bytes([19])
    for i in range(n_rows):
        assert blobs[i] == expect, f"row {i} of {n_rows}"
    fl, of = chimp.decompress_batch(blobs)
    assert np.array_equal(fl.view(np.uint64), flat.view(np.uint64))
    assert np.array_equal(of, offs)
    # the overflow lived in the SHARED section helper — pin the
    # chimp128 batch route through it at the same boundary
    blobs128 = chimp.compress_batch_chimp128(flat, offs)
    expect128 = chimp.compress_chimp128(rows[0]) + bytes([20])
    for i in range(n_rows):
        assert blobs128[i] == expect128, f"c128 row {i} of {n_rows}"
