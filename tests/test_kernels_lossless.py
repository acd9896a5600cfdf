"""Lossless kernel round-trip properties.

Port of the reference's lossless gate: length equality + bit-for-bit
value equality including -0.0 and NaN payloads
(/root/reference/src/tester.zig:355-447, expectLosslessRoundTrip at
:427-447), over the reference's distribution families
(/root/reference/src/tester.zig:118-133) adapted per FIXTURES.md §2.
"""

from __future__ import annotations

import numpy as np
import pytest

from tersets_spark import Method, compress, decompress
from tersets_spark.methods import LOSSLESS_METHODS
from tersets_spark.kernels import registry

LOSSLESS_IMPLEMENTED = sorted(
    (m for m in LOSSLESS_METHODS if m in registry.KERNELS), key=int
)


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
    (recorded in KERNELS.md)."""
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
    """Batches wider than 1008 rows exceed the uint16 radix key space
    and must take the uint32 stable-sort path — byte-identity holds on
    both sides of the boundary."""
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
