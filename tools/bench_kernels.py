"""Per-method single-core kernel microbenchmarks -> markdown table.

Usage: python tools/bench_kernels.py   (appends/refreshes KERNELS.md)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tersets_spark.kernels import registry  # noqa: E402
from tersets_spark.methods import LOSSLESS_METHODS, Method  # noqa: E402

CFG = {
    "abs_error_bound": 2.0,
    "histogram_bins_number": 64,
    "area_under_curve_error": 2.0,
    "aggregate_error_type": "rmse",
    "aggregate_error_bound": 2.0,
    "target_point_count": 512,
    "number_of_coefficients": 32,
    "decimal_precision": 4,
}


def main() -> None:
    rng = np.random.default_rng(42)
    tokens = rng.integers(0, 131072, 4096).astype(np.float64)
    floats = 1000 * np.sin(np.arange(4096) * 0.01) + rng.normal(0, 1, 4096)
    rows = []
    for m in sorted(Method, key=int):
        v = tokens if m in LOSSLESS_METHODS or m in (
            Method.BitPackedDeltaEncoding,
            Method.Uncompressed,
        ) else floats
        try:
            blob = registry.compress(v, m, CFG)
            reps = max(int(0.3 / max(_t(lambda: registry.compress(v, m, CFG)), 1e-5)), 3)
            tc = _bench(lambda: registry.compress(v, m, CFG), reps)
            td = _bench(lambda: registry.decompress(blob), reps)
            rows.append(
                (m.name, int(m), v.size / tc / 1e6, v.size / td / 1e6,
                 v.nbytes / len(blob))
            )
        except Exception as ex:  # noqa: BLE001
            rows.append((m.name, int(m), None, None, str(ex)[:40]))
    lines = [
        "# KERNELS — single-core microbenchmarks",
        "",
        "4096-value series (tokens for lossless, sinusoid+noise for lossy),",
        f"config {CFG}. Rates in Mtok/s, single core, this sandbox's CPU.",
        "Batched variants (delta) run 1.5-3x faster per core (see BENCH.md).",
        "",
        "| method | code | compress | decompress | ratio |",
        "|---|---|---|---|---|",
    ]
    for name, code, c, d, r in rows:
        if c is None:
            lines.append(f"| {name} | {code} | - | - | {r} |")
        else:
            lines.append(f"| {name} | {code} | {c:.1f} | {d:.1f} | {r:.2f}x |")
    tail = ""
    marker = "<!-- hand-curated below"
    try:
        prev = open("/root/repo/KERNELS.md").read()
        if marker in prev:
            i = prev.index(marker)
            tail = "\n" + prev[i:]
    except FileNotFoundError:
        pass
    with open("/root/repo/KERNELS.md", "w") as f:
        f.write("\n".join(lines) + "\n" + tail)
    print("\n".join(lines))


def _t(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def _bench(fn, reps: int) -> float:
    best = 1e9
    for _ in range(max(reps, 3)):
        best = min(best, _t(fn))
    return best


if __name__ == "__main__":
    main()
