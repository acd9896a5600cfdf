"""Headline benchmark. Prints ONE JSON line:
{"metric": "tokens_per_sec", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

The flagship measurement mirrors BASELINE.json's primary metric:
tokens/sec for compress (BitPackedDeltaEncoding) + tier rollups
(1m/1h/1d) + lossless round-trip verification over the deterministic
synthetic token table (FIXTURES.md §1), sized by scale factor.
Secondary queries time the other operator families on the driver test
tables.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _probe_sort(_i: int) -> float:
    """One probe unit (module-level: ProcessPoolExecutor pickles it)."""
    import numpy as np

    x = np.random.default_rng(1).normal(0, 1, 3_000_000)
    t0 = time.perf_counter()
    np.sort(x)
    return time.perf_counter() - t0


def _parallel_probe(workers: int = 8) -> float:
    """Multi-core throttle probe: `workers` forked processes each sort
    3e6 floats concurrently (big enough that fork+IPC overhead is noise); returns wall/single ratio (~1.0-2.5 with free
    cores, >>3 when the hypervisor's MANY-core credit pool is drained —
    a state the single-core probe cannot see: measured 2026-08-17, the
    single-core probe read 18.8 ms CALM while the same flagship ran 2x
    its calm-host time because the 32-core budget was spent)."""
    import concurrent.futures as cf

    t_single = _probe_sort(0)
    t0 = time.perf_counter()
    with cf.ProcessPoolExecutor(max_workers=workers) as ex:
        list(ex.map(_probe_sort, range(workers)))
    wall = time.perf_counter() - t0
    # subtract nothing for pool startup — it inflates the ratio by a
    # constant ~0.3 on this host, covered by the gate's slack
    return wall / max(t_single, 1e-6)


def _wait_for_calm_host(max_wait_s: int) -> float:
    """CPU-credit throttle guard (CLAUDE.md): this sandbox's hypervisor
    slows sustained many-core load up to 8x for minutes at a time, and
    the budget refills while idle — measured on 2026-08-16: the same
    flagship job took 21-23 s inside a throttle window and 4.5 s after
    six idle minutes. TWO probes gate the timed region: a single-core
    probe (np.sort of 1e6 float64, best of 3: ~15-25 ms calm on this
    host, 60-300 ms throttled) AND a multi-core probe (8 concurrent
    sorts; wall/single <= 6 — this host's stable floor measured
    4.3-4.6 on 2026-08-17 even after 15 idle minutes, so the gate only
    trips on clearly-degraded transients (>= 4.75-10.25 observed);
    NOTE the host's session-to-session BASELINE also drifts (the same
    flagship bytes ran 4.46 s on 2026-08-16 and 7.9 s calm-and-idle on
    2026-08-17) — cross-round artifact comparisons must read
    detail.par_probe_ratio AND tolerate baseline shifts) — the many-core credit
    pool can be drained while single-core reads calm. While either
    reads throttled, sleep in bounded steps so the artifact records the
    ENGINE's speed, not the hypervisor's credit state. Returns the
    final single-core probe seconds (recorded in the output's detail
    for transparency, alongside the parallel ratio)."""
    import numpy as np

    x = np.random.default_rng(0).normal(0, 1, 1_000_000)
    waited = 0
    par = -1.0
    while True:
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.sort(x.copy())
            best = min(best, time.perf_counter() - t0)
        if waited >= max_wait_s:
            return best, par
        if best < 0.040:
            if max_wait_s < 90:
                return best, par
            par = min(_parallel_probe(), _parallel_probe())
            if par <= 6.0:
                return best, par
        time.sleep(90)
        waited += 90


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from tersets_spark.methods import Method
    from tersets_spark.operators.pipeline import (
        flagship_summary,
        fused_compress_rollup,
    )
    from tersets_spark.session import get_spark
    from tersets_spark.sources.synth import synth_tokens

    spark = get_spark("bench", cores=cpus, shuffle_partitions=max(cpus, 8))

    timings: dict[str, float] = {}

    # ---- flagship: fused compress + verify + tier rollups (1m/1h/1d)
    # over the deterministic synthetic token table ----
    # corpus sized so kernel compute (not per-job overhead) sets the
    # headline: ~40M tokens at sf=0.1
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "0")) or max(
        int(100000 * sf), 200
    )
    parts = int(os.environ.get("SPARK_GRAFT_BENCH_PARTITIONS", "0")) or None
    toks = synth_tokens(spark, n_docs, partitions=parts).persist()
    total_tokens = toks.agg(F.sum("n_tok")).collect()[0][0]

    # warmup: spin up the Python workers / JIT outside the timed region
    warm = synth_tokens(spark, 64)
    fused_compress_rollup(warm, Method.BitPackedDeltaEncoding).agg(
        F.count("*")
    ).collect()

    def run_flagship() -> tuple[float, dict, int]:
        t0 = time.time()
        fused = fused_compress_rollup(toks, Method.BitPackedDeltaEncoding)
        # ONE action: tier counts + verify verdict + compressed bytes
        res = {r["gid"]: r for r in flagship_summary(fused).collect()}
        wall = time.time() - t0
        total = res[15]
        agg = {
            "ok": total["all_ok"],
            "cb": total["bytes"],
            "rb": total["n_values"] * 4,
        }
        n_roll = sum(res[g]["rows"] for g in (0, 1, 3) if g in res)
        return wall, agg, n_roll

    # best-of-3: the host's per-run variance reached 2-4x on identical
    # bytes (2026-08-17: 3.2-12.2 s for the same flagship back-to-back);
    # three repeats give the min a fighting chance of landing in a sane
    # window at ~8 s/repeat cost
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))
    probe_s, par_ratio = _wait_for_calm_host(
        int(os.environ.get("SPARK_GRAFT_CALM_WAIT", "360"))
    )
    runs = [run_flagship() for _ in range(repeats)]
    flagship_sec, agg, n_roll = min(runs, key=lambda r: r[0])
    toks.unpersist()  # executor storage back to the secondary queries
    timings["flagship_compress_rollup"] = round(flagship_sec, 3)
    if not agg["ok"]:
        print(json.dumps({"metric": "tokens_per_sec", "value": 0.0, "unit": "sec", "error": "roundtrip failed", "sf": sf}))
        return
    tokens_per_sec = total_tokens / flagship_sec

    # ---- secondary operator timings over the driver test tables ----
    if os.environ.get("SPARK_GRAFT_BENCH_FLAGSHIP_ONLY"):
        out = {
            "metric": "tokens_per_sec",
            "value": round(tokens_per_sec, 1),
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "detail": {
                "n_docs": n_docs,
                "total_tokens": int(total_tokens),
                "compress_ratio": round(float(agg["rb"]) / float(agg["cb"]), 3),
                "rollup_rows": int(n_roll),
                "cpus": cpus,
                "calm_probe_ms": round(probe_s * 1000, 1),
                "par_probe_ratio": round(par_ratio, 2),
            },
        }
        spark.stop()
        print(json.dumps(out))
        return

    # ---- secondary queries: interleaved best-of-2 ----
    # The sandbox host throttles CPU-credit style (CLAUDE.md): a single
    # pass taken during a throttled window records 2-5x the calm-host
    # time. Two full interleaved passes with a per-query min make the
    # official artifact robust to a throttle window covering any one
    # pass, at the cost of one extra pass.
    qs = entrymod.queries()
    secondary: dict[str, object] = {
        name: qs[name]
        for name in (
            "rollup_events_1m",
            "rollup_events_1h",
            "gapfill_locf_1h",
            "roundtrip_chimp64",
            "tier_rollup_chars_1m",
            "dedup_exact",
            "simhash_candidates",
            "textstats",
            "ann_topk",
            "ivf_ann_topk",
        )
    }
    # bench-scale minhash: same pipeline, 16 hashes / 4 bands (the
    # correctness query keeps 64/16 so the sf0.01 oracle is unchanged)
    secondary["minhash_jaccard_dups"] = lambda sp, d: entrymod.minhash_pairs(
        sp, d, n_hashes=16, bands=4
    )
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    _wait_for_calm_host(120)  # the flagship repeats burn credits too
    for _ in range(passes):
        for name, fn in secondary.items():
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = time.time() - t0
            timings[name] = round(min(timings.get(name, dt), dt), 3)
            if name in ("minhash_jaccard_dups", "ivf_ann_topk"):
                # these pipelines persist internal state (candidate set /
                # IVF index) per call — drop stale caches so the next
                # pass isn't measured under this one's storage pressure
                spark.catalog.clearCache()

    # cross-round comparability anchor: ONE timing of minhash at the
    # correctness config (64 hashes / 16 bands — what the sf0.01 oracle
    # checks), so round-over-round deltas aren't config changes
    t0 = time.time()
    entrymod.minhash_pairs(spark, sf_dir, n_hashes=64, bands=16).count()
    timings["minhash_jaccard_64x16"] = round(time.time() - t0, 3)
    spark.catalog.clearCache()

    out = {
        "metric": "tokens_per_sec",
        "value": round(tokens_per_sec, 1),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "detail": {
            "n_docs": n_docs,
            "total_tokens": int(total_tokens),
            "compress_ratio": round(float(agg["rb"]) / float(agg["cb"]), 3),
            "rollup_rows": int(n_roll),
            "cpus": cpus,
            "calm_probe_ms": round(probe_s * 1000, 1),
                "par_probe_ratio": round(par_ratio, 2),
            # self-describing artifact (round-3 verdict #5): per-query
            # config overrides + pass counts, so a number is never
            # silently a config change
            "passes": passes,
            "flagship_repeats": repeats,
            "query_overrides": {
                "minhash_jaccard_dups": "n_hashes=16 bands=4 (bench scale)",
                "minhash_jaccard_64x16": "n_hashes=64 bands=16 (correctness config, 1 pass)",
                "ivf_ann_topk": "index rebuilt per pass (cache cleared; r03 pass-2 reused pass-1's leaked cache)",
            },
        },
    }
    spark.stop()
    print(json.dumps(out))


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


if __name__ == "__main__":
    main()
