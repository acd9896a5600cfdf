"""Deterministic synthetic token-table generator (FIXTURES.md §1).

Schema per BASELINE.json.input_hint:
``(doc_id string, tokens array<int32>, n_tok int32, source string)``.

Driver-light and scale-free: ``spark.range(n)`` seeds everything; the
per-row PRNG seed is ``xxhash64(doc_id, GLOBAL_SEED)`` computed JVM-side,
and token arrays are built in a vectorized pandas UDF from
``numpy.random.Generator(PCG64(seed))`` — any row is reproducible in
isolation, so resume/retry re-generates identical data on any executor.

Length mixture (FIXTURES.md §1): 90% in [64, 2048), 9% in [2048, 32768),
1% in [32768, 262144) — the skew tail that forces chunk-salting.
Source families mirror the reference's test distributions
(/root/reference/src/tester.zig:118-133) adapted to int32 tokens.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

GLOBAL_SEED = 42
VOCAB = 131072  # 17-bit vocab (exact in f64)
SOURCES = ["web", "code", "chat", "synth"]


def _gen_tokens_batch(seeds: pd.Series, sources: pd.Series, max_len: int) -> pd.Series:
    out = []
    for seed, source in zip(seeds.to_numpy(dtype=np.uint64), sources):
        rng = np.random.default_rng(np.random.PCG64(int(seed)))
        u = rng.random()
        if u < 0.90:
            n = int(rng.integers(64, 2048))
        elif u < 0.99:
            n = int(rng.integers(2048, 32768))
        else:
            n = int(rng.integers(32768, 262144))
        n = min(n, max_len)
        if source == "web":  # zipf-ish vocab draws
            toks = np.minimum(rng.zipf(1.3, n) - 1, VOCAB - 1)
        elif source == "code":  # constant runs (RLE/PMC friendly)
            n_runs = max(n // 8, 1)
            vals = rng.integers(0, 512, n_runs)
            reps = rng.integers(1, 16, n_runs)
            toks = np.repeat(vals, reps)[:n]
            if toks.size < n:
                toks = np.pad(toks, (0, n - toks.size), constant_values=int(vals[-1]))
        elif source == "chat":  # sinusoidal pattern + noise
            i = np.arange(n)
            toks = (
                2000 + 1500 * np.sin(i * float(rng.uniform(0.005, 0.1)))
                + rng.integers(0, 50, n)
            ).astype(np.int64)
        else:  # synth: linear ramp mod vocab (delta friendly)
            a = int(rng.integers(0, VOCAB))
            b = int(rng.integers(1, 7))
            toks = (a + b * np.arange(n)) % VOCAB
        out.append(np.asarray(toks, dtype=np.int32))
    return pd.Series(out)


def synth_tokens(
    spark: SparkSession,
    n_rows: int,
    seed: int = GLOBAL_SEED,
    max_len: int = 262144,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic token table with ``n_rows`` sequences.

    Partition count defaults to 8x the cluster parallelism so the skewed
    length tail (1% huge docs) can't turn whole partitions into
    stragglers — matching a real table scan where input splits greatly
    outnumber cores."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def gen_tokens(seeds: pd.Series, sources: pd.Series) -> pd.Series:
        return _gen_tokens_batch(seeds, sources, max_len)

    if partitions is None:
        partitions = min(max(spark.sparkContext.defaultParallelism * 8, 64), n_rows)
    base = (
        spark.range(0, n_rows, numPartitions=partitions)
        .withColumn("source", F.element_at(F.array(*[F.lit(s) for s in SOURCES]), (F.pmod(F.col("id"), 4) + 1).cast("int")))
        .withColumn("doc_id", F.format_string("doc_%s_%012d", F.col("source"), F.col("id")))
        .withColumn("row_seed", F.abs(F.xxhash64(F.col("doc_id"), F.lit(seed))))
    )
    return (
        base.withColumn("tokens", gen_tokens(F.col("row_seed"), F.col("source")))
        .withColumn("n_tok", F.size("tokens").cast("int"))
        .select("doc_id", "tokens", "n_tok", "source")
    )
