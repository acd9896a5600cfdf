"""Tier aging and compaction.

Engine feature from BASELINE.json.north_star: raw token positions older
than the raw-retention horizon are compacted into Gorilla/delta blocks;
rollup tiers are pruned to their own horizons (raw → 1m at T1, 1m → 1h
at T2, ...). "Age" follows the reference's time model — the array
position is the clock (/root/reference/src/tersets.zig:118-123), with
the newest position being the hottest.

All splitting is JVM-side (``slice``/``greatest``); compression of the
aged prefix reuses operators.compress (mapInPandas kernels, no extra
shuffle). Tier pruning is a plain filter against the per-doc max bucket
— predicate-pushdown friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..methods import Method
from .compress import CHUNK, compress_blocks


def split_aged(df: DataFrame, raw_retention: int) -> tuple[DataFrame, DataFrame]:
    """Split ``(doc_id, tokens, n_tok, ...)`` into (kept_raw, aged):
    the newest ``raw_retention`` positions stay raw; the older prefix is
    returned for compaction. Rows shorter than the horizon pass through
    untouched."""
    aged_len = F.greatest(F.col("n_tok") - raw_retention, F.lit(0))
    aged = (
        df.filter(F.col("n_tok") > raw_retention)
        .withColumn("tokens", F.slice("tokens", 1, F.col("n_tok") - raw_retention))
        .withColumn("n_tok", aged_len.cast("int"))
    )
    kept = df.withColumn(
        "tokens",
        F.when(
            F.col("n_tok") > raw_retention,
            F.slice(
                "tokens",
                F.col("n_tok") - raw_retention + 1,
                F.lit(raw_retention),
            ),
        ).otherwise(F.col("tokens")),
    ).withColumn("n_tok", F.least(F.col("n_tok"), F.lit(raw_retention)).cast("int"))
    return kept, aged


def compact_aged(
    df: DataFrame,
    raw_retention: int,
    method: Method = Method.BitPackedDeltaEncoding,
    config: dict | None = None,
    chunk: int = CHUNK,
) -> tuple[DataFrame, DataFrame]:
    """Age out and compress: returns (kept_raw, blocks)."""
    kept, aged = split_aged(df, raw_retention)
    return kept, compress_blocks(aged, method, config, chunk)


def prune_tier(rollup: DataFrame, keep_buckets: int) -> DataFrame:
    """Keep only the newest ``keep_buckets`` buckets per doc in a tier
    rollup table (broadcast-free: window-max per doc via self-agg join is
    avoided by a grouped max + equi-join, which AQE broadcasts when the
    doc dimension is small; at scale the join co-partitions on doc_id)."""
    horizon = rollup.groupBy("doc_id").agg(F.max("bucket").alias("_maxb"))
    return (
        rollup.join(horizon, "doc_id")
        .filter(F.col("bucket") > F.col("_maxb") - keep_buckets)
        .drop("_maxb")
    )
