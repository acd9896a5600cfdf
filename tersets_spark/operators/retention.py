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


TIER_BLOCKS_SCHEMA = (
    "doc_id string, stat string, method tinyint, blob binary, "
    "bucket_blob binary, n_buckets int, first_bucket long, bytes int"
)


def _field_getter(field: str):
    return lambda r: r[field]


def compact_tier(
    rollup: DataFrame,
    method: Method = Method.Chimp64,
    stats: tuple[str, ...] = ("vmin", "vmax", "vmean"),
) -> DataFrame:
    """Compact an aged-out rollup tier into float-codec blocks: one blob
    per (doc_id, stat column), values ordered by bucket — the
    Gorilla/Chimp XOR path of the north_star applied to the aggregate
    series. Collection is JVM-side (sort_array of (bucket, stat)
    structs); the kernel sees plain float arrays."""
    from typing import Iterator

    import pandas as pd

    method_code = int(method)
    gathered = rollup.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("bucket", *[F.col(s) for s in stats]))
        ).alias("_rows")
    ).select(
        "doc_id",
        F.element_at("_rows", 1)["bucket"].alias("first_bucket"),
        F.size("_rows").alias("n_buckets"),
        F.transform("_rows", lambda r: r["bucket"]).alias("_buckets"),
        # NB: a 2-arg lambda means (element, index) to F.transform, so
        # late binding is avoided with a factory, not a default arg
        *[F.transform("_rows", _field_getter(s)).alias(s) for s in stats],
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..kernels import registry
        from ..methods import Method as M

        m = M(method_code)
        delta = M.BitPackedDeltaEncoding
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id",
                    "stat",
                    "blob",
                    "bucket_blob",
                    "n_buckets",
                    "first_bucket",
                )
            }
            cols = [pdf["doc_id"], pdf["first_bucket"], pdf["_buckets"]] + [
                pdf[s] for s in stats
            ]
            for doc_id, first_bucket, buckets, *stat_vals in zip(*cols):
                # the (possibly sparse) bucket axis rides along as a
                # delta-of-delta blob so restore needs no density assumption
                bblob = registry.compress(
                    np.asarray(buckets, dtype=np.float64), delta
                )
                for s, sv in zip(stats, stat_vals):
                    v = np.asarray(sv, dtype=np.float64)
                    out["doc_id"].append(doc_id)
                    out["stat"].append(s)
                    out["blob"].append(registry.compress(v, m))
                    out["bucket_blob"].append(bblob)
                    out["n_buckets"].append(v.size)
                    out["first_bucket"].append(first_bucket)
            yield pd.DataFrame(
                {
                    "doc_id": out["doc_id"],
                    "stat": out["stat"],
                    "method": np.int8(method_code),
                    "blob": out["blob"],
                    "bucket_blob": out["bucket_blob"],
                    "n_buckets": np.asarray(out["n_buckets"], dtype=np.int32),
                    "first_bucket": np.asarray(out["first_bucket"], dtype=np.int64),
                    "bytes": np.asarray([len(b) for b in out["blob"]], dtype=np.int32),
                }
            )

    return gathered.mapInPandas(kernel, schema=TIER_BLOCKS_SCHEMA)


def restore_tier(blocks: DataFrame) -> DataFrame:
    """Inverse of :func:`compact_tier`: back to
    (doc_id, stat, bucket, value) rows."""
    from typing import Iterator

    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..kernels import registry

        for pdf in batches:
            docs, stats_c, buckets, values = [], [], [], []
            for doc_id, stat, blob, bblob in zip(
                pdf["doc_id"], pdf["stat"], pdf["blob"], pdf["bucket_blob"]
            ):
                v = registry.decompress(bytes(blob))
                b = registry.decompress(bytes(bblob)).astype(np.int64)
                docs.extend([doc_id] * v.size)
                stats_c.extend([stat] * v.size)
                buckets.extend(b.tolist())
                values.extend(v.tolist())
            yield pd.DataFrame(
                {"doc_id": docs, "stat": stats_c, "bucket": buckets, "value": values}
            )

    return blocks.mapInPandas(
        kernel, schema="doc_id string, stat string, bucket long, value double"
    )


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
