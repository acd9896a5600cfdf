"""Structured Streaming tier rollups with watermarked late-data
handling.

Engine scope note (SURVEY.md §7): the north_rule's incremental model is
batch-incremental (lineage + idempotent partition overwrite), so the
batch path is primary; this module covers the streaming-ingest variant
of the same continuous aggregates for event-time sources —
``readStream`` -> watermark -> windowed min/max/mean/count ->
``writeStream``. Means are re-aggregatable because (sum, count) are
carried, mirroring operators.rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.rollup import TIERS


def stream_rollup(
    events: DataFrame,
    tier: str = "1m",
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: tuple[str, ...] = ("user_id",),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Windowed rollup over a streaming DataFrame. Output schema matches
    the batch rollup (bucket = window start epoch seconds)."""
    width = TIERS[tier]
    # watermarks require TIMESTAMP (not TIMESTAMP_NTZ, which parquet
    # round-trips to); session TZ is pinned to UTC so the cast is exact
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    win = F.window(F.col(ts_col), f"{width} seconds")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*key_cols, win.alias("_w"))
        .agg(
            F.min(value_col).alias("vmin"),
            F.max(value_col).alias("vmax"),
            F.sum(value_col).alias("vsum"),
            F.count(value_col).alias("vcount"),
        )
        .select(
            *key_cols,
            F.unix_timestamp("_w.start").alias("bucket"),
            "vmin",
            "vmax",
            (F.col("vsum") / F.col("vcount")).alias("vmean"),
            "vcount",
        )
    )


def run_stream_to_memory(spark, source_dir: str, schema, tier: str = "1m", name: str = "rollup_out"):
    """Drive a file-source stream to completion synchronously (test/demo
    harness): parquet dir -> stream rollup -> memory sink."""
    events = spark.readStream.schema(schema).parquet(source_dir)
    agg = stream_rollup(events, tier=tier)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")
