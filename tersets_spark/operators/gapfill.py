"""Gap-fill interpolation over tier rollup tables.

Engine feature from BASELINE.json.north_star (no reference analog —
TerseTS series are dense by construction; rollup tables over event time
are not). Pure Catalyst:

* the dense bucket spine is ``sequence(min_bucket, max_bucket, width)``
  + ``explode`` per key — generated, never materialized driver-side;
* LOCF = ``last(value, ignorenulls=True)`` over an unbounded-preceding
  window;
* linear interpolation derives the surrounding knots with the same
  window trick forward and backward, then evaluates the line.

Scale note: the spine join is per-key and the window is
partitionBy(key) — both shuffle on the key once; AQE handles skewed
keys. The spine explode is O(buckets), not O(raw rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucket_spine(df: DataFrame, key_cols: list[str], width: int) -> DataFrame:
    """Dense per-key bucket spine covering [min(bucket), max(bucket)]."""
    return (
        df.groupBy(*key_cols)
        .agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
        .select(
            *key_cols,
            F.explode(F.sequence("_lo", "_hi", F.lit(width))).alias("bucket"),
        )
    )


def gapfill(
    df: DataFrame,
    key_cols: list[str],
    width: int,
    value_cols: list[str],
    method: str = "locf",
) -> DataFrame:
    """Fill missing (key, bucket) rows.

    ``method``: 'locf' (last observation carried forward), 'linear'
    (interpolate between surrounding observations; ends stay null), or
    'null' (dense spine with nulls). Adds ``gap_filled boolean``.
    """
    spine = bucket_spine(df, key_cols, width)
    dense = spine.join(df, [*key_cols, "bucket"], "left").withColumn(
        "gap_filled", F.col(value_cols[0]).isNull()
    )
    if method == "null":
        return dense
    w_back = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if method == "locf":
        return dense.select(
            *key_cols,
            "bucket",
            "gap_filled",
            *[
                F.last(c, ignorenulls=True).over(w_back).alias(c)
                for c in value_cols
            ],
        )
    if method == "linear":
        w_fwd = (
            Window.partitionBy(*key_cols)
            .orderBy("bucket")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        out = dense
        prev_b = F.last(
            F.when(~F.col("gap_filled"), F.col("bucket")), ignorenulls=True
        ).over(w_back)
        next_b = F.first(
            F.when(~F.col("gap_filled"), F.col("bucket")), ignorenulls=True
        ).over(w_fwd)
        for c in value_cols:
            prev_v = F.last(c, ignorenulls=True).over(w_back)
            next_v = F.first(c, ignorenulls=True).over(w_fwd)
            frac = (F.col("bucket") - prev_b) / (next_b - prev_b)
            interp = prev_v + (next_v - prev_v) * frac
            out = out.withColumn(
                f"_f_{c}", F.when(~F.col("gap_filled"), F.col(c)).otherwise(interp)
            )
        return out.select(
            *key_cols,
            "bucket",
            "gap_filled",
            *[F.col(f"_f_{c}").alias(c) for c in value_cols],
        )
    raise ValueError(f"unknown gapfill method: {method}")
