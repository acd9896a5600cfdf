"""Per-partition lineage + resumable checkpoints.

Engine feature from BASELINE.json.north_rule: "resumable from checkpoint
with per-partition lineage + metrics — a killed job replays only
unfinished partitions."

Work unit: a deterministic *partition bucket*
``pb = pmod(xxhash64(doc_id), n_buckets)`` — stable across runs, cluster
sizes and retries (never Spark's physical partition id, which is not).
The orchestrator processes buckets in driver-side batches; each batch is
one distributed job that (1) writes its output parquet with dynamic
partition overwrite (idempotent on retry) and (2) appends one lineage
row per bucket only after the write commits. A killed run leaves
``status='done'`` rows only for committed buckets; the next run
anti-joins them away and replays the rest.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "run_id string, partition_id int, doc_id_min string, doc_id_max string, "
    "n_series long, n_tokens long, out_bytes long, status string, "
    "started_ts timestamp, finished_ts timestamp"
)

METRICS_SCHEMA = (
    "run_id string, stage string, tokens_per_sec double, compress_ratio double, "
    "wall_ms long, parallelism int"
)


def with_partition_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "pb", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    )


def read_done_buckets(spark: SparkSession, lineage_path: str, run_id: str) -> set[int]:
    try:
        rows = (
            spark.read.parquet(lineage_path)
            .filter((F.col("run_id") == run_id) & (F.col("status") == "done"))
            .select("partition_id")
            .distinct()
            .collect()
        )
    except Exception:  # first run: lineage table absent
        return set()
    return {r.partition_id for r in rows}


def append_lineage(spark: SparkSession, lineage_path: str, rows: list[dict]) -> None:
    if not rows:
        return
    spark.createDataFrame(rows, schema=LINEAGE_SCHEMA).write.mode("append").parquet(
        lineage_path
    )


def append_metrics(spark: SparkSession, metrics_path: str, rows: list[dict]) -> None:
    if not rows:
        return
    spark.createDataFrame(rows, schema=METRICS_SCHEMA).write.mode("append").parquet(
        metrics_path
    )


def run_with_lineage(
    spark: SparkSession,
    df: DataFrame,
    process_fn,
    out_path: str,
    lineage_path: str,
    run_id: str | None = None,
    n_buckets: int = 64,
    buckets_per_batch: int = 16,
) -> str:
    """Process ``df`` bucket-batch-wise with checkpoint/resume.

    ``process_fn(bucket_df) -> DataFrame`` must produce the output rows
    for the given slice and carry ``doc_id``; output parquet is
    partitioned by ``pb`` and overwritten per-partition (idempotent).
    Returns the run_id.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    work = with_partition_bucket(df, n_buckets)
    done = read_done_buckets(spark, lineage_path, run_id)
    pending = [b for b in range(n_buckets) if b not in done]
    for i in range(0, len(pending), buckets_per_batch):
        batch = pending[i : i + buckets_per_batch]
        started = time.time()
        slice_df = work.filter(F.col("pb").isin(batch))
        out = process_fn(slice_df)
        if "pb" not in out.columns:
            out = with_partition_bucket(out, n_buckets)
        out.write.mode("overwrite").partitionBy("pb").parquet(out_path)
        # lineage rows reflect what was just committed
        stats = (
            slice_df.groupBy("pb")
            .agg(
                F.min("doc_id").alias("dmin"),
                F.max("doc_id").alias("dmax"),
                F.count("*").alias("n_series"),
                F.sum(F.coalesce(F.col("n_tok"), F.lit(0)).cast("long")).alias(
                    "n_tokens"
                ),
            )
            .collect()
        )
        now = time.time()
        append_lineage(
            spark,
            lineage_path,
            [
                {
                    "run_id": run_id,
                    "partition_id": int(r.pb),
                    "doc_id_min": r.dmin,
                    "doc_id_max": r.dmax,
                    "n_series": int(r.n_series),
                    "n_tokens": int(r.n_tokens or 0),
                    "out_bytes": None,
                    "status": "done",
                    "started_ts": _ts(started),
                    "finished_ts": _ts(now),
                }
                for r in stats
            ],
        )
    return run_id


def _ts(epoch: float):
    import datetime

    return datetime.datetime.fromtimestamp(epoch, tz=datetime.timezone.utc).replace(
        tzinfo=None
    )
