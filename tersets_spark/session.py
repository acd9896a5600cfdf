"""SparkSession builder tuned for the engine.

Local-mode settings mirror what a 1000-executor cluster deployment would
set cluster-wide: AQE on (runtime re-planning + skew-join splitting),
Arrow on (the kernels are pandas/Arrow UDFs), UTC session timezone
(oracle comparisons), shuffle partitions sized to cores (overridden to
~2-3x total cores on a real cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Arrow batch size: token arrays run to 262k elements (FIXTURES.md §1).
#: Bigger batches amortize the per-batch numpy fixed costs of the batched
#: kernels (measured ~15% at 512 vs 256); the worst-case batch (512 rows
#: of 262k-token tail docs) stays ~1 GiB in the Python worker.
ARROW_BATCH_ROWS = 512


def get_spark(
    app_name: str = "tersets_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
