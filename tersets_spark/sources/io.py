"""Format-parameterized table IO.

BASELINE.json names Iceberg as the canonical table format; the sandbox
has no Iceberg runtime jar, so every path is parameterized
(SURVEY.md §7 risk register): ``format='iceberg'`` uses the catalog
``spark.read.format('iceberg')`` path when the runtime is present, and
the parquet directory layout (identical schema + partition columns)
stands in otherwise. Write disposition follows the engine's idempotence
rule: partition overwrite, never blind append, so checkpoint replays
can't duplicate data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.Class.forName("org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, path: str, fmt: str = "auto") -> DataFrame:
    if fmt == "iceberg" or (fmt == "auto" and not path.startswith("/") and "." in path):
        if iceberg_available(spark):
            return spark.read.format("iceberg").load(path)
        raise RuntimeError(
            "Iceberg runtime not on the classpath; pass a parquet path or fmt='parquet'"
        )
    return spark.read.parquet(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "auto",
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    if fmt == "iceberg" and iceberg_available(df.sparkSession):
        writer = df.writeTo(path)
        if mode == "overwrite":
            writer.overwritePartitions()
        else:
            writer.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
