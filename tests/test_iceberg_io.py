"""Iceberg-format smoke: BASELINE.json names Iceberg as the canonical
table format. The sandbox ships no Iceberg runtime jar (offline, no
~/.ivy2 cache), so this suite (a) exercises the detection + fallback
path that production relies on and (b) runs the real
``format('iceberg')`` read end-to-end IF a runtime is ever present —
an explicit skip otherwise, not silence."""

from __future__ import annotations

import pytest

from tersets_spark.sources.io import iceberg_available, read_table


def test_iceberg_detection_is_honest(spark):
    """iceberg_available must reflect the actual JVM classpath."""
    present = iceberg_available(spark)
    # the sandbox is offline with no iceberg-spark-runtime jar; if this
    # ever flips to True the skipped test below starts running for real
    assert isinstance(present, bool)


def test_parquet_fallback_reads(spark, tmp_path):
    """format='auto' on a filesystem path must take the parquet path
    (the documented fallback when no catalog/namespace is addressed)."""
    p = str(tmp_path / "t.parquet")
    spark.range(10).withColumnRenamed("id", "doc_id").write.parquet(p)
    out = read_table(spark, p, fmt="auto")
    assert out.count() == 10 and out.columns == ["doc_id"]


def test_iceberg_roundtrip_if_runtime_present(spark, tmp_path):
    """Real Iceberg write+read — runs only when the runtime jar is on
    the classpath (never in this sandbox: documented tested-absent)."""
    if not iceberg_available(spark):
        pytest.skip(
            "iceberg-spark-runtime jar absent in this container "
            "(offline sandbox); detection + parquet fallback covered above"
        )
    df = spark.range(5).withColumnRenamed("id", "doc_id")
    df.writeTo("local.db.t").using("iceberg").createOrReplace()
    assert spark.read.format("iceberg").load("local.db.t").count() == 5
