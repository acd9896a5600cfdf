"""Capture .explain('formatted') for a set of declared queries.

Usage: python tools/capture_plans.py <repo_root> <out_dir> <query...>

Runs each query factory from <repo_root>'s __spark_entry__ against
sf0.001 and writes <out_dir>/<query>.txt. Used for the round-10
before/after plan evidence (the before plans come from a round-start
checkout)."""

from __future__ import annotations

import os
import sys


def main() -> None:
    repo, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sys.path.insert(0, repo)
    os.makedirs(out_dir, exist_ok=True)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("capture_plans")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, "/root/testdata/sf0.001")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print("captured", name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
