"""Union/dedup of partial runs — last-writer-wins merge.

SURVEY.md §2.3: retried or resumed runs may append overlapping rows;
``latest_wins`` collapses them deterministically (unionByName +
row_number over the version column, newest first). At scale this is one
shuffle on the key columns; AQE splits skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_wins(
    df: DataFrame, key_cols: list[str], version_col: str, *more: DataFrame
) -> DataFrame:
    """Merge ``df`` (and any additional frames) keeping exactly one row
    per key — the one with the greatest ``version_col`` (ties broken
    deterministically by the remaining columns)."""
    for other in more:
        df = df.unionByName(other, allowMissingColumns=True)
    order = [F.col(version_col).desc()] + [
        F.col(c).desc() for c in df.columns if c not in key_cols and c != version_col
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
