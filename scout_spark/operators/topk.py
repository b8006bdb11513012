"""Top-k operators (SURVEY.md §2.6).

``orderBy().limit(k)`` compiles to TakeOrderedAndProject — per-partition
bounded heaps merged at the driver, O(n) scan with O(k) memory per task —
strictly better than the reference's collect-then-Python-sort
(reference ranking.py:113-114) and safe at any scale because only k rows
ever leave the executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Global top-k. ``order`` should end with a unique column for
    determinism (SURVEY.md §2.12 — the reference's unordered LIMIT is
    nondeterministic; we fix that deliberately, flagged in §4 O6)."""
    return df.orderBy(*order).limit(k)


def grouped_top_k(
    df: DataFrame, partition_cols: list[str], order: list[Column], k: int
) -> DataFrame:
    """Per-group top-k via rank-1..k window — the windowed generalization
    of the reference's global top-k when batching many geocode requests
    (SURVEY.md §2.5 W2). One shuffle on the partition cols."""
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
