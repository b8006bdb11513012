"""Parquet sink helpers (SURVEY.md §2.1 S4, §4 O1/O3).

The reference materializes derived tables with CTAS + ART indexes
(reference sql/migrations/001_pois.sql:4,54-55). Spark has no secondary
indexes; the scale substitute is layout: partition by a coarse pruning key
and sort within partitions so parquet row-group min/max statistics skip
row groups for range/equality predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str] | None = None,
    partition_by: list[str] | None = None,
    num_files: int | None = None,
) -> None:
    """Overwrite-write ``df`` as Parquet with a scan-friendly layout.

    ``mode("overwrite")`` is the atomic replacement for the reference's
    DROP TABLE IF EXISTS + CTAS-in-transaction (build_gazetteer.py:62-72).
    """
    out = df
    if num_files:
        out = out.repartition(num_files, *(partition_by or sort_cols or []))
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
