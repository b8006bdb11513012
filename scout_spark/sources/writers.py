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


def write_jsonl(df, path: str, compression: str | None = None) -> None:
    """Line-delimited JSON sink (the interchange format LLM-corpus
    pipelines exchange shards in). Spark's json writer escapes newlines/
    quotes inside values, so free text round-trips losslessly; one file
    per partition — at 100 TB this is the sharded-corpus layout."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark, path: str, schema=None):
    """Read a JSONL corpus. ALWAYS pass the schema in production — the
    sampling-based inference pass over 100 TB is a full extra scan, and
    inference widens absent fields to string. Falls back to inference
    for ad-hoc exploration when schema is None."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)
