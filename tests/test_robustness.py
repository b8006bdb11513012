"""Ingest robustness: parquet schema evolution (mergeSchema) and corrupt
JSON payload handling — the failure modes a 100 TB landing zone actually
produces."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_parquet_schema_evolution(spark, tmp_path):
    """A v2 writer adds a column; readers must see the union schema with
    NULLs for v1 files (mergeSchema) — no rewrite of old data."""
    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        f"{out}/batch=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(f"{out}/batch=2")
    df = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(df.columns) >= {"id", "name", "score"}
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_corrupt_json_payloads_null_not_fail(spark):
    """from_json yields NULL for corrupt payloads (PERMISSIVE) — a bad
    record must not kill a 100 TB job; count the damage instead."""
    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, "not json at all"), (3, None), (4, '{"k": "x"}')],
        "id long, props string",
    )
    parsed = df.select(
        "id", F.from_json("props", "k int").alias("j")
    ).select("id", F.col("j.k").alias("k"))
    got = {r["id"]: r["k"] for r in parsed.collect()}
    assert got[1] == 5
    assert got[2] is None and got[3] is None and got[4] is None
    bad = parsed.where(F.col("k").isNull()).count()
    assert bad == 3
