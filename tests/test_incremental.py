"""Incremental upsert tests: last-write-wins by osm_id, survivors
preserved, staging swap leaves a readable table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scout_spark.etl.fixtures import RAW_SCHEMA, raw_osm_fixture
from scout_spark.etl.gazetteer import build_gazetteer
from scout_spark.etl.incremental import merge_upsert, upsert_pois


def test_merge_upsert_semantics(spark):
    existing = spark.createDataFrame(
        [(1, "old-a"), (2, "old-b"), (3, "old-c")], "osm_id long, name string"
    )
    updates = spark.createDataFrame(
        [(2, "new-b"), (9, "new-i")], "osm_id long, name string"
    )
    got = {r["osm_id"]: r["name"] for r in merge_upsert(existing, updates).collect()}
    assert got == {1: "old-a", 2: "new-b", 3: "old-c", 9: "new-i"}


def test_merge_upsert_dedups_duplicate_keys_in_batch(spark):
    existing = spark.createDataFrame([(1, "old-a")], "osm_id long, name string")
    updates = spark.createDataFrame(
        [(2, "dup-x"), (2, "dup-y"), (3, "new-c")], "osm_id long, name string"
    )
    merged = merge_upsert(existing, updates)
    rows = merged.collect()
    assert len(rows) == 3, "duplicate-key batch must collapse to one row per key"
    # winner is deterministic: same input → same output across runs
    again = {r["osm_id"]: r["name"] for r in merge_upsert(existing, updates).collect()}
    assert {r["osm_id"]: r["name"] for r in rows} == again


def test_upsert_pois_end_to_end(spark, tmp_path):
    gaz = str(tmp_path / "gaz")
    raw = raw_osm_fixture(spark, n_pois=100)
    build_gazetteer(spark, raw, gaz)
    pois0 = spark.read.parquet(f"{gaz}/pois")
    victim = pois0.where(F.col("amenity") != "").select("osm_id").first()["osm_id"]

    batch = spark.createDataFrame(
        [
            # update an existing POI (same osm_id, renamed)
            (victim, "Renamed Spot", {"name": "Renamed Spot", "amenity": "cafe"},
             3.14, 101.68, 101.68, 3.14, 101.68, 3.14),
            # brand-new POI
            (10_000_001, "Fresh Cafe", {"name": "Fresh Cafe", "amenity": "cafe"},
             1.30, 103.80, 103.80, 1.30, 103.80, 1.30),
        ],
        RAW_SCHEMA,
    )
    before, after = upsert_pois(spark, batch, gaz)
    assert after == before + 1  # one update in place, one insert

    pois1 = spark.read.parquet(f"{gaz}/pois")
    renamed = pois1.where(F.col("osm_id") == victim).collect()
    assert len(renamed) == 1 and renamed[0]["name_local"] == "Renamed Spot"
    assert pois1.where(F.col("osm_id") == 10_000_001).count() == 1
    # untouched rows survive
    assert pois1.count() == after


def test_upsert_rejects_synthetic_ids(spark, tmp_path):
    gaz = str(tmp_path / "gaz2")
    raw = raw_osm_fixture(spark, n_pois=30)
    build_gazetteer(spark, raw, gaz)
    batch_no_id = raw_osm_fixture(spark, n_pois=5, with_id_col=False)
    with pytest.raises(ValueError, match="synthetic"):
        upsert_pois(spark, batch_no_id, gaz)
