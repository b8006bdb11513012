"""Rollup-cascade tests: each level re-aggregated from the previous must
equal the same aggregate computed directly from raw events (the
decomposability invariant that makes continuous aggregates sound)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scout_spark.sources import load_table
from scout_spark.streaming.rollup import (
    LEVELS,
    build_rollup_cascade,
    pick_level,
    rollup_events,
    with_avg,
)


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, "/root/testdata/sf0.001", "events").cache()


def _canon(df):
    return sorted(
        (r["bucket"], r["event_type"], r["n_events"], round(r["sum_value"], 6),
         r["min_value"], r["max_value"])
        for r in df.collect()
    )


def test_cascade_equals_direct(events):
    cascade = build_rollup_cascade(events)
    for name, seconds in LEVELS.items():
        direct = rollup_events(events, seconds)
        assert _canon(cascade[name]) == _canon(direct), name


def test_avg_exact_at_every_level(events):
    cascade = build_rollup_cascade(events)
    hourly = with_avg(cascade["1h"])
    direct = events.groupBy(
        F.timestamp_seconds(
            (F.col("ts").cast("timestamp_ltz").cast("long") / 3600).cast("long") * 3600
        ).alias("bucket"),
        "event_type",
    ).agg(F.avg("value").alias("avg_value"))
    got = {(r["bucket"], r["event_type"]): r["avg_value"] for r in hourly.collect()}
    exp = {(r["bucket"], r["event_type"]): r["avg_value"] for r in direct.collect()}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], rel=1e-12)


def test_pick_level_routes_to_coarsest():
    assert pick_level(86400 * 7) == "1d"
    assert pick_level(7200) == "1h"
    assert pick_level(1800) == "10min"
    assert pick_level(900) == "10min"  # nothing divides → finest
