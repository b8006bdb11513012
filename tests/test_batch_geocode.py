"""Batched geocoding tests: one job over a request battery
(FIXTURES.md §4), results consistent with the per-request engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scout_spark.etl.fixtures import raw_osm_fixture
from scout_spark.etl.gazetteer import build_admin, build_pois
from scout_spark.plans.batch_geocode import forward_geocode_batch
from scout_spark.plans.geocode import GeocodeSettings, ScoutEngine


@pytest.fixture(scope="module")
def gaz(spark):
    raw = raw_osm_fixture(spark, n_pois=200)
    return build_pois(raw).cache(), build_admin(raw).cache()


@pytest.fixture(scope="module")
def battery(spark):
    rows = [
        (0, "Monograph Dining", "malaysia"),
        (1, "kopitiam 88", None),
        (2, "taman botani", "malaysia"),
        (3, "zzz no such place qqq", None),  # no candidates
        (4, "monograph dining", "atlantis"),  # unknown hint → unrestricted
    ]
    return spark.createDataFrame(rows, "req_id long, query string, country string")


def test_batch_shapes_and_ranks(spark, gaz, battery):
    pois, admin = gaz
    out = forward_geocode_batch(battery, pois, admin, limit=3)
    rows = out.collect()
    per_req = {}
    for r in rows:
        per_req.setdefault(r["req_id"], []).append(r)
    # ranked 1..k, scores non-increasing within each request
    for req_id, hits in per_req.items():
        hits.sort(key=lambda r: r["rank"])
        assert [h["rank"] for h in hits] == list(range(1, len(hits) + 1))
        scores = [h["score"] for h in hits]
        assert scores == sorted(scores, reverse=True)
    assert 3 not in per_req  # no-candidate request yields no rows
    assert per_req[0][0]["name"] == "Monograph Dining"
    assert per_req[4][0]["name"] in ("Monograph Dining", "Monograph Dinning")


def test_batch_agrees_with_per_request_engine(spark, gaz, battery):
    """Top hit per request must match the per-request engine run with the
    same scorer (proxy) and the token-index candidate path."""
    pois, admin = gaz
    batch = {
        r["req_id"]: r["name"]
        for r in forward_geocode_batch(battery, pois, admin, limit=1).collect()
    }
    eng = ScoutEngine(
        spark,
        pois,
        admin,
        GeocodeSettings(use_pandas_udf=False, use_token_index=True),
    )
    for req in battery.collect():
        hits = eng.forward([req["query"]], country=req["country"], limit=1).collect()
        if req["req_id"] in batch:
            assert hits and batch[req["req_id"]] == hits[0]["name"], req["query"]
        else:
            assert not hits


def test_batch_deterministic(spark, gaz, battery):
    pois, admin = gaz
    a = forward_geocode_batch(battery, pois, admin, limit=3).collect()
    b = forward_geocode_batch(battery, pois, admin, limit=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_batch_repeated_token_query(spark, gaz):
    """Regression: a query with a repeated token must still match
    (covering check counts distinct tokens on both sides)."""
    pois, admin = gaz
    battery = spark.createDataFrame(
        [(0, "monograph monograph dining", None)],
        "req_id long, query string, country string",
    )
    out = forward_geocode_batch(battery, pois, admin, limit=1).collect()
    assert out and out[0]["name"] == "Monograph Dining"


def test_batch_english_country_hint_resolves(spark, gaz):
    """Regression: hint matching the ENGLISH admin name must resolve the
    bbox even when a local-name norm exists (both name columns keyed)."""
    pois, admin = gaz
    from pyspark.sql import functions as F2

    # 'brunei' is the local norm; 'brunei darussalam' is the en norm —
    # query with a token set only the en norm fully covers
    battery = spark.createDataFrame(
        [(0, "kedai", "brunei darussalam")], "req_id long, query string, country string"
    )
    out = forward_geocode_batch(battery, pois, admin, limit=5).collect()
    # resolved bbox → every hit inside Brunei's box (country center 4.5353,114.7277 ± 0.8)
    for r in out:
        assert abs(r["lat"] - 4.5353) <= 0.8 and abs(r["lon"] - 114.7277) <= 0.8
