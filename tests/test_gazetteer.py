"""Gazetteer ETL tests (SURVEY.md §5.3/§5.4): build invariants from the
reference's migration SQL, schema-adaptive binding variants, and the
poi_view projection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scout_spark.etl.fixtures import raw_osm_fixture
from scout_spark.etl.gazetteer import POI_VIEW_COLUMNS, build_admin, build_pois


@pytest.fixture(scope="module")
def raw(spark):
    return raw_osm_fixture(spark, n_pois=300).cache()


@pytest.fixture(scope="module")
def pois(raw):
    return build_pois(raw).cache()


@pytest.fixture(scope="module")
def admin(raw):
    return build_admin(raw).cache()


def test_pois_schema(pois):
    assert [f.name for f in pois.schema.fields] == POI_VIEW_COLUMNS


def test_pois_name_filter(pois):
    # reference 001_pois.sql:13-14 — at least one name resolves
    assert (
        pois.where(
            F.col("name_local").isNull() & F.col("name_en").isNull()
        ).count()
        == 0
    )


def test_pois_class_filter(raw, pois):
    # reference 001_pois.sql:48-52 — rows lacking all five POI keys dropped
    classes = ["amenity", "shop", "tourism", "leisure", "office"]
    no_class = raw.where(
        ~F.greatest(*[F.col("tags").getItem(c).isNotNull() for c in classes])
    ).count()
    assert no_class > 0  # fixture plants such rows
    bad = pois.where(
        (F.col("amenity") == "")
        & (F.col("shop") == "")
        & (F.col("tourism") == "")
        & (F.col("leisure") == "")
        & (F.col("office") == "")
    ).count()
    assert bad == 0


def test_kind_never_null_and_prefixed(pois):
    # reference 001_pois.sql:32-39 + SURVEY.md §2.12
    assert pois.where(F.col("kind").isNull()).count() == 0
    kinds = {r[0] for r in pois.select("kind").distinct().collect()}
    for k in kinds:
        assert k == "unknown" or ":" in k, k


def test_importance_in_unit_interval(pois):
    # reference 001_pois.sql:40-46 — LEAST(1.0, Σ boosts), boosts ≥ 0
    out = pois.agg(
        F.min("importance").alias("lo"), F.max("importance").alias("hi")
    ).collect()[0]
    assert 0.0 <= out["lo"] and out["hi"] <= 1.0


def test_tag_defaults(pois):
    # COALESCE('') for classes, NULLIF('') for address (001_pois.sql:22-29)
    assert pois.where(F.col("amenity").isNull()).count() == 0
    assert pois.where(F.col("city") == "").count() == 0


def test_admin_level_try_cast(admin):
    # reference 002_admin.sql:10 — non-numeric admin_level → NULL int,
    # raw string preserved
    bad = admin.where(F.col("admin_level_raw") == "abc").collect()
    assert len(bad) == 1 and bad[0]["admin_level"] is None


def test_admin_boundary_filter(admin):
    assert admin.count() > 0
    # countries and cities present
    levels = {r[0] for r in admin.select("admin_level").distinct().collect()}
    assert 2 in levels and 8 in levels


@pytest.mark.parametrize("with_id,with_name", [(True, True), (False, True), (True, False), (False, False)])
def test_schema_adaptive_binding(spark, with_id, with_name):
    """SURVEY.md §1.3: id may be absent (synthesize row_number), name may
    be absent (fall back to tags['name'])."""
    raw = raw_osm_fixture(spark, n_pois=50, with_id_col=with_id, with_name_col=with_name)
    pois = build_pois(raw)
    n = pois.count()
    assert n > 0
    ids = pois.agg(F.countDistinct("osm_id")).collect()[0][0]
    assert ids == n  # unique either way
    # name fallback: without the name column, tags['name'] still resolves
    assert pois.where(F.col("name_local").isNotNull()).count() > 0


def test_norm_columns_match_canon(pois):
    # O3 precompute: stored norm equals recomputing canon at read time
    from scout_spark.functions.normalize import canon

    diff = pois.where(
        F.col("name_local").isNotNull()
        & (F.col("name_local_norm") != canon(F.col("name_local")))
    ).count()
    assert diff == 0
