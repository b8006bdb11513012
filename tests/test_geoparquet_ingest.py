"""S1 ingest path on the reference's actual raw shape: a
QuackOSM-style GeoParquet fixture (string feature_id, tags map, WKB
point geometry — reference scripts/build_gazetteer.py:25-54 probes
exactly this) read through schema-adaptive binding into build_pois."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from scout_spark.etl.gazetteer import build_pois
from scout_spark.sources.binding import bind_geometry, bind_raw_source


def _wkb_point(lon: float, lat: float, little: bool = True, srid: int | None = None):
    order = "<" if little else ">"
    gtype = 1 | (0x20000000 if srid is not None else 0)
    buf = struct.pack(order + "BI", 1 if little else 0, gtype)
    if srid is not None:
        buf += struct.pack(order + "I", srid)
    return buf + struct.pack(order + "dd", lon, lat)


QUACKOSM_SCHEMA = StructType(
    [
        StructField("feature_id", StringType(), True),
        StructField("tags", MapType(StringType(), StringType()), True),
        StructField("geometry", BinaryType(), True),
    ]
)


@pytest.fixture(scope="module")
def geoparquet_path(spark, tmp_path_factory):
    rows = [
        (
            "node/240109189",
            {"name": "Monograph Dining", "name:en": "Monograph Dining",
             "amenity": "restaurant"},
            _wkb_point(101.6869, 3.139),
        ),
        (
            "node/240109190",
            {"name": "Kopitiam 88", "amenity": "cafe"},
            _wkb_point(100.3288, 5.4141, little=False),  # big-endian WKB
        ),
        (
            "node/998",
            {"name": "EWKB Corner", "shop": "mall"},
            _wkb_point(103.8198, 1.3521, srid=4326),  # EWKB with SRID
        ),
        (
            "way/1771291966",
            {"name": "Unnamed Way", "amenity": "parking"},
            # polygon-typed WKB → decodes NULL (centroided upstream in
            # the real pipeline)
            struct.pack("<BI", 1, 3) + b"\x00" * 8,
        ),
        ("node/999", {"highway": "bus_stop"}, _wkb_point(0.0, 0.0)),  # nameless
    ]
    path = str(tmp_path_factory.mktemp("geoparquet") / "raw_osm")
    spark.createDataFrame(rows, QUACKOSM_SCHEMA).write.parquet(path)
    return path


def test_binding_resolves_quackosm_shape(spark, geoparquet_path):
    raw = spark.read.parquet(geoparquet_path)
    b = bind_raw_source(raw)
    assert not b.has_synthetic_id, "feature_id numeric tail must bind as id"
    g = bind_geometry(raw)
    assert g.kind == "wkb"
    got = {
        r["_id"]: (r["lon"], r["lat"])
        for r in raw.select(
            b.id_col.alias("_id"),
            F.round(g.lon_col, 4).alias("lon"),
            F.round(g.lat_col, 4).alias("lat"),
        ).collect()
    }
    assert got[240109189] == (101.6869, 3.139)
    assert got[240109190] == (100.3288, 5.4141), "big-endian WKB must decode"
    assert got[998] == (103.8198, 1.3521), "EWKB SRID header must be skipped"
    assert got[1771291966] == (None, None), "non-point WKB decodes to NULL"


def test_build_pois_end_to_end_from_geoparquet(spark, geoparquet_path):
    raw = spark.read.parquet(geoparquet_path)
    pois = build_pois(raw).collect()
    by_name = {r["name_local"]: r for r in pois}
    assert "Monograph Dining" in by_name
    assert round(by_name["Monograph Dining"]["lat"], 4) == 3.139
    assert by_name["Monograph Dining"]["kind"] == "amenity:restaurant"
    assert "Kopitiam 88" in by_name
    # nameless bus stop filtered (name resolution, 001_pois.sql:13-14);
    # parking is not a POI class miss — amenity present, but its name
    # survives with NULL centroid (reference would have centroided it)
    names = set(by_name)
    assert not any(n is None for n in names)


def test_wkt_string_geometry_binds_as_pure_column(spark):
    df = spark.createDataFrame(
        [("a", "POINT(101.5 3.25)"), ("b", "POINT  ( -0.1275 51.5072 )"), ("c", None)],
        "id string, wkt string",
    )
    g = bind_geometry(df)
    assert g.kind == "wkt"
    got = {
        r["id"]: (r["lon"], r["lat"])
        for r in df.select("id", g.lon_col.alias("lon"), g.lat_col.alias("lat")).collect()
    }
    assert got["a"] == (101.5, 3.25)
    assert got["b"] == (-0.1275, 51.5072)
    assert got["c"] == (None, None)


def test_missing_geometry_is_hard_error(spark):
    df = spark.createDataFrame([(1, "x")], "id long, name string")
    with pytest.raises(ValueError, match="no geometry"):
        bind_geometry(df)
