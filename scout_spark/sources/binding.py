"""Schema-adaptive source binding (SURVEY.md §1.3, §2.9 X2).

The reference introspects the raw QuackOSM table with PRAGMA table_info and
rewrites SQL placeholders {ID_EXPR}/{NAME_ARG}/{GEOM_EXPR}
(reference scripts/build_gazetteer.py:25-61). In the DataFrame API the same
adaptivity is plain Python over ``df.schema``: each placeholder becomes a
function returning a Column, inlined at plan-construction time — the
faithful analogue of DuckDB macro inlining, with zero runtime cost.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass(frozen=True)
class SourceBinding:
    """Resolved column expressions for a raw OSM-like source."""

    id_col: Column
    name_col: Column  # nullable string; NULL when source has no name column
    has_synthetic_id: bool

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumn("_osm_id", self.id_col).withColumn(
            "_name_raw", self.name_col
        )


def bind_raw_source(df: DataFrame) -> SourceBinding:
    """Inspect ``df.schema`` and resolve id/name expressions.

    Mirrors reference build_gazetteer.py:26-42:
      - id column may be ``id`` or ``osm_id``; else synthesize a dense
        BIGINT via ROW_NUMBER() OVER () (single-partition window — build
        time only, exactly like the reference's one-shot ETL). Use
        ``monotonically_increasing_id`` instead when density isn't needed.
      - ``name`` column is optional; when absent the caller falls back to
        ``tags['name']`` (reference sql/migrations/000_init.sql:14-19).
    Geometry detection (build_gazetteer.py:30-39) is out of scope: per
    SURVEY.md §1.2 geometry is eliminated at the ETL edge — raw fixtures
    carry centroid lat/lon + bbox doubles already.
    """
    cols = set(df.schema.fieldNames())
    if "id" in cols:
        id_col, synthetic = F.col("id").cast("bigint"), False
    elif "osm_id" in cols:
        id_col, synthetic = F.col("osm_id").cast("bigint"), False
    elif "feature_id" in cols:
        # QuackOSM GeoParquet ids are strings like "node/240109189" —
        # take the numeric tail (reference accepts any id-ish column,
        # build_gazetteer.py:29)
        id_col = F.regexp_extract(F.col("feature_id"), r"(\d+)$", 1).try_cast(
            "bigint"
        )
        synthetic = False
    else:
        id_col = F.row_number().over(Window.orderBy(F.lit(1))).cast("bigint")
        synthetic = True
    name_col = (
        F.col("name").cast("string") if "name" in cols else F.lit(None).cast("string")
    )
    return SourceBinding(id_col=id_col, name_col=name_col, has_synthetic_id=synthetic)


# geometry column candidates, in the reference's probe order
# (build_gazetteer.py:30-39)
GEOMETRY_COLUMNS = ("geometry", "geom", "wkb_geometry", "wkt")


@dataclass(frozen=True)
class GeometryBinding:
    """Resolved centroid expressions: lat/lon DOUBLE columns however the
    source encodes position (SURVEY.md §1.2: geometry is eliminated at
    the ETL edge — these expressions are that elimination)."""

    lat_col: Column
    lon_col: Column
    kind: str  # "latlon" | "wkb" | "wkt"


def _wkb_point_udf():
    """Arrow-batched WKB point decoder: (byte-order flag, uint32 geom
    type [EWKB SRID flag honored], x, y doubles) → struct<lon, lat>.
    Non-point geometries decode to NULL — the reference reduces
    polygons to centroids upstream (ST_Centroid at ingest,
    001_pois.sql:30-31); a GeoParquet export that kept raw polygons
    must be centroided before this decoder."""
    import struct as _struct

    @F.pandas_udf("struct<lon: double, lat: double>")
    def _decode(wkb: pd.Series) -> pd.DataFrame:
        lons: list[float | None] = []
        lats: list[float | None] = []
        for b in wkb:
            if b is None:
                lons.append(None)
                lats.append(None)
                continue
            b = bytes(b)
            try:
                order = "<" if b[0] == 1 else ">"
                gtype = _struct.unpack_from(order + "I", b, 1)[0]
                off = 5
                if gtype & 0x20000000:  # EWKB SRID present
                    off += 4
                    gtype &= ~0x20000000
                if gtype % 1000 != 1:  # not a (2D/Z/M) point
                    raise ValueError
                x, y = _struct.unpack_from(order + "dd", b, off)
                lons.append(x)
                lats.append(y)
            except (ValueError, _struct.error, IndexError):
                lons.append(None)
                lats.append(None)
        return pd.DataFrame({"lon": lons, "lat": lats})

    return _decode


_WKT_POINT = r"POINT\s*\(\s*([-+0-9.eE]+)\s+([-+0-9.eE]+)\s*\)"


def bind_geometry(df: DataFrame) -> GeometryBinding:
    """Resolve centroid lat/lon from whatever the source provides.

    Probe order mirrors reference build_gazetteer.py:30-39: materialized
    lat/lon doubles first (our fixtures and any pre-centroided export),
    then a geometry column by name — BinaryType → WKB point decode
    (QuackOSM GeoParquet shape), StringType → WKT ``POINT(x y)`` parse
    (pure Column, codegen-able). No geometry at all is a hard error,
    exactly like the reference (build_gazetteer.py:38-39).
    """
    fields = {f.name: f.dataType.typeName() for f in df.schema.fields}
    if "lat" in fields and "lon" in fields:
        return GeometryBinding(
            lat_col=F.col("lat").cast("double"),
            lon_col=F.col("lon").cast("double"),
            kind="latlon",
        )
    for name in GEOMETRY_COLUMNS:
        if name not in fields:
            continue
        if fields[name] == "binary":
            pt = _wkb_point_udf()(F.col(name))
            return GeometryBinding(
                lat_col=pt.getField("lat"), lon_col=pt.getField("lon"), kind="wkb"
            )
        if fields[name] == "string":
            return GeometryBinding(
                lat_col=F.regexp_extract(F.col(name), _WKT_POINT, 2).try_cast(
                    "double"
                ),
                lon_col=F.regexp_extract(F.col(name), _WKT_POINT, 1).try_cast(
                    "double"
                ),
                kind="wkt",
            )
    raise ValueError(
        "no geometry found: expected lat/lon columns or one of "
        f"{GEOMETRY_COLUMNS} (reference build_gazetteer.py:38-39 errors "
        "identically)"
    )
