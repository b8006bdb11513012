"""Spatial containment join — the reference's filter-then-verify core
(SURVEY.md §3.1) applied to geometry.

The reference resolves admin areas by bbox only
(reference app.py admin resolve; sql/migrations/002_admin.sql keeps
minx/miny/maxx/maxy). This module adds the exact step a real geocoder
needs on top: point-in-POLYGON, as a two-phase plan:

  1. FILTER: bbox containment — pure Column comparisons against the
     broadcast polygon table (codegen, prunes ~everything);
  2. VERIFY: exact ray-casting (even-odd rule) in a vectorized numpy
     pandas UDF, run only on bbox survivors.

Polygons are rings of (lon, lat) — arrays of x and y doubles with the
first vertex NOT repeated; holes are extra rings (even-odd handles
them uniformly). The polygon side is a broadcast dim (admin boundaries
are thousands, points are billions) — at 100 TB the point scan is
embarrassingly parallel with zero shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ray_cast_udf():
    """struct(rings, x, y) → bool: even-odd point-in-polygon.

    Vertices on an edge count per raw even-odd arithmetic (boundary
    points are not guaranteed either way — standard for geocoding,
    where query points on exact boundaries are measure-zero)."""
    import numpy as np

    @F.pandas_udf("boolean")
    def _inside(rings: pd.Series, xs: pd.Series, ys: pd.Series) -> pd.Series:
        out = []
        for poly, x, y in zip(rings, xs, ys):
            inside = False
            for ring in poly:
                rx = np.asarray(ring["xs"], dtype=np.float64)
                ry = np.asarray(ring["ys"], dtype=np.float64)
                x1, y1 = rx, ry
                x2, y2 = np.roll(rx, -1), np.roll(ry, -1)
                # edges straddling the horizontal line through y
                straddle = (y1 > y) != (y2 > y)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xin = x1 + (y - y1) / (y2 - y1) * (x2 - x1)
                crossings = int(np.count_nonzero(straddle & (xin > x)))
                if crossings % 2:
                    inside = not inside
            out.append(inside)
        return pd.Series(out)

    return _inside


RING_SCHEMA = (
    "array<struct<xs: array<double>, ys: array<double>>>"
)


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    point_id: str = "point_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    poly_id: str = "poly_id",
    rings_col: str = "rings",
) -> DataFrame:
    """(point_id, poly_id) for every point inside a polygon.

    ``polygons`` must carry ``rings`` (:data:`RING_SCHEMA`) and is
    broadcast; bbox columns are derived from the outer ring if absent.
    """
    cols = set(polygons.columns)
    if not {"minx", "miny", "maxx", "maxy"} <= cols:
        outer = F.element_at(F.col(rings_col), 1)
        polygons = polygons.select(
            "*",
            F.array_min(outer.getField("xs")).alias("minx"),
            F.array_min(outer.getField("ys")).alias("miny"),
            F.array_max(outer.getField("xs")).alias("maxx"),
            F.array_max(outer.getField("ys")).alias("maxy"),
        )
    p = points.select(
        F.col(point_id), F.col(lon_col).alias("_x"), F.col(lat_col).alias("_y")
    )
    bbox_hit = (
        (F.col("_x") >= F.col("minx"))
        & (F.col("_x") <= F.col("maxx"))
        & (F.col("_y") >= F.col("miny"))
        & (F.col("_y") <= F.col("maxy"))
    )
    cand = p.join(F.broadcast(polygons), bbox_hit)
    inside = _ray_cast_udf()
    return (
        cand.withColumn(
            "_in", inside(F.col(rings_col), F.col("_x"), F.col("_y"))
        )
        .where(F.col("_in"))
        .select(point_id, poly_id)
    )
