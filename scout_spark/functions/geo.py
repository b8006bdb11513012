"""Geospatial scalar expressions (SURVEY.md §2.8 F14-F15, §2.2 P7).

All pure Column math — stays inside whole-stage codegen, no UDFs
(the reference computes these per-row in Python, ranking.py:19-28,92).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # reference ranking.py:20


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (reference ranking.py:19-28)."""
    phi1, phi2 = F.radians(lat1), F.radians(lat2)
    dphi = phi2 - phi1
    dl = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dphi / 2), 2) + F.cos(phi1) * F.cos(phi2) * F.pow(
        F.sin(dl / 2), 2
    )
    return 2 * F.lit(EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def proximity_decay(distance_km: Column, proximity_km: float = 25.0) -> Column:
    """Linear decay to zero at ``proximity_km`` (reference ranking.py:92):
    max(0, 1 - min(d/proximity_km, 1))."""
    return F.greatest(
        F.lit(0.0),
        F.lit(1.0) - F.least(distance_km / F.lit(proximity_km), F.lit(1.0)),
    )


def bbox_predicate(
    lat: Column, lon: Column, minx: float, miny: float, maxx: float, maxy: float
) -> Column:
    """Range predicate ``lat BETWEEN miny AND maxy AND lon BETWEEN minx AND
    maxx`` (reference repo.py:57-61). Plain comparisons → pushed into the
    parquet scan as min/max row-group skipping."""
    return lat.between(miny, maxy) & lon.between(minx, maxx)
