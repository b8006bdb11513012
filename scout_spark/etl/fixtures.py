"""Deterministic synthetic raw-OSM fixture generator (FIXTURES.md §1-§4).

Replaces the reference's QuackOSM subprocess ingest for tests — real
PBF extracts are out of scope for CI (SURVEY.md §7 M2). Seeded Python
``random`` → reproducible rows; multilingual names, punctuation/digit
cases, empty-vs-NULL names pin the normalizer; planted clusters pin
fuzzy/proximity/importance ranking.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

RAW_SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("name", StringType(), True),
        StructField("tags", MapType(StringType(), StringType()), True),
        StructField("lat", DoubleType(), True),
        StructField("lon", DoubleType(), True),
        StructField("minx", DoubleType(), True),
        StructField("miny", DoubleType(), True),
        StructField("maxx", DoubleType(), True),
        StructField("maxy", DoubleType(), True),
    ]
)

_POI_NAMES = [
    # planted clusters (FIXTURES.md §2): exact, fuzzy near-match (1-2
    # edits), token-subset, multilingual, punctuation/digits
    ("Monograph Dining", "Monograph Dining", "amenity", "restaurant"),
    ("Monograph Dinning", "Monograph Dinning", "amenity", "restaurant"),
    ("Monograph Cafe & Dining", "Monograph Cafe & Dining", "amenity", "cafe"),
    ("Kopitiam 88", "Coffee Shop 88", "amenity", "cafe"),
    ("Restoran Nasi Kandar", "Nasi Kandar Restaurant", "amenity", "restaurant"),
    ("美食中心", "Food Centre", "amenity", "food_court"),
    ("مطعم الشرق", "Orient Restaurant", "amenity", "restaurant"),
    ("D'Palma Hotel", "D'Palma Hotel", "tourism", "hotel"),
    ("Pasar #2 @ Jalan Tun", "Market No. 2", "shop", "supermarket"),
    ("One-Utama Mall", "One Utama Shopping Centre", "shop", "mall"),
    ("Taman Botani", "Botanic Gardens", "leisure", "park"),
    ("Menara KL Office", "KL Tower Office", "office", "company"),
]

_CITIES = [
    # (name_local, name_en, admin_level, center, bbox_half_deg)
    ("Kuala Lumpur", "Kuala Lumpur", 8, (3.139, 101.6869), 0.25),
    ("George Town", "George Town", 8, (5.4141, 100.3288), 0.15),
    ("Johor Bahru", "Johor Bahru", 8, (1.4927, 103.7414), 0.2),
    ("Singapore", "Singapore", 6, (1.3521, 103.8198), 0.3),
]
_COUNTRIES = [
    ("Malaysia", "Malaysia", "MY", (4.2105, 101.9758), 4.5),
    ("Singapore", "Singapore", "SG", (1.3521, 103.8198), 0.4),
    ("Brunei", "Brunei Darussalam", "BN", (4.5353, 114.7277), 0.8),
]


def raw_osm_fixture(
    spark: SparkSession,
    n_pois: int = 600,
    seed: int = 42,
    with_id_col: bool = True,
    with_name_col: bool = True,
) -> DataFrame:
    """Synthetic raw table. ``with_id_col``/``with_name_col`` exercise the
    schema-adaptive binding variants (FIXTURES.md §1: present in ~half the
    fixture variants)."""
    rng = random.Random(seed)
    rows: list[tuple] = []
    rid = 1

    def poi_row(name_local, name_en, cls, val, lat, lon, extra=None):
        nonlocal rid
        tags = {"name": name_local, cls: val}
        if name_en:
            tags["name:en"] = name_en
        if rng.random() < 0.3:
            tags["wikidata"] = f"Q{rng.randint(1000, 99999)}"
        if rng.random() < 0.2:
            tags["website"] = "https://example.com"
        city = rng.choice(_CITIES)
        tags["addr:city"] = city[0]
        tags["addr:country"] = rng.choice(_COUNTRIES)[2].lower()
        tags.update(extra or {})
        rows.append(
            (rid, name_local, tags, lat, lon, lon, lat, lon, lat)
        )
        rid += 1

    # planted clusters near each city center
    for city in _CITIES:
        (clat, clon), half = city[3], city[4]
        for name_local, name_en, cls, val in _POI_NAMES:
            poi_row(
                name_local,
                name_en,
                cls,
                val,
                clat + rng.uniform(-half, half),
                clon + rng.uniform(-half, half),
            )
    # random filler POIs; ~30% with no POI-class key (must be filtered,
    # reference 001_pois.sql:48-52), some empty-string / NULL names
    words = ["Jalan", "Kedai", "Warung", "Plaza", "Centre", "Bukit", "Lor", "Uptown"]
    classes = ["amenity", "shop", "tourism", "leisure", "office"]
    for _ in range(n_pois):
        name = " ".join(rng.sample(words, rng.randint(1, 3))) + f" {rng.randint(1, 99)}"
        if rng.random() < 0.05:
            name = ""
        elif rng.random() < 0.05:
            name = None
        tags = {}
        if name:
            tags["name"] = name
        if rng.random() > 0.3:
            tags[rng.choice(classes)] = "generic"
        country = rng.choice(_COUNTRIES)
        lat = country[3][0] + rng.uniform(-country[4], country[4])
        lon = country[3][1] + rng.uniform(-country[4], country[4])
        rows.append((rid, name, tags, lat, lon, lon, lat, lon, lat))
        rid += 1

    # admin boundaries: countries (level 2) + cities (6-10) + edge cases
    for name_local, name_en, iso, (clat, clon), half in _COUNTRIES:
        tags = {
            "name": name_local,
            "name:en": name_en,
            "boundary": "administrative",
            "admin_level": "2",
            "ISO3166-1": iso,
        }
        rows.append(
            (rid, name_local, tags, clat, clon, clon - half, clat - half, clon + half, clat + half)
        )
        rid += 1
    for name_local, name_en, level, (clat, clon), half in _CITIES:
        tags = {
            "name": name_local,
            "name:en": name_en,
            "boundary": "administrative",
            "admin_level": str(level),
        }
        rows.append(
            (rid, name_local, tags, clat, clon, clon - half, clat - half, clon + half, clat + half)
        )
        rid += 1
    # overlapping name at levels 2 and 8 (largest-area-wins tiebreak,
    # FIXTURES.md §3) + NULL admin_level (failed TRY_CAST) + non-numeric raw
    rows.append(
        (rid, "Singapore", {"name": "Singapore", "boundary": "administrative", "admin_level": "8"},
         1.3521, 103.8198, 103.7, 1.25, 103.95, 1.45)
    )
    rid += 1
    rows.append(
        (rid, "Nowhere", {"name": "Nowhere", "boundary": "administrative", "admin_level": "abc"},
         0.0, 0.0, -1.0, -1.0, 1.0, 1.0)
    )
    rid += 1

    df = spark.createDataFrame(rows, RAW_SCHEMA)
    if not with_id_col:
        df = df.drop("id")
    if not with_name_col:
        df = df.drop("name")
    return df
