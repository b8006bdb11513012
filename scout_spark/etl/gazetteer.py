"""Gazetteer build ETL — the Spark restatement of the reference's
migration pipeline (reference scripts/build_gazetteer.py:113-197 +
sql/migrations/001_pois.sql / 002_admin.sql / 003_views.sql;
SURVEY.md §3.2, §7 M2).

Input: a raw OSM-like DataFrame with a ``tags`` map column and
pre-reduced geometry (centroid lat/lon + bbox doubles — geometry is
eliminated at the ETL edge per SURVEY.md §1.2). Column presence of
``id``/``name`` is detected from ``df.schema`` (SURVEY.md §1.3), the
DataFrame-API analogue of the reference's PRAGMA-table_info placeholder
templating (build_gazetteer.py:25-61).

Output: ``pois`` / ``admin`` Parquet tables with precomputed normalized
name columns (the reference's build-time precompute, §4 O3) written
sorted so parquet min/max stats prune candidate scans (§4 O1 substitute
for its ART indexes, which leading-wildcard LIKE can't use anyway, §4 O8).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.functions.normalize import canon
from scout_spark.functions.scoring import importance_expr, kind_expr
from scout_spark.sources.binding import bind_geometry, bind_raw_source
from scout_spark.sources.writers import write_parquet_sorted

POI_VIEW_COLUMNS = [
    # exactly gaz.poi_view (reference sql/migrations/003_views.sql:3-7)
    "osm_id",
    "name_local",
    "name_en",
    "name_local_norm",
    "name_en_norm",
    "amenity",
    "shop",
    "tourism",
    "leisure",
    "office",
    "city",
    "state",
    "country",
    "lat",
    "lon",
    "kind",
    "importance",
]

_POI_CLASSES = ("amenity", "shop", "tourism", "leisure", "office")


def _name_local(name_col, tags) -> F.Column:
    """gaz.name_local macro (reference sql/migrations/000_init.sql:14-19):
    prefer the raw name column when non-empty, else tags['name']."""
    t_name = tags.getItem("name")
    return (
        F.when((name_col.isNotNull()) & (name_col != ""), name_col)
        .when((t_name.isNotNull()) & (t_name != ""), t_name)
        .otherwise(F.lit(None))
    )


def _name_en(tags) -> F.Column:
    """gaz.name_en macro (reference 000_init.sql:21): NULLIF(tags['name:en'], '')."""
    return F.nullif(tags.getItem("name:en"), F.lit(""))


def build_pois(raw: DataFrame) -> DataFrame:
    """gaz.pois (reference sql/migrations/001_pois.sql): named POIs with
    normalized names, tag attributes, centroid, kind, importance."""
    binding = bind_raw_source(raw)
    geom = bind_geometry(raw)
    tags = F.col("tags")
    src = raw.select(
        binding.id_col.alias("osm_id"),
        _name_local(binding.name_col, tags).alias("name_local"),
        _name_en(tags).alias("name_en"),
        tags.alias("tags"),
        geom.lat_col.alias("lat"),
        geom.lon_col.alias("lon"),
    ).where(
        _name_local(binding.name_col, tags).isNotNull() | _name_en(tags).isNotNull()
    )
    has_poi_class = None
    for cls in _POI_CLASSES:
        cond = F.col("tags").getItem(cls).isNotNull()
        has_poi_class = cond if has_poi_class is None else (has_poi_class | cond)
    return (
        src.where(has_poi_class)
        .select(
            "osm_id",
            "name_local",
            "name_en",
            canon(F.col("name_local")).alias("name_local_norm"),
            canon(F.col("name_en")).alias("name_en_norm"),
            *[
                F.coalesce(F.col("tags").getItem(c), F.lit("")).alias(c)
                for c in _POI_CLASSES
            ],
            F.nullif(F.col("tags").getItem("addr:city"), F.lit("")).alias("city"),
            F.nullif(F.col("tags").getItem("addr:state"), F.lit("")).alias("state"),
            F.nullif(F.col("tags").getItem("addr:country"), F.lit("")).alias(
                "country"
            ),
            "lat",
            "lon",
            kind_expr(F.col("tags")).alias("kind"),
            importance_expr(F.col("tags")).alias("importance"),
        )
        # canon('') is '' not NULL; reference canon(NULL) also yields ''
        # via COALESCE(s,'') — but empty-name rows were filtered above, so
        # normalize '' back to NULL for names that were NULL.
        .withColumn(
            "name_local_norm",
            F.when(F.col("name_local").isNotNull(), F.col("name_local_norm")),
        )
        .withColumn(
            "name_en_norm",
            F.when(F.col("name_en").isNotNull(), F.col("name_en_norm")),
        )
    )


def build_admin(raw: DataFrame) -> DataFrame:
    """gaz.admin (reference sql/migrations/002_admin.sql): administrative
    boundaries with bbox + centroid, lenient admin_level parse."""
    binding = bind_raw_source(raw)
    tags = F.col("tags")
    nl = _name_local(binding.name_col, tags)
    ne = _name_en(tags)
    return (
        raw.where(
            (F.coalesce(tags.getItem("boundary"), F.lit("")) == "administrative")
            & (nl.isNotNull() | ne.isNotNull())
        )
        .select(
            binding.id_col.alias("osm_id"),
            nl.alias("name_local"),
            ne.alias("name_en"),
            F.when(nl.isNotNull(), canon(nl)).alias("name_local_norm"),
            F.when(ne.isNotNull(), canon(ne)).alias("name_en_norm"),
            F.nullif(tags.getItem("admin_level"), F.lit(""))
            .try_cast("int")
            .alias("admin_level"),
            F.nullif(tags.getItem("admin_level"), F.lit("")).alias(
                "admin_level_raw"
            ),
            F.coalesce(tags.getItem("ISO3166-1"), F.lit("")).alias("iso1"),
            F.coalesce(tags.getItem("ISO3166-2"), F.lit("")).alias("iso2"),
            F.col("minx").cast("double"),
            F.col("miny").cast("double"),
            F.col("maxx").cast("double"),
            F.col("maxy").cast("double"),
            F.col("lat").cast("double").alias("center_lat"),
            F.col("lon").cast("double").alias("center_lon"),
        )
    )


def build_gazetteer(
    spark: SparkSession,
    raw: DataFrame,
    out_dir: str,
    overwrite: bool = True,
    meta: dict | None = None,
) -> dict[str, str]:
    """Ordered ETL run (reference build_gazetteer.py:57-72 migration
    runner): pois → admin → meta, each an atomic parquet overwrite.
    Returns table→path. Idempotency gate mirrors build_gazetteer.py:151-156.
    """
    paths = {t: os.path.join(out_dir, t) for t in ("pois", "admin")}
    if not overwrite and os.path.exists(paths["pois"]):
        return paths
    pois = build_pois(raw)
    # sorted by normalized name: parquet row-group min/max stats then prune
    # equality/prefix scans (SURVEY.md §4 O1; full-containment LIKE still
    # scans, §4 O8 — same as the reference's ART indexes).
    write_parquet_sorted(pois, paths["pois"], sort_cols=["name_local_norm"])
    admin = build_admin(raw)
    write_parquet_sorted(admin, paths["admin"], sort_cols=["name_local_norm"])
    # provenance meta (reference build_gazetteer.py:75-110)
    meta_payload = {
        "built_at_unix": int(time.time()),
        "spark_version": spark.version,
        **(meta or {}),
    }
    meta_path = os.path.join(out_dir, "_meta.json")
    with open(meta_path, "w") as fh:
        json.dump(meta_payload, fh)
    paths["_meta"] = meta_path
    return paths


def poi_view(spark: SparkSession, pois_path: str) -> DataFrame:
    """gaz.poi_view (reference 003_views.sql): serving projection."""
    return spark.read.parquet(pois_path).select(*POI_VIEW_COLUMNS)
