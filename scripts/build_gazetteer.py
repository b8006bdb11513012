#!/usr/bin/env python3
"""Build the gazetteer from an OSM extract — the reference's CLI,
Spark-native (reference scripts/build_gazetteer.py: QuackOSM subprocess
→ DuckDB migrations; here: native PBF/parquet read → DataFrame ETL →
sorted parquet tables).

Usage:
  python scripts/build_gazetteer.py INPUT --out DIR [--overwrite]
      [--bbox MINLON,MINLAT,MAXLON,MAXLAT] [--require-tag KEY ...]

INPUT is either a ``.osm.pbf`` file (read via the native blob-parallel
reader) or a parquet/GeoParquet path (QuackOSM export or raw fixture —
schema-adaptive binding picks id/name/geometry columns).
"""

from __future__ import annotations

import argparse
import os
import sys

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", help=".osm.pbf file or parquet/GeoParquet path")
    p.add_argument("--out", required=True, help="output gazetteer directory")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument(
        "--bbox",
        help="minlon,minlat,maxlon,maxlat ingest filter "
        "(reference --geom-filter-bbox)",
    )
    p.add_argument(
        "--require-tag",
        action="append",
        default=[],
        metavar="KEY[=VALUE]",
        help="keep only features carrying this tag (repeatable; "
        "reference --osm-tags-filter-file)",
    )
    p.add_argument("--cpus", type=int, default=None)
    return p.parse_args(argv)


def build(args: argparse.Namespace) -> dict[str, str]:
    from pyspark.sql import functions as F

    from scout_spark.etl.gazetteer import build_gazetteer
    from scout_spark.session import get_spark

    spark = get_spark("build-gazetteer", cpus=args.cpus)
    if args.input.endswith(".pbf"):
        from scout_spark.sources.osmpbf import pbf_features

        raw = pbf_features(spark, args.input)
    else:
        raw = spark.read.parquet(args.input)

    # ingest filters run BEFORE the ETL so pruning happens at the scan
    # (reference applies them inside the QuackOSM invocation)
    if args.bbox:
        minlon, minlat, maxlon, maxlat = (float(x) for x in args.bbox.split(","))
        raw = raw.where(
            F.col("lon").between(minlon, maxlon)
            & F.col("lat").between(minlat, maxlat)
        )
    for spec in args.require_tag:
        key, _, value = spec.partition("=")
        tag = F.col("tags").getItem(key)
        raw = raw.where((tag == value) if value else tag.isNotNull())

    return build_gazetteer(spark, raw, args.out, overwrite=args.overwrite)


def main(argv: list[str] | None = None) -> None:
    paths = build(parse_args(argv))
    for table, path in paths.items():
        print(f"[build] {table}: {path}")


if __name__ == "__main__":
    main()
