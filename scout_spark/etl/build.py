"""Gazetteer build CLI (reference scripts/build_gazetteer.py:113-197).

``python -m scout_spark.etl.build --raw <parquet-or-fixture> --out <dir>
[--config cfg.toml] [--overwrite/--no-overwrite]``

Mirrors the reference's entry: config resolution (env > toml > default),
idempotency gate (existing output + no overwrite → exit 0,
build_gazetteer.py:151-156), ordered transforms, provenance meta.
The QuackOSM subprocess step is replaced by reading pre-exported
parquet (SURVEY.md §3.2) or the deterministic fixture.
"""

from __future__ import annotations

import argparse
import os
import sys

from scout_spark.settings import load_settings


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Build the gazetteer tables")
    ap.add_argument(
        "--raw",
        default="fixture",
        help="path to raw OSM-like parquet, or 'fixture' for the synthetic source",
    )
    ap.add_argument("--out", default=None, help="output directory")
    ap.add_argument("--config", default=None, help="TOML config path")
    ap.add_argument("--overwrite", dest="overwrite", action="store_true", default=None)
    ap.add_argument("--no-overwrite", dest="overwrite", action="store_false")
    ap.add_argument("--fixture-rows", type=int, default=600)
    args = ap.parse_args(argv)

    settings = load_settings(args.config)
    out_dir = args.out or settings.data_dir
    overwrite = settings.overwrite if args.overwrite is None else args.overwrite

    # idempotency gate before touching Spark (reference
    # build_gazetteer.py:151-156)
    if not overwrite and os.path.exists(os.path.join(out_dir, "pois")):
        print(f"gazetteer exists at {out_dir} and overwrite disabled; nothing to do")
        return 0

    from scout_spark.etl.gazetteer import build_gazetteer
    from scout_spark.session import get_spark

    spark = get_spark("scout-spark-build")
    if args.raw == "fixture":
        from scout_spark.etl.fixtures import raw_osm_fixture

        raw = raw_osm_fixture(spark, n_pois=args.fixture_rows)
        source = f"fixture(n_pois={args.fixture_rows}, seed=42)"
    else:
        raw = spark.read.parquet(args.raw)
        source = args.raw
    paths = build_gazetteer(
        spark, raw, out_dir, overwrite=True, meta={"source": source}
    )
    for t, p in paths.items():
        print(f"built {t}: {p}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
