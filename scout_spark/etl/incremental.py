"""Incremental gazetteer maintenance (scale extension; the reference can
only rebuild from scratch — a one-shot script with an overwrite gate,
reference scripts/build_gazetteer.py:151-156).

Upsert semantics: rows from the new batch replace existing rows with the
same osm_id (last-write-wins); unmatched existing rows survive. The
merge is an anti-join + union — the Parquet-only formulation of
DELETE+INSERT (the reference's meta upsert txn shape,
build_gazetteer.py:75-110). Atomicity without a table format: write to
a staging directory, then swap directories (rename is atomic per
filesystem); on Delta/Iceberg this whole module collapses to MERGE INTO.

At 100 TB: partition pois by a coarse key and rewrite ONLY partitions
the batch touches (dynamic partition overwrite) instead of the full
table — same anti-join+union per partition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from scout_spark.etl.gazetteer import build_pois
from scout_spark.sources.writers import write_parquet_sorted


def merge_upsert(
    existing: DataFrame, updates: DataFrame, key: str = "osm_id"
) -> DataFrame:
    """last-write-wins merge: existing rows not in updates + all updates.

    ``updates`` is deduplicated per key first — a batch carrying the same
    osm_id twice would otherwise land both rows and leave duplicate keys
    in pois. The winner is chosen deterministically (stable xxhash64 of
    the full row) so replays reproduce the same table.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(F.xxhash64(*updates.columns).asc())
    updates = (
        updates.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    survivors = existing.join(updates.select(key), key, "left_anti")
    return survivors.unionByName(updates)


def upsert_pois(
    spark: SparkSession, new_raw: DataFrame, gaz_dir: str
) -> tuple[int, int]:
    """Apply a raw-source batch to an existing gazetteer's pois table.
    Returns (rows_before, rows_after). Atomic via staging + dir swap."""
    from scout_spark.sources.binding import bind_raw_source

    if bind_raw_source(new_raw).has_synthetic_id:
        # synthetic row_number ids restart at 1 every batch — merging on
        # them would silently replace the first N unrelated existing rows
        raise ValueError(
            "incremental upsert requires a real id/osm_id column in the "
            "batch source; synthetic row_number ids are not stable keys"
        )
    pois_path = os.path.join(gaz_dir, "pois")
    from scout_spark.sources.maintenance import atomic_swap, recover_swap

    recover_swap(pois_path)  # heal a crash inside a previous swap
    updates = build_pois(new_raw)
    existing = spark.read.parquet(pois_path)
    before = existing.count()
    merged = merge_upsert(existing, updates)
    staging = pois_path + ".staging"
    write_parquet_sorted(merged, staging, sort_cols=["name_local_norm"])
    after = spark.read.parquet(staging).count()
    atomic_swap(pois_path, staging)
    return before, after


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key: str,
    update_cols: list[str] | None = None,
    delete_condition=None,
) -> DataFrame:
    """Full MERGE INTO semantics as a pure DataFrame transform —
    the Delta/Iceberg MERGE shape without a table format:

      WHEN MATCHED AND delete_condition THEN DELETE
      WHEN MATCHED THEN UPDATE SET update_cols (from source)
      WHEN NOT MATCHED THEN INSERT *

    Returns the post-merge table. One full-outer join on the key is the
    whole physical story — at 100 TB both sides hash-partition on the
    key (co-locatable by bucketing) and the merge is embarrassingly
    parallel per key group; no driver state.
    """
    from pyspark.sql import functions as F

    cols = target.columns
    update_cols = update_cols if update_cols is not None else [
        c for c in cols if c != key
    ]
    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    matched = F.col(f"t.{key}").isNotNull() & F.col(f"s.{key}").isNotNull()
    if delete_condition is not None:
        joined = joined.where(~(matched & delete_condition))
    out_cols = []
    for c in cols:
        if c == key:
            expr = F.coalesce(F.col(f"t.{key}"), F.col(f"s.{key}"))
        elif c in update_cols and c in source.columns:
            # matched → source value; unmatched-target → target value;
            # unmatched-source (insert) → source value
            expr = F.when(F.col(f"t.{key}").isNull(), F.col(f"s.{c}")).when(
                matched, F.col(f"s.{c}")
            ).otherwise(F.col(f"t.{c}"))
        else:
            expr = F.when(
                F.col(f"t.{key}").isNull(), F.col(f"s.{c}") if c in source.columns else F.lit(None)
            ).otherwise(F.col(f"t.{c}"))
        out_cols.append(expr.alias(c))
    return joined.select(*out_cols)
