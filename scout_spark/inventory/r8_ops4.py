"""Round-8 wave 4: video shot-boundary detection — the second
oracle-backed multimodal entry (after audio energy, which proved the
recipe: integer/dyadic-exact features on the REAL payload bytes make a
mapInPandas Arrow kernel reproducible in DuckDB SQL via ord()).

Prototype check (CLAUDE.md rule): at threshold 200 the detector fires
on 238 of 1,601 frame transitions at sf0.01 — discriminative, neither
vacuous nor saturated (T=100 -> 49%, T=500 -> 1 boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _th

_SB_FRAME = 64
_SB_THRESHOLD = 200


@register(
    "multimodal_shot_boundaries",
    "Video shot-boundary detection surfaced to the driver — per-frame "
    f"integer byte-sum signatures ({_SB_FRAME}-byte frames), a cut "
    f"wherever the adjacent-signature jump exceeds {_SB_THRESHOLD} "
    "(the histogram-difference detector video-curation pipelines use "
    "to pick representative frames), rolled up per source. Computed "
    "in a numpy Arrow mapInPandas kernel on the REAL payload bytes "
    "(operators/multimodal.py::shot_boundaries — production swaps in "
    "a real frame decode behind the same signature) and ORACLE-BACKED "
    "because every intermediate is an int64 (order-exact regardless "
    "of numpy summation) which DuckDB recomputes from ord() code "
    "points. Media with fewer than 2 frames are excluded identically. "
    "100 TB: Arrow batches in, one map-side-combinable per-source "
    "rollup out — the audio-energy plan shape.",
    oracle=f"""
      WITH b AS (
        SELECT source, doc_id, text,
               (length(text) // {_SB_FRAME})::INT AS n
        FROM documents WHERE length(text) >= {2 * _SB_FRAME}
      ),
      f AS (
        SELECT source, doc_id, n, unnest(range(0, n)) AS fi, text
        FROM b
      ),
      s AS (
        SELECT source, doc_id, n, fi,
               list_sum(list_transform(range(1, {_SB_FRAME} + 1),
                 i -> ascii(substr(text, (fi * {_SB_FRAME})::INT + i, 1))
               ))::BIGINT AS fs
        FROM f
      ),
      d AS (
        SELECT source, doc_id, n,
               abs(fs - lag(fs) OVER (
                 PARTITION BY doc_id ORDER BY fi)) AS jump
        FROM s
      ),
      per AS (
        SELECT source, doc_id, max(n) AS n_frames,
               (sum(CASE WHEN jump > {_SB_THRESHOLD} THEN 1 ELSE 0 END)
                + 1)::BIGINT AS shots,
               max(jump)::BIGINT AS max_jump
        FROM d GROUP BY source, doc_id
      )
      SELECT source, count(*)::BIGINT AS n_media,
             sum(n_frames)::BIGINT AS total_frames,
             sum(shots)::BIGINT AS total_shots,
             round(avg(shots), 6) AS avg_shots_per_media,
             max(max_jump)::BIGINT AS max_abs_jump
      FROM per GROUP BY source
      ORDER BY source
    """,
)
def multimodal_shot_boundaries(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.operators.multimodal import pack_blobs, shot_boundaries

    d = _th(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"), "source"
    )
    blobs = pack_blobs(
        d, "doc_id", "payload", kind="video", source_col="source"
    )
    feats = shot_boundaries(
        blobs, frame_bytes=_SB_FRAME, threshold=_SB_THRESHOLD
    ).where(F.col("n_frames") >= 2)
    src = d.select(F.col("doc_id").alias("media_id"), "source")
    return (
        feats.join(src, "media_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_media"),
            F.sum("n_frames").cast("long").alias("total_frames"),
            F.sum("shots").cast("long").alias("total_shots"),
            F.round(F.avg("shots"), 6).alias("avg_shots_per_media"),
            F.max("max_abs_jump").cast("long").alias("max_abs_jump"),
        )
        .orderBy("source")
    )
