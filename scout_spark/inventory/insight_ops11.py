"""Round-5 fourteenth wave: Haar wavelet decomposition, incremental
aggregate maintenance (the materialized-view twin), and the video
frame-sampling multimodal entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th


# --------------------------------------- Haar wavelet decomposition

_HAAR_N = 1024  # dyadic prefix of the daily series
_HAAR_LEVELS = 10  # log2(_HAAR_N)
_HAAR_TOPK = 12


@register(
    "timeseries_haar_decomposition",
    "Unnormalized HAAR WAVELET decomposition of the daily revenue "
    "series — multi-resolution change detection: detail coefficient "
    "d(level, block) = (sum of the block's left half) - (right half), "
    "so the top coefficients BY MAGNITUDE point at the biggest "
    f"regime shifts and the scale they happen at (top {_HAAR_TOPK} "
    "reported with the block's start day). All-INTEGER: the series "
    "is exact cents, the coefficients are sums/differences of cents, "
    "and every level/block/sign derives from bit arithmetic on the "
    "dense day index — nothing to drift cross-engine. Computed in "
    "ONE pass: each day explodes into its log2(n) (level, block, "
    "sign) contributions and a single map-side-combinable groupBy "
    "sums them — never a sequential pyramid of log2(n) passes. "
    f"100 TB: the explode is x{_HAAR_LEVELS} on the PRE-COLLAPSED "
    "daily frame (|days| rows), and the shuffle carries one partial "
    "per (level, block) per map task.",
    oracle=f"""
      WITH daily AS (
        SELECT epoch_us(o_orderdate) // 86400000000 AS day,
               sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
        FROM orders GROUP BY 1
      ),
      idx AS (
        SELECT day, cents,
               row_number() OVER (ORDER BY day) - 1 AS i
        FROM daily
      ),
      dy AS (SELECT * FROM idx WHERE i < {_HAAR_N}),
      contrib AS (
        SELECT l.l AS level, (dy.i >> l.l) AS block,
               (1 - 2 * ((dy.i >> (l.l - 1)) & 1)) * dy.cents AS signed,
               dy.day
        FROM dy, (SELECT unnest(range(1, {_HAAR_LEVELS} + 1)) AS l) l
      ),
      coef AS (
        SELECT level, block, sum(signed)::BIGINT AS coefficient,
               min(day)::BIGINT AS block_start_day
        FROM contrib GROUP BY level, block
      )
      SELECT level, block, coefficient, block_start_day
      FROM coef
      ORDER BY abs(coefficient) DESC, level, block
      LIMIT {_HAAR_TOPK}
    """,
)
def timeseries_haar_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    daily = o.selectExpr(
        "unix_micros(o_orderdate) div 86400000000 as day", "o_totalprice"
    ).groupBy("day").agg(
        F.expr("sum(cast(round(o_totalprice * 100) as bigint))").alias(
            "cents"
        )
    )
    # dense index over the pre-collapsed daily frame (|days| rows —
    # bounded by the calendar span, the KS/PSI window discipline)
    idx = daily.select(
        "day",
        "cents",
        (F.row_number().over(Window.orderBy("day")) - 1).alias("i"),
    ).where(F.col("i") < _HAAR_N)
    contrib = idx.select(
        "day",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lv).alias("level"),
                        F.shiftright(F.col("i"), lv).alias("block"),
                        (
                            (
                                1
                                - 2
                                * (
                                    F.shiftright(F.col("i"), lv - 1)
                                    .bitwiseAND(F.lit(1))
                                )
                            )
                            * F.col("cents")
                        ).alias("signed"),
                    )
                    for lv in range(1, _HAAR_LEVELS + 1)
                ]
            )
        ).alias("c"),
    ).select("day", "c.level", "c.block", "c.signed")
    coef = contrib.groupBy("level", "block").agg(
        F.sum("signed").cast("long").alias("coefficient"),
        F.min("day").cast("long").alias("block_start_day"),
    )
    return (
        coef.orderBy(
            F.abs(F.col("coefficient")).desc(), "level", "block"
        )
        .limit(_HAAR_TOPK)
        .select("level", "block", "coefficient", "block_start_day")
    )


# ------------------------------- incremental aggregate maintenance

_IVM_CUT = "1999-01-01"


@register(
    "incremental_agg_maintenance",
    "Incremental materialized-view maintenance — the foreachBatch / "
    "Delta-merge pattern every streaming rollup relies on: a BASE "
    "aggregate (orders before "
    f"{_IVM_CUT}) and a DELTA aggregate (orders after) each reduce to "
    "decomposable partials (count, integer cent sum), and the view "
    "refresh merges PARTIALS — it never touches base rows again; "
    "derived algebraic stats (avg) come from the merged partials, "
    "demonstrating why views must store sums+counts, not averages. "
    "The oracle is the full recompute the maintained view must equal "
    "row-for-row. 100 TB: refresh cost is O(delta) + O(|groups|), "
    "independent of base size — the entire point.",
    oracle=f"""
      SELECT o_orderpriority,
             count(*)::BIGINT AS n_orders,
             sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS total_cents,
             round((sum(round(o_totalprice * 100)::BIGINT)::DOUBLE / 100)
                   / count(*), 6) AS avg_price
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """,
)
def incremental_agg_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderdate",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
    )
    cut = F.lit(_IVM_CUT).cast("timestamp")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("c"),
        )

    base = partials(o.where(F.col("o_orderdate") < cut))
    delta = partials(o.where(F.col("o_orderdate") >= cut))
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(F.sum("n").alias("n"), F.sum("c").alias("c"))
    )
    return merged.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n_orders"),
        F.col("c").cast("long").alias("total_cents"),
        F.round(
            (F.col("c").cast("double") / 100) / F.col("n"), 6
        ).alias("avg_price"),
    ).orderBy("o_orderpriority")


# ----------------------------------------- video frame sampling


@register(
    "multimodal_frame_sample_rollup",
    "Video frame sampling surfaced to the driver: documents' bytes "
    "packed as opaque video-kind blobs with PER-MEDIA declared frame "
    "counts (1 + doc_id % 12 — doc_id % 20 is the source index on "
    "this corpus, so % 12 varies WITHIN sources), frame-sampled "
    "through the ROW-EXPANDING mapInPandas stage (operators/"
    "multimodal.py::sample_frames — deterministic fake frame decode, "
    "REAL Arrow batch iteration / explode-shape / schema plumbing), "
    "then a per-media rollup (frame count, distinct checksums, max "
    "index). Converted from rows-only in r11 (VERDICT r10 item 5) by "
    "the decode_pnm oracle-PREDICTS discipline: the kernel's frame "
    "indices are pure integer arithmetic over declared_frames "
    "(step = max(d div 4, 1); indices = range(0, min(d, 4*step), "
    "step)), which the oracle re-derives in SQL, and the per-media "
    "distinct-checksum count equals the frame count because sha256 "
    "is injective on the distinct (payload, frame_index) inputs — a "
    "collision would be a break of sha256 itself. The driver hash "
    "therefore checks the REAL kernel loop, not a fixture. Kernel "
    "ground truth also pinned in tests/test_multimodal.py. 100 TB: "
    "the expansion factor is the frame sample rate (bounded per "
    "blob), and the rollup combines map-side.",
    oracle="""
      WITH m AS (
        SELECT doc_id, 1 + doc_id % 12 AS d FROM documents
      ),
      f AS (
        SELECT doc_id,
               greatest(d // 4, 1) AS step,
               least(d, 4 * greatest(d // 4, 1)) AS lim
        FROM m
      ),
      per AS (
        SELECT doc_id,
               (lim + step - 1) // step AS nf,
               ((lim + step - 1) // step - 1) * step AS mfi
        FROM f
      )
      SELECT nf::BIGINT AS n_frames,
             mfi::BIGINT AS max_frame_index,
             count(*)::BIGINT AS n_media,
             sum(nf)::BIGINT AS total_distinct_frames
      FROM per
      GROUP BY 1, 2
      ORDER BY 1, 2
    """,
)
def multimodal_frame_sample_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.operators.multimodal import pack_blobs, sample_frames

    d = _th(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"), "lang"
    )
    blobs = pack_blobs(
        d, "doc_id", "payload", kind="video", source_col="lang"
    ).withColumn(
        "meta",
        F.struct(
            F.col("meta.source").alias("source"),
            (F.lit(1) + F.pmod(F.col("media_id"), F.lit(12)))
            .cast("int")
            .alias("declared_frames"),
        ),
    )
    frames = sample_frames(blobs, n_frames=4)
    per_media = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.count_distinct("frame_checksum").cast("long").alias(
            "n_distinct_frames"
        ),
        F.max("frame_index").cast("long").alias("max_frame_index"),
    )
    return (
        per_media.groupBy("n_frames", "max_frame_index")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_media"),
            F.sum("n_distinct_frames").cast("long").alias(
                "total_distinct_frames"
            ),
        )
        .orderBy("n_frames", "max_frame_index")
    )
