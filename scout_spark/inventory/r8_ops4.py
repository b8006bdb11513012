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
from scout_spark.inventory.quality_ops import _TOK

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
        -- length(text) = strlen(text) is the checked ASCII
        -- precondition (ADVICE r08): the engine side hashes UTF-8
        -- BYTES while ascii(substr()) reads CODE POINTS — the two
        -- agree exactly on the docs this filter keeps, and non-ASCII
        -- docs are excluded IDENTICALLY on both sides instead of
        -- silently diverging
        SELECT source, doc_id, text,
               (length(text) // {_SB_FRAME})::INT AS n
        FROM documents WHERE length(text) >= {2 * _SB_FRAME}
          AND length(text) = strlen(text)
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

    # chars == bytes pins the ASCII precondition the oracle checks
    # with length(text) = strlen(text) — see the oracle comment
    d = (
        _th(spark, sf_dir, "documents")
        .where(F.length("text") == F.octet_length("text"))
        .select(
            "doc_id",
            F.encode(F.col("text"), "UTF-8").alias("payload"),
            "source",
        )
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


# --------------------------------------- padding waste by batching


_PW_BATCH = 32


@register(
    "audit_padding_waste_bucketed",
    "Padding-waste audit for batched training: tokens wasted padding "
    f"each {_PW_BATCH}-sequence batch to its longest member, under "
    "ARRIVAL-ORDER batching (doc_id) vs LENGTH-SORTED batching (the "
    "bucketed-batching trick every trainer ships) — the measured "
    "reduction is the entry's answer. Both orderings use the "
    "distributed rank toolkit (operators/rank.py: range shuffle + "
    "per-partition row_number + broadcast offsets — no single-"
    "partition WindowExec at any scale); per-batch max/sum aggregate "
    "map-side. All integers; ratios are single rounded divisions. The "
    "oracle uses plain global row_number windows — independent "
    "formulation, identical batch assignment.",
    oracle=f"""
      WITH d AS (
        SELECT doc_id,
               len(regexp_extract_all(lower(text), '{_TOK}')) AS nt
        FROM documents
      ),
      nb AS (
        SELECT nt, (row_number() OVER (ORDER BY doc_id) - 1)
                   // {_PW_BATCH} AS batch
        FROM d
      ),
      bb AS (
        SELECT nt, (row_number() OVER (ORDER BY nt, doc_id) - 1)
                   // {_PW_BATCH} AS batch
        FROM d
      ),
      wn AS (
        SELECT sum(mx * c - s)::BIGINT AS waste, count(*)::BIGINT AS nbatch
        FROM (SELECT batch, max(nt) AS mx, count(*) AS c, sum(nt) AS s
              FROM nb GROUP BY batch)
      ),
      wb AS (
        SELECT sum(mx * c - s)::BIGINT AS waste
        FROM (SELECT batch, max(nt) AS mx, count(*) AS c, sum(nt) AS s
              FROM bb GROUP BY batch)
      ),
      t AS (SELECT count(*)::BIGINT AS n_docs, sum(nt)::BIGINT AS tokens
            FROM d)
      SELECT t.n_docs, t.tokens AS tokens_total, wn.nbatch AS n_batches,
             wn.waste AS waste_arrival, wb.waste AS waste_bucketed,
             round(CASE WHEN wn.waste > 0
               THEN (wn.waste - wb.waste)::DOUBLE / wn.waste END, 6)
               AS waste_reduction,
             round(wn.waste::DOUBLE / (wn.waste + t.tokens), 6)
               AS pad_ratio_arrival,
             round(wb.waste::DOUBLE / (wb.waste + t.tokens), 6)
               AS pad_ratio_bucketed
      FROM t, wn, wb
    """,
)
def audit_padding_waste_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.operators.rank import global_row_number

    d = _th(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(_TOK), 0)
        ).alias("nt"),
    ).localCheckpoint(eager=True)
    # three consumers (two rank passes + the totals agg) would each
    # re-run the tokenize otherwise; eager checkpoint, not persist —
    # repeated fresh builds would leak persisted frames (FLOOR_r11
    # capture-session trap). The count is a bounded driver scalar
    # feeding global_row_number's measured small-frame gate
    # (FLOOR_r11: two range-shuffle rank passes on a |docs|-row frame
    # were ~8 job floors; no-op past 2M rows)
    n_docs_cnt = d.count()

    def _waste(order_cols: list) -> DataFrame:
        rn = global_row_number(
            d, order_cols, out="rn", known_count=n_docs_cnt
        )
        per = (
            rn.select(
                "nt",
                ((F.col("rn") - 1) / _PW_BATCH)
                .cast("long")
                .alias("batch"),
            )
            .groupBy("batch")
            .agg(
                F.max("nt").alias("mx"),
                F.count(F.lit(1)).alias("c"),
                F.sum("nt").alias("s"),
            )
        )
        return per.agg(
            F.sum(F.col("mx") * F.col("c") - F.col("s"))
            .cast("long")
            .alias("waste"),
            F.count(F.lit(1)).cast("long").alias("nbatch"),
        )

    wn = _waste(["doc_id"])
    wb = _waste(["nt", "doc_id"]).select(
        F.col("waste").alias("waste_b")
    )
    t = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("tokens_total"),
    )
    return (
        t.crossJoin(F.broadcast(wn))
        .crossJoin(F.broadcast(wb))
        .select(
            "n_docs",
            "tokens_total",
            F.col("nbatch").alias("n_batches"),
            F.col("waste").alias("waste_arrival"),
            F.col("waste_b").alias("waste_bucketed"),
            F.round(
                F.when(
                    F.col("waste") > 0,
                    (F.col("waste") - F.col("waste_b")).cast("double")
                    / F.col("waste"),
                ),
                6,
            ).alias("waste_reduction"),
            F.round(
                F.col("waste").cast("double")
                / (F.col("waste") + F.col("tokens_total")),
                6,
            ).alias("pad_ratio_arrival"),
            F.round(
                F.col("waste_b").cast("double")
                / (F.col("waste_b") + F.col("tokens_total")),
                6,
            ).alias("pad_ratio_bucketed"),
        )
    )


# ----------------------------------------- REAL-codec PNM decode


@register(
    "multimodal_decode_pnm_real",
    "Multimodal decode with a REAL injected codec — closes the 'the "
    "decode step is a stub' gap: deterministic binary P6 (Netpbm RGB) "
    "payloads are synthesized per document (header + text-derived "
    "sample plane, dimensions from doc_id arithmetic), and the Spark "
    "side PARSES them with the from-scratch binary-PNM decoder "
    "(operators/multimodal.py::decode_pnm — whitespace/comment-"
    "tolerant header scan + sample-plane length check) injected "
    "through the standard decode_media(decode_fn=...) seam. The "
    "oracle never parses: it independently PREDICTS what a correct "
    "decoder must return from the same construction arithmetic "
    "(width/height formulas, n_bytes = header length + w*h*3), so a "
    "wrong parse breaks the hash match. 100 TB: Arrow batches through "
    "one mapInPandas decode stage, per-source integer rollup — the "
    "decode_media plan shape with a real codec in the slot.",
    oracle="""
      WITH d AS (
        -- checked ASCII precondition (ADVICE r08): the engine builds
        -- the sample plane by CHARACTER repeat/substring then UTF-8
        -- encodes, so bytes == chars must hold for the predicted
        -- n_bytes to match the parse; non-ASCII docs are excluded
        -- identically on both sides
        SELECT source,
               4 + doc_id % 13 AS w,
               3 + (doc_id * 7) % 11 AS h
        FROM documents
        WHERE length(text) = strlen(text)
      )
      SELECT source,
             count(*)::BIGINT AS n_images,
             sum(w * h)::BIGINT AS total_pixels,
             max(w)::BIGINT AS max_width,
             max(h)::BIGINT AS max_height,
             sum(length('P6' || chr(10) || w || ' ' || h
                        || chr(10) || '255' || chr(10))
                 + w * h * 3)::BIGINT AS total_bytes,
             sum(CASE WHEN 3 = 3 THEN 1 ELSE 0 END)::BIGINT AS n_rgb
      FROM d GROUP BY source
      ORDER BY source
    """,
)
def multimodal_decode_pnm_real(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.operators.multimodal import decode_media, decode_pnm, pack_blobs

    # chars == bytes: the checked ASCII precondition (see oracle)
    d = _th(spark, sf_dir, "documents").where(
        F.length("text") == F.octet_length("text")
    )
    w = (4 + F.col("doc_id") % 13).cast("int")
    h = (3 + (F.col("doc_id") * 7) % 11).cast("int")
    # sample plane: the doc's (ASCII) text repeated out to w*h*3 bytes
    # — real bytes under the real header, so the parser exercises the
    # whole format; 'x' guard keeps repeat() defined on empty text
    body = F.expr(
        "substring(repeat(concat(text, 'x'), "
        "cast(ceil((wpx * hpx * 3) / (length(text) + 1)) as int) + 1), "
        "1, wpx * hpx * 3)"
    )
    payload = F.encode(
        F.concat(
            F.lit("P6\n"),
            F.col("wpx").cast("string"),
            F.lit(" "),
            F.col("hpx").cast("string"),
            F.lit("\n255\n"),
            body,
        ),
        "UTF-8",
    )
    blobs = pack_blobs(
        d.select(
            "doc_id", "text", "source", w.alias("wpx"), h.alias("hpx")
        ).withColumn("payload", payload),
        "doc_id",
        "payload",
        kind="image",
        source_col="source",
    )
    decoded = decode_media(blobs, decode_fn=decode_pnm)
    src = d.select(F.col("doc_id").alias("media_id"), "source")
    return (
        decoded.join(src, "media_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.sum(F.col("width") * F.col("height"))
            .cast("long")
            .alias("total_pixels"),
            F.max("width").cast("long").alias("max_width"),
            F.max("height").cast("long").alias("max_height"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.sum((F.col("channels") == 3).cast("long"))
            .cast("long")
            .alias("n_rgb"),
        )
        .orderBy("source")
    )
