"""Round-5 twelfth wave: rendezvous-hash shard routing, watermark
lateness profiling, and distinct-n corpus diversity.  All oracle-backed
(md5 kernel / integer-histogram order statistics / exact counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th


# --------------------------------------- rendezvous (HRW) sharding

_HRW_SHARDS = [f"shard-{i}" for i in range(8)]


def _hrw_values() -> str:
    return ", ".join(f"('{s}')" for s in _HRW_SHARDS)


@register(
    "shard_rendezvous_hashing",
    "Rendezvous (highest-random-weight) shard assignment — the "
    "stateless routing primitive behind consistent cache/shard "
    "placement (Thaler & Ravishankar 1998): each key goes to the "
    "shard with the highest md5(shard:key) weight, so adding or "
    "removing ONE shard remaps only that shard's keys (1/n of the "
    "keyspace, vs mod-n hashing's full reshuffle — the minimal-"
    "disruption pytest pins this). CROSS-ENGINE md5 kernel (60-bit "
    "hex prefix weights); the per-key argmax is a row-local greatest"
    "() over |shards| structs — no explode, no shuffle beyond the "
    "final |shards|-group count. Reports per-shard doc counts and "
    "keyspace share. 100 TB: assignment is embarrassingly parallel "
    "scan work; the agg moves |shards| rows per map task.",
    oracle=f"""
      WITH s(shard) AS (VALUES {_hrw_values()}),
      w AS (
        SELECT d.doc_id, s.shard,
               ('0x' || substr(md5(s.shard || ':' || d.doc_id::VARCHAR),
                               1, 15))::BIGINT AS wt
        FROM documents d, s
      ),
      pick AS (
        SELECT doc_id, shard,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY wt DESC, shard DESC) AS rn
        FROM w
      ),
      tot AS (SELECT count(*)::BIGINT AS n FROM documents)
      SELECT shard, count(*)::BIGINT AS n_docs,
             round(count(*)::DOUBLE / (SELECT n FROM tot), 6) AS share
      FROM pick WHERE rn = 1
      GROUP BY shard
      ORDER BY shard
    """,
)
def shard_rendezvous_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.rendezvous import hrw_shard

    d = _t(spark, sf_dir, "documents")
    assigned = d.select(
        hrw_shard(F.col("doc_id").cast("string"), _HRW_SHARDS).alias("shard")
    )
    tot = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        assigned.groupBy("shard")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "n_docs",
            F.round(F.col("n_docs").cast("double") / F.col("n"), 6).alias(
                "share"
            ),
        )
        .orderBy("shard")
    )


# ------------------------------- watermark lateness (out-of-orderness)


@register(
    "events_watermark_lateness_profile",
    "Out-of-orderness profile for WATERMARK SIZING — the number a "
    "Structured Streaming job needs before choosing withWatermark(): "
    "treating event_id as arrival order, lateness = (running max "
    "event-time per user) - event-time; report the in-order fraction "
    "and discrete p50/p95/p99/max lateness seconds. Percentiles come "
    "from an integer second-granularity HISTOGRAM + cumulative "
    "counts (the agg_weighted_percentile discipline) — the cum "
    "window runs over |distinct lateness seconds| rows (bounded by "
    "the time span, not event count), never a global sort of raw "
    "events; ranks are exact integer ceilings so both engines pick "
    "identical elements. 100 TB: one per-user window (parallel), one "
    "map-side-combinable histogram agg, then bounded-frame math.",
    oracle="""
      WITH lat AS (
        SELECT (max(epoch_us(ts)) OVER (PARTITION BY user_id
                                        ORDER BY event_id
                                        ROWS UNBOUNDED PRECEDING)
                - epoch_us(ts)) // 1000000 AS late_s
        FROM events
      ),
      h AS (SELECT late_s, count(*)::BIGINT AS c FROM lat GROUP BY late_s),
      cum AS (
        SELECT late_s, c,
               sum(c) OVER (ORDER BY late_s ROWS UNBOUNDED PRECEDING)
                 ::BIGINT AS cum,
               sum(c) OVER ()::BIGINT AS n
        FROM h
      )
      SELECT max(n)::BIGINT AS n_events,
             (max(n) - max(CASE WHEN late_s = 0 THEN c ELSE 0 END))::BIGINT
               AS n_late,
             round((max(n) - max(CASE WHEN late_s = 0 THEN c ELSE 0 END))
                   ::DOUBLE / max(n), 6) AS late_frac,
             min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN late_s END)
               ::BIGINT AS p50_late_s,
             min(CASE WHEN cum >= (n * 95 + 99) // 100 THEN late_s END)
               ::BIGINT AS p95_late_s,
             min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN late_s END)
               ::BIGINT AS p99_late_s,
             max(late_s)::BIGINT AS max_late_s
      FROM cum
    """,
)
def events_watermark_lateness_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    wu = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lat = ev.select(
        (
            (F.max(F.unix_micros("ts")).over(wu) - F.unix_micros("ts"))
        ).alias("late_us")
    ).selectExpr("late_us div 1000000 as late_s")
    h = lat.groupBy("late_s").agg(F.count(F.lit(1)).cast("long").alias("c"))
    # cumulative window over the lateness HISTOGRAM — |distinct
    # seconds| rows, bounded by the corpus time span, not event count
    wcum = Window.orderBy("late_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = h.select(
        "late_s",
        "c",
        F.sum("c").over(wcum).cast("long").alias("cum"),
        F.sum("c").over(wall).cast("long").alias("n"),
    )
    rank = lambda p: F.expr(f"(n * {p} + 99) div 100")  # noqa: E731
    n_inorder = F.max(F.when(F.col("late_s") == 0, F.col("c")).otherwise(0))
    return cum.agg(
        F.max("n").cast("long").alias("n_events"),
        (F.max("n") - n_inorder).cast("long").alias("n_late"),
        F.round(
            (F.max("n") - n_inorder).cast("double") / F.max("n"), 6
        ).alias("late_frac"),
        F.min(F.when(F.col("cum") >= rank(50), F.col("late_s")))
        .cast("long")
        .alias("p50_late_s"),
        F.min(F.when(F.col("cum") >= rank(95), F.col("late_s")))
        .cast("long")
        .alias("p95_late_s"),
        F.min(F.when(F.col("cum") >= rank(99), F.col("late_s")))
        .cast("long")
        .alias("p99_late_s"),
        F.max("late_s").cast("long").alias("max_late_s"),
    )


# ------------------------------------------ distinct-n diversity

_DIV_TOK = "[a-z0-9]+"


@register(
    "text_distinct_ngram_diversity",
    "Distinct-n diversity per source (Li et al. 2016's distinct-1/2/3 "
    "— the standard repetitiveness/diversity score for generated or "
    "scraped corpora; a collapsing source shows up as a falling "
    "distinct-2 long before eyeballing does): unique n-grams / total "
    "n-grams for n = 1, 2, 3. N-grams via arrays_zip of SHIFTED "
    "SLICES (never element_at(t, i+k) inside the lambda — the "
    "projection-collapse O(n^2) trap, CLAUDE.md); all three orders "
    "are tagged into ONE array so the corpus is tokenized and "
    "exploded exactly once. 100 TB: one (source, n, gram) shuffle "
    "with map-side partial distinct; output is 3 rows per source.",
    oracle=f"""
      WITH tk AS (
        SELECT source, regexp_extract_all(lower(text), '{_DIV_TOK}') AS t
        FROM documents
      ),
      grams AS (
        SELECT source, 1 AS n, unnest(t) AS g FROM tk
        UNION ALL
        SELECT source, 2 AS n,
               unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                                     i -> t[i] || ' ' || t[i+1])) AS g
        FROM tk
        UNION ALL
        SELECT source, 3 AS n,
               unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                     i -> t[i] || ' ' || t[i+1] || ' '
                                          || t[i+2])) AS g
        FROM tk
      )
      SELECT source, n, count(*)::BIGINT AS total_ngrams,
             count(DISTINCT g)::BIGINT AS distinct_ngrams,
             round(count(DISTINCT g)::DOUBLE / count(*), 6) AS distinct_ratio
      FROM grams
      GROUP BY source, n
      ORDER BY source, n
    """,
)
def text_distinct_ngram_diversity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _th(spark, sf_dir, "documents")
    base = d.select(
        "source",
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(_DIV_TOK), 0
        ).alias("t"),
    ).repartition(
        # barrier: t is referenced by the 1/2/3-gram builders below
        # (6 slice refs) — materialize the tokenization once per row
        # instead of letting CollapseProject re-run the regex per ref
        max(spark.sparkContext.defaultParallelism, 8)
    )
    tagged = (
        "concat("
        " transform(t, x -> struct(1 as n, x as g)),"
        " transform(arrays_zip("
        "   slice(t, 1, greatest(size(t) - 1, 0)),"
        "   slice(t, 2, greatest(size(t) - 1, 0))),"
        "  p -> struct(2 as n, concat_ws(' ', p['0'], p['1']) as g)),"
        " transform(arrays_zip("
        "   slice(t, 1, greatest(size(t) - 2, 0)),"
        "   slice(t, 2, greatest(size(t) - 2, 0)),"
        "   slice(t, 3, greatest(size(t) - 2, 0))),"
        "  p -> struct(3 as n, concat_ws(' ', p['0'], p['1'], p['2']) as g))"
        ")"
    )
    grams = base.select(
        "source", F.explode(F.expr(tagged)).alias("x")
    ).select("source", "x.n", "x.g")
    return (
        grams.groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_ngrams"),
            F.count_distinct("g").cast("long").alias("distinct_ngrams"),
        )
        .select(
            "source",
            "n",
            "total_ngrams",
            "distinct_ngrams",
            F.round(
                F.col("distinct_ngrams").cast("double")
                / F.col("total_ngrams"),
                6,
            ).alias("distinct_ratio"),
        )
        .orderBy("source", "n")
    )
