"""Training-data pipeline operators beyond dedup/ANN: benchmark
decontamination, dataset profiling, and vocabulary statistics — the
curation steps that run between raw ingest and training-set export.

Scale notes: decontamination broadcasts the (small) eval-set shingle
dictionary against the exploded corpus — the corpus side never
self-joins, and the explode happens after per-doc `array_distinct`, so
shuffle volume is bounded by distinct shingles, not text length.
Profiling is one pass per column family with map-side partial aggs;
vocabulary is explode → two-level agg (partial counts map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.functions.text import word_shingles_arrow
from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th
from scout_spark.inventory.text_ops import _canon_sql, _tokens_sql  # noqa: F401

# Word-shingle width for contamination detection (5-grams are the
# common n for benchmark-overlap checks).
_K = 5

# DuckDB twin of functions.text.word_shingles(canon, k=5): same
# empty/short-doc semantics (0 tokens → no shingles; <k tokens → one
# whole-text shingle).
_SHINGLES_SQL = f"""
  CASE WHEN len(t) = 0 THEN []
       WHEN len(t) < {_K} THEN [array_to_string(t, ' ')]
       ELSE [array_to_string(t[i:i+{_K - 1}], ' ')
             FOR i IN range(1, len(t) - {_K - 2})]
  END
"""


@register(
    "decontaminate_shingle_overlap",
    "Benchmark decontamination: corpus documents sharing ≥1 distinct "
    "5-word shingle with a held-out eval set (source='src0' stands in "
    "for the benchmark). Emits per-document shared-shingle count and "
    "contamination ratio. The eval shingle dictionary is broadcast; the "
    "corpus explodes distinct shingles only (no self-join).",
    oracle=f"""
      WITH sh AS (
        SELECT doc_id, source, list_distinct({_SHINGLES_SQL}) AS sh
        FROM (SELECT doc_id, source,
                     {_tokens_sql("text")} AS t
              FROM documents)
      ), es AS (
        SELECT DISTINCT unnest(sh) AS g FROM sh WHERE source = 'src0'
      ), cs AS (
        SELECT doc_id, unnest(sh) AS g, len(sh) AS total
        FROM sh WHERE source <> 'src0'
      )
      SELECT cs.doc_id, count(*) AS shared_shingles,
             round(count(*)::DOUBLE / any_value(cs.total), 6) AS contamination
      FROM cs JOIN es USING (g)
      GROUP BY cs.doc_id
    """,
)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _th(spark, sf_dir, "documents")
    # fresh per-entry UDF instance, fenced nondeterministic: the sh
    # column is referenced by BOTH F.size and F.explode on the corpus
    # branch, and a deterministic UDF gets inlined into each reference
    # — 2x the shingle kernel per branch, 4x total (r7 plan audit).
    # Source filters sit BELOW the kernel select, so no pushdown is
    # lost to the fence; each branch shingles only its own rows, once.
    shu = word_shingles_arrow(_K).asNondeterministic()
    ev = (
        d.where(F.col("source") == "src0")
        .select(F.explode(shu(F.col("text"))).alias("g"))
        .distinct()
    )
    cs = (
        d.where(F.col("source") != "src0")
        .select("doc_id", shu(F.col("text")).alias("sh"))
        .select(
            "doc_id",
            F.size("sh").alias("total"),
            F.explode("sh").alias("g"),
        )
    )
    return (
        # ev = distinct shingles of the EVAL set — eval-set-sized by
        # decontamination design (benchmarks are tiny vs the corpus),
        # so the broadcast is the 100 TB plan; only if the eval corpus
        # itself outgrew the budget would this flip to a shuffle join.
        cs.join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("shared_shingles"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.first("total"), 6
            ).alias("contamination"),
        )
    )


@register(
    "profile_dataset_columns",
    "Dataset profiling: per-column null count, distinct count, and "
    "min/max (as strings) over documents — the dataset-card stats pass. "
    "One aggregate job; each column's stats are map-side partials, "
    "unioned into the long (column, stat) shape.",
    oracle="""
      SELECT 'lang' AS col, count(*) - count(lang) AS n_nulls,
             count(DISTINCT lang) AS n_distinct,
             CAST(min(lang) AS VARCHAR) AS min_val,
             CAST(max(lang) AS VARCHAR) AS max_val
      FROM documents
      UNION ALL
      SELECT 'source', count(*) - count(source), count(DISTINCT source),
             CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
      FROM documents
      UNION ALL
      SELECT 'n_chars', count(*) - count(n_chars), count(DISTINCT n_chars),
             CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
      FROM documents
      UNION ALL
      SELECT 'doc_id', count(*) - count(doc_id), count(DISTINCT doc_id),
             CAST(min(doc_id) AS VARCHAR), CAST(max(doc_id) AS VARCHAR)
      FROM documents
    """,
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _th(spark, sf_dir, "documents")
    parts = []
    for c in ["lang", "source", "n_chars", "doc_id"]:
        parts.append(
            d.agg(
                F.lit(c).alias("col"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                F.min(c).cast("string").alias("min_val"),
                F.max(c).cast("string").alias("max_val"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@register(
    "text_vocabulary_topk",
    "Corpus vocabulary statistics: the 25 most frequent canonical "
    "tokens with document frequency and total count — explode → "
    "two-level aggregate (map-side partial counts), deterministic "
    "tie-break on the token.",
    oracle=f"""
      SELECT tok, count(*) AS total_count,
             count(DISTINCT doc_id) AS doc_freq
      FROM (SELECT doc_id, unnest({_tokens_sql("text")}) AS tok
            FROM documents)
      GROUP BY tok
      ORDER BY total_count DESC, tok
      LIMIT 25
    """,
)
def vocabulary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.inventory.text_ops import _tokens_col

    d = _th(spark, sf_dir, "documents").select(
        "doc_id", F.explode(_tokens_col(F.col("text"))).alias("tok")
    )
    return (
        d.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("total_count"),
            F.count_distinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("total_count").desc(), "tok")
        .limit(25)
    )
