"""Text-pipeline inventory: the flagship filter-then-verify fuzzy search
(the reference's architectural signature, SURVEY.md §3.1) re-expressed over
the `documents` table, plus the training-data text ops (token stats,
quality, language-ID, fingerprint/dedup, n-gram Jaccard near-dup).

All oracle rows use only constructs with verified Spark↔DuckDB parity:
levenshtein, md5, distinct-token intersection sizes, ASCII canon regexes.
"""

from __future__ import annotations

from functools import reduce
from operator import and_

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.functions.normalize import canon_ascii
from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th

FLAGSHIP_QUERY = "spark table merge fast"
FLAGSHIP_TOKENS = ("spark", "table", "merge", "fast")

# DuckDB rendering of canon_ascii (scout's gaz.canon, 000_init.sql:5-11,
# pinned to ASCII so RE2 and Java regex agree bit-for-bit).
def _canon_sql(col: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace(lower(coalesce({col}, '')),"
        " '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
    )


def _tokens_sql(col: str) -> str:
    return f"list_filter(string_split({_canon_sql(col)}, ' '), x -> x <> '')"


def _canon_col(c) -> F.Column:
    return canon_ascii(c)


def _tokens_col(c) -> F.Column:
    # one codegen regex pass == canon_ascii + split + drop-empties
    # (maximal [a-z0-9] runs); the HOF-filter form ran interpreted and
    # cost 29× on token-heavy plans (12M-token explode: 5.0s -> 0.17s)
    return F.regexp_extract_all(
        F.lower(F.coalesce(c, F.lit(""))), F.lit("[a-z0-9]+"), 0
    )


# ---------------------------------------------------------------- flagship
@register(
    "flagship_fuzzy_search",
    "The reference's two-phase filter-then-verify similarity search "
    "(reference repo.py:48-71 + ranking.py:31-114; SURVEY.md §3.1) on the "
    "documents table: cheap AND-of-token containment prune (codegen'd, "
    "pushed to the scan), then an expensive verify scorer (levenshtein "
    "similarity + distinct-token Jaccard + importance proxy), then "
    "distributed top-k (TakeOrderedAndProject). Weights mirror "
    "config.toml:12-17 (sim .60 / importance .15).",
    oracle=f"""
      WITH cand AS (
        SELECT doc_id, lang, n_chars,
               {_canon_sql("substr(text, 1, 80)")} AS head,
               list_distinct({_tokens_sql("text")}) AS toks
        FROM documents
        WHERE text LIKE '%spark%' AND text LIKE '%table%'
          AND text LIKE '%merge%' AND text LIKE '%fast%'
      ), scored AS (
        SELECT doc_id, lang,
          round(
            0.60 * (
              0.5 * (1.0 - levenshtein(head, '{FLAGSHIP_QUERY}')::DOUBLE
                           / greatest(length(head), {len(FLAGSHIP_QUERY)}))
              + 0.5 * (len(list_intersect(toks, ['spark','table','merge','fast']))::DOUBLE
                       / (len(toks) + 4 - len(list_intersect(toks, ['spark','table','merge','fast']))))
            )
            + 0.15 * least(1.0, n_chars / 500.0), 6) AS score
        FROM cand
      )
      SELECT doc_id, lang, score FROM scored
      ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def flagship_fuzzy_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _th(spark, sf_dir, "documents")
    pred = reduce(and_, [F.col("text").contains(t) for t in FLAGSHIP_TOKENS])
    qlen = len(FLAGSHIP_QUERY)
    qtoks = F.array(*[F.lit(t) for t in FLAGSHIP_TOKENS])
    head = _canon_col(F.substring("text", 1, 80))
    toks = F.array_distinct(_tokens_col(F.col("text")))
    isect = F.size(F.array_intersect(toks, qtoks))
    sim_lev = F.lit(1.0) - F.levenshtein(head, F.lit(FLAGSHIP_QUERY)).cast(
        "double"
    ) / F.greatest(F.length(head), F.lit(qlen))
    jac = isect.cast("double") / (F.size(toks) + 4 - isect)
    importance = F.least(F.lit(1.0), F.col("n_chars") / 500.0)
    score = F.round(
        0.60 * (0.5 * sim_lev + 0.5 * jac) + 0.15 * importance, 6
    ).alias("score")
    return (
        d.where(pred)
        .select("doc_id", "lang", score)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


@register(
    "fuzzy_wratio_pandas_udf",
    "The reference's actual fuzzy kernel (rapidfuzz fuzz.WRatio, "
    "reference ranking.py:73-76; SURVEY.md §2.9 X3) as an Arrow-batched "
    "pandas UDF over the filter-then-verify candidate set. Rows-only: "
    "WRatio is a composite heuristic with no SQL equivalent — the "
    "oracle-expressible proxy is flagship_fuzzy_search; structural "
    "properties of this scorer are pinned in tests/test_fuzzy.py.",
    tags=("rows-only",),
)
def fuzzy_wratio_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.fuzzy import best_sim_udf

    d = _th(spark, sf_dir, "documents")
    pred = reduce(and_, [F.col("text").contains(t) for t in FLAGSHIP_TOKENS])
    sim = best_sim_udf([FLAGSHIP_QUERY])
    return (
        d.where(pred)
        .select(
            "doc_id",
            F.round(sim(_canon_col(F.substring("text", 1, 80))), 6).alias(
                "wratio_sim"
            ),
        )
        .orderBy(F.col("wratio_sim").desc(), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------- normalizer
@register(
    "text_canon_normalize",
    "The gaz.canon normalizer as a projection (reference "
    "sql/migrations/000_init.sql:5-11; SURVEY.md §2.8 F1) — ASCII-pinned "
    "so DuckDB RE2 and Java regex semantics coincide; token list + count "
    "derived from it (F3).",
    oracle=f"""
      SELECT doc_id,
             {_canon_sql("text")} AS text_norm,
             len({_tokens_sql("text")}) AS n_tokens
      FROM documents
      WHERE doc_id < 100
    """,
)
def text_canon_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        _canon_col(F.col("text")).alias("text_norm"),
        F.size(_tokens_col(F.col("text"))).cast("int").alias("n_tokens"),
    )


# ---------------------------------------------------------------- quality
@register(
    "text_quality_features",
    "Document quality scoring: length / punctuation / stopword / "
    "distinct-token heuristics (training-data pipeline extension; "
    "generalizes the reference's importance heuristic, 001_pois.sql:40-46).",
    oracle="""
      SELECT doc_id,
             length(text) AS n_chars_actual,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))
               AS n_tokens,
             round(len(list_distinct(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')))::DOUBLE
                   / nullif(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')), 0), 6)
               AS distinct_ratio,
             round((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))::DOUBLE
                   / nullif(length(text), 0), 6) AS punct_ratio,
             round(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                   x -> list_contains(['the','and','of','to','a','in','is','it','that','for'], x)))::DOUBLE
                   / nullif(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')), 0), 6)
               AS stopword_ratio
      FROM documents
    """,
)
def text_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _th(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
    lower_toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\S+"), 0)
    en_stop = F.array(
        *[F.lit(w) for w in ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")]
    )
    n_tokens = F.size(toks)
    punct_count = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), "[.,;:!?]", "")
    )
    # try_divide throughout: ANSI mode (Spark 4 default) aborts on x/0
    # even for doubles, while the DuckDB oracle's nullif(...,0) divisor
    # yields NULL — token-less or empty documents must not kill the job
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_actual"),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(
            F.try_divide(
                F.size(F.array_distinct(toks)).cast("double"), n_tokens
            ),
            6,
        ).alias("distinct_ratio"),
        F.round(
            F.try_divide(punct_count.cast("double"), F.length("text")), 6
        ).alias("punct_ratio"),
        F.round(
            F.try_divide(
                F.size(
                    F.filter(lower_toks, lambda t: F.array_contains(en_stop, t))
                ).cast("double"),
                n_tokens,
            ),
            6,
        ).alias("stopword_ratio"),
    )


# ---------------------------------------------------------------- language ID
_LANG_SW_SQL = {
    "en": "['the','and','of','to','a','in','is','it','that','for']",
    "es": "['el','la','de','que','y','en','un','una','los','por']",
    "de": "['der','die','das','und','ist','ein','eine','mit','von','zu']",
    "fr": "['le','la','les','de','et','est','un','une','dans','pour']",
    "zh": "['的','是','不','了','在','人','有','我','他','这']",
}


@register(
    "text_langid_heuristic",
    "Stopword-voting language identification (training-data pipeline "
    "extension): per-language stopword occurrence counts, argmax with "
    "fixed precedence, 'und' when no stopwords hit. Pure Column "
    "expressions — codegen'd, no UDF.",
    oracle=f"""
      WITH t AS (
        SELECT doc_id, lang,
               list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
        FROM documents
      ), s AS (
        SELECT doc_id, lang,
               len(list_filter(toks, x -> list_contains({_LANG_SW_SQL['en']}, x))) AS s_en,
               len(list_filter(toks, x -> list_contains({_LANG_SW_SQL['es']}, x))) AS s_es,
               len(list_filter(toks, x -> list_contains({_LANG_SW_SQL['de']}, x))) AS s_de,
               len(list_filter(toks, x -> list_contains({_LANG_SW_SQL['fr']}, x))) AS s_fr,
               len(list_filter(toks, x -> list_contains({_LANG_SW_SQL['zh']}, x))) AS s_zh
        FROM t
      )
      SELECT doc_id, lang AS lang_label,
             CASE WHEN greatest(s_en,s_es,s_de,s_fr,s_zh) <= 0 THEN 'und'
                  WHEN s_en = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'en'
                  WHEN s_es = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'es'
                  WHEN s_de = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'de'
                  WHEN s_fr = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'fr'
                  ELSE 'zh' END AS lang_guess
      FROM s
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.functions.text import langid_expr

    d = _th(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        langid_expr("text").alias("lang_guess"),
    )


# ---------------------------------------------------------------- fingerprint + exact dedup
@register(
    "dedup_exact_fingerprint",
    "Exact deduplication by canonical fingerprint (training-data pipeline "
    "extension; hash-groupBy with map-side partial agg): md5 of the first "
    "two canonical tokens as the collision key, keep the min doc_id per "
    "group, report group sizes. At 100 TB this is the standard "
    "shuffle-on-hash dedup — the key is computed in the scan stage.",
    oracle=f"""
      WITH k AS (
        SELECT doc_id,
               md5(array_to_string(list_slice({_tokens_sql("text")}, 1, 2), ' ')) AS fp
        FROM documents
      )
      SELECT fp, min(doc_id) AS keeper_doc_id, count(*) AS group_size
      FROM k GROUP BY fp HAVING count(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    fp = F.md5(F.array_join(F.slice(_tokens_col(F.col("text")), 1, 2), " ")).alias(
        "fp"
    )
    return (
        d.select("doc_id", fp)
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .where(F.col("group_size") > 1)
    )


# ---------------------------------------------------------------- n-gram Jaccard near-dup
@register(
    "dedup_ngram_jaccard_pairs",
    "Near-duplicate pair detection by distinct-token Jaccard ≥ 0.8 with "
    "blocking on (lang, length bucket) — the filter-then-verify core "
    "(SURVEY.md §4 O7) at n×m scale: the block equi-join is the cheap "
    "prune (shuffle on block key), the Jaccard verify runs only within "
    "blocks. The MinHash-LSH variant (rows-only row) replaces the length "
    "bucket with band buckets at 100 TB.",
    oracle=f"""
      WITH d AS (
        SELECT doc_id, lang, n_chars // 50 AS bkt,
               list_distinct({_tokens_sql("text")}) AS toks
        FROM documents
      )
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             round(len(list_intersect(a.toks, b.toks))::DOUBLE
                   / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 6)
               AS jaccard
      FROM d a JOIN d b
        ON a.lang = b.lang AND a.bkt = b.bkt AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
            / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.8
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _th(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 50).cast("long").alias("bkt"),
        F.array_distinct(_tokens_col(F.col("text"))).alias("toks"),
    )
    a = d.alias("a")
    b = d.alias("b")
    isect = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.col("a.toks")) + F.size(F.col("b.toks")) - isect
    # try_divide: two empty-token docs in one block give union 0 — ANSI
    # aborts on 0/0 while the oracle's NULL simply fails the >= filter
    jac = F.try_divide(isect.cast("double"), union)
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(jac >= 0.8)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
    )
