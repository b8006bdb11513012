"""Training-data prep operators named in the build brief that were not
yet first-class inventory rows: BPE-ish token counting, rolling-hash
document fingerprinting (winnowing), and the multimodal decode pipeline
surfaced as a driver-checkable entry.

Token/fingerprint queries are fully oracle-expressible: ASCII regex
classes behave identically in Java and DuckDB RE2, and gram hashes use
the md5-prefix trick shared with hash_parity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th
from scout_spark.inventory.hash_parity import _md5_32
from scout_spark.inventory.text_ops import _tokens_sql as _tokens_sql_cc

# GPT-2-style pretokenizer, ASCII-restricted so both regex dialects
# agree: contraction suffix | space?+letters | space?+digits |
# space?+other-punct-run. Applied to lowercased text.
_BPE_PATTERN = r"'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+"
_BPE_SQL = _BPE_PATTERN.replace("'", "''")  # SQL string-literal escaping

_GRAM_K = 8  # char-gram width for winnowing
_WIN_W = 4  # winnowing window (fingerprint = min gram hash per window)
_FP_DOCS = 50  # cap the fingerprint check (arrays grow with text length)


@register(
    "text_token_count_bpe",
    "Token counting two ways (build brief: 'whitespace + a BPE-ish "
    "regex'): whitespace tokens vs a GPT-2-style ASCII pretokenizer "
    "(contractions / letter runs / digit runs / punctuation runs), plus "
    "chars-per-BPE-token — the length statistic an LLM data pipeline "
    "budgets by. Pure-Column regexp_extract_all, codegen-able, "
    "identical RE2/Java semantics by construction (ASCII classes only).",
    oracle=f"""
      SELECT doc_id,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens_ws,
             len(regexp_extract_all(lower(text),
                 '{_BPE_SQL}')) AS n_tokens_bpe,
             round(CASE WHEN len(regexp_extract_all(lower(text),
                                 '{_BPE_SQL}')) = 0 THEN NULL
                        ELSE length(text)::DOUBLE /
                             len(regexp_extract_all(lower(text),
                                 '{_BPE_SQL}'))
                   END, 4) AS chars_per_token
      FROM documents
    """,
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _th(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    bpe = F.regexp_extract_all(lower, F.lit(_BPE_PATTERN), 0)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(lower, F.lit("[a-z0-9]+"), 0)).alias(
            "n_tokens_ws"
        ),
        F.size(bpe).alias("n_tokens_bpe"),
        F.round(
            F.try_divide(F.length("text").cast("double"), F.size(bpe)), 4
        ).alias("chars_per_token"),
    )


def _winnow_fingerprints(text: Column) -> Column:
    """Winnowing (Schleimer et al., SIGMOD'03): hash all ``_GRAM_K``-char
    grams of the canonicalized text, keep the min hash of each
    ``_WIN_W``-gram window, distinct+sort. Guarantees any shared
    substring of length ≥ _GRAM_K+_WIN_W-1 yields a shared fingerprint —
    the standard plagiarism/dup-detection structure, here as pure
    Column expressions reproduced verbatim in the DuckDB oracle."""
    t = F.array_join(
        F.regexp_extract_all(F.lower(text), F.lit("[a-z0-9]+"), 0), " "
    )
    n = F.length(t)
    grams = F.when(
        n >= _GRAM_K,
        F.transform(
            F.sequence(F.lit(1), n - _GRAM_K + 1),
            lambda i: _md5_32(t.substr(i, F.lit(_GRAM_K))),
        ),
    ).otherwise(F.array(_md5_32(t)))
    ng = F.size(grams)
    mins = F.when(
        ng >= _WIN_W,
        F.transform(
            F.sequence(F.lit(1), ng - _WIN_W + 1),
            lambda j: F.array_min(F.slice(grams, j, _WIN_W)),
        ),
    ).otherwise(F.array(F.array_min(grams)))
    return F.array_sort(F.array_distinct(mins))


@register(
    "text_fingerprint_winnowing",
    "Rolling-hash document fingerprinting (build brief row): winnowing "
    "— min md5-gram-hash per sliding window over canonicalized text, "
    "distinct fingerprint set per doc. The oracle reproduces gram "
    "hashing and window minima element-for-element in DuckDB SQL, so "
    "the value hash pins the whole kernel. First 50 docs by id (array "
    "payload grows with text length). Fingerprint set serialized as a "
    "comma-joined string — the driver's canonicalizer cannot hash "
    "list cells.",
    oracle=f"""
      SELECT doc_id,
             array_to_string(list_sort(list_distinct(
               CASE WHEN len(grams) >= {_WIN_W}
                    THEN list_transform(range(1, len(grams) - {_WIN_W} + 2), j ->
                           list_min(list_transform(range(0, {_WIN_W}), x ->
                             grams[j + x])))
                    ELSE [list_min(grams)] END)), ',') AS fingerprints,
             len(grams) AS n_grams
      FROM (
        SELECT doc_id,
               CASE WHEN length(t) >= {_GRAM_K}
                    THEN list_transform(range(1, length(t) - {_GRAM_K} + 2), i ->
                           ('0x' || substr(md5(substr(t, i, {_GRAM_K})), 1, 8))::BIGINT)
                    ELSE [('0x' || substr(md5(t), 1, 8))::BIGINT] END AS grams
        FROM (
          SELECT doc_id,
                 array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'),
                                 ' ') AS t
          FROM documents ORDER BY doc_id LIMIT {_FP_DOCS}) x
      ) g
      ORDER BY doc_id
    """,
)
def fingerprint_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Relational winnowing: explode gram positions and take window
    # minima with a ROWS frame instead of nesting the per-window
    # array_min lambda over the gram-array expression. The nested
    # formulation (_winnow_fingerprints — the ground truth of
    # tests/test_operators.py::test_winnowing_relational_matches_
    # nested_hof) hits projection-collapse expression duplication: `grams`
    # (an O(n) md5 map over a regex-derived string) is inlined into
    # EVERY window slice, going O(n^2) md5+regex per document —
    # measured 89 s at sf0.1 vs 0.4 s for this plan. The repartition
    # materializes the canonicalized string once per doc before the
    # per-gram explode references it.
    from pyspark.sql.window import Window

    d = _th(spark, sf_dir, "documents").orderBy("doc_id").limit(_FP_DOCS)
    t = F.array_join(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0), " "
    )
    base = d.select("doc_id", t.alias("t")).repartition(
        # cluster-derived barrier width, floored at 8 for the bench's
        # single-row-group scan (ADVICE r04)
        max(spark.sparkContext.defaultParallelism, 8),
        "doc_id",
    )
    g = base.select(
        "doc_id",
        "t",
        F.explode(
            F.expr(
                f"sequence(1, greatest(length(t) - {_GRAM_K} + 1, 1))"
            )
        ).alias("i"),
    ).select(
        "doc_id",
        "i",
        _md5_32(F.expr(f"substr(t, i, {_GRAM_K})")).alias("gh"),
    )
    wdoc = Window.partitionBy("doc_id")
    wmin = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(0, _WIN_W - 1)
    )
    fp = g.select(
        "doc_id",
        "i",
        F.count(F.lit(1)).over(wdoc).alias("ng"),
        F.min("gh").over(wmin).alias("fpv"),
    ).where(
        (F.col("i") <= F.col("ng") - _WIN_W + 1) | (F.col("i") == 1)
    )
    return (
        fp.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_set("fpv")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("fingerprints"),
            F.min("ng").alias("n_grams"),
        )
        .orderBy("doc_id")
    )


# Shared recursive-CTE body: documents -> blocked-Jaccard pairs ->
# symmetric edges -> transitive reach. Both CC-family oracles read
# this one string, so the pair predicate cannot diverge.
_CC_REACH_CTES = f"""d AS (
        SELECT doc_id, lang, n_chars // 50 AS bkt,
               list_distinct({_tokens_sql_cc("text")}) AS toks
        FROM documents
      ),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM d a JOIN d b
          ON a.lang = b.lang AND a.bkt = b.bkt AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
              / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
              >= 0.8
      ),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
      ),
      reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT re.id, e.dst FROM reach re JOIN edges e ON e.src = re.r
      )"""


@register(
    "dedup_groups_connected_components",
    "Transitive dedup groups with a HARD oracle: the driver-green "
    "blocked-Jaccard near-dup pairs closed under connectivity — Spark "
    "side via iterative min-label propagation (operators/dedup.py::"
    "connected_components, the scalable 100 TB formulation), oracle side "
    "via a DuckDB recursive-CTE transitive closure over the identical "
    "pair set. Output (id, component, keeper, is_duplicate) with "
    "component = min reachable id, so both formulations provably agree.",
    oracle=f"""
      WITH RECURSIVE {_CC_REACH_CTES}
      SELECT id, min(r) AS component, min(r) AS keeper,
             id <> min(r) AS is_duplicate
      FROM reach GROUP BY id
    """,
)
def dedup_groups_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cc_components(spark, sf_dir)


def cc_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, component, keeper, is_duplicate) — SHARED engine-side dup
    components over the driver-green blocked-Jaccard pair predicate.
    dedup_groups_connected_components and the r11 keeper-policy audit
    both read this helper (and their oracles share _CC_REACH_CTES), so
    the group semantics cannot diverge between entries (the r10
    keyframe-KPI shared-helper discipline)."""
    from scout_spark.inventory.text_ops import _tokens_col
    from scout_spark.operators.dedup import dedup_groups, jaccard_pairs

    d = _th(spark, sf_dir, "documents")
    pairs = jaccard_pairs(
        d,
        "doc_id",
        _tokens_col(F.col("text")),
        {"lang": F.col("lang"), "bkt": (F.col("n_chars") / 50).cast("long")},
        0.8,
    )
    return dedup_groups(pairs)


@register(
    "multimodal_decode_stats",
    "Multimodal pipeline surfaced to the driver: documents' text bytes "
    "packed as opaque binary blobs (the production path ingests real "
    "media bytes), decoded via the Arrow mapInPandas stage "
    "(operators/multimodal.py — deterministic fake codec, REAL batch "
    "iteration/schema/explode plumbing), then per-channel-count "
    "aggregate stats. Rows-only: sha-derived fake dimensions aren't "
    "oracle-expressible; ground truth pinned in tests/test_multimodal.py.",
    tags=("rows-only",),
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.multimodal import decode_media, pack_blobs

    d = _th(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"), "lang"
    )
    blobs = pack_blobs(d, "doc_id", "payload", kind="image", source_col="lang")
    decoded = decode_media(blobs)
    return (
        decoded.groupBy("channels")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.round(F.avg("width"), 4).alias("avg_width"),
            F.round(F.avg("height"), 4).alias("avg_height"),
            F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
        )
        .orderBy("channels")
    )


@register(
    "dedup_minhash_incremental_probe",
    "Incremental near-dup lookup: a prebuilt MinHash-LSH band index "
    "(operators/dedup.py::minhash_index_build — built once per corpus "
    "version, cached per sf_dir) probed with a deterministic synthetic "
    "batch (every 20th doc with its first token dropped — a near-copy "
    "that must hit, plus doc_id-salted novel text that must miss). "
    "Probe touches index parquet + batch only; corpus text is never "
    "re-read. Rows-only by design (banding/signature kernels are not "
    "SQL-expressible); ground truth pinned by "
    "tests/test_operators.py::test_minhash_index_probe_incremental.",
)
def dedup_minhash_incremental_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from scout_spark.operators.dedup import minhash_index_build, minhash_probe

    d = _th(spark, sf_dir, "documents")
    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    idx = os.path.join(tempfile.gettempdir(), f"scout_mh_index_{key}")
    if not os.path.exists(os.path.join(idx, "bands")):
        minhash_index_build(d, idx, id_col="doc_id", text_col="text")
    near = d.where(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        # drop the first token: a high-Jaccard near-copy
        F.regexp_replace("text", r"^\S+\s+", "").alias("text"),
    )
    novel = d.where(F.col("doc_id") % 20 == 7).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(
            F.lit("novel"), F.col("doc_id").cast("string"),
            F.lit(" isolated vocabulary payload"),
        ).alias("text"),
    )
    hits = minhash_probe(
        spark, idx, near.unionByName(novel), id_col="doc_id", text_col="text"
    )
    return hits.orderBy("batch_id", "corpus_id")
