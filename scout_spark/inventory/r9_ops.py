"""Round-9 wave: cross-modal curation compositions (VERDICT r08 item 5).

Three entries composing proven kernels into the curation stages a
training-data team runs next:

- cross-video keyframe dedup: shot boundary detection (r8_ops4) x the
  WHT perceptual hash (r7_twins) x band blocking — the video half of
  the image-dedup story;
- URL/domain parse + blocklist curation: real ``parse_url`` + a
  public-suffix-style registrable-domain rule over deterministically
  synthesized URLs, blocklist applied via broadcast join — closes the
  "source column != real domains" gap in curation_source_mix_report;
- trigram Kneser-Ney: the lm_kneser_ney_bigram machinery generalized
  one order up, with the full continuation-count backoff chain.

Prototype measurements (run BEFORE building, CLAUDE.md rule, recorded
in PLANS.md round-9 notes): keyframe dedup at sf0.01 yields 724
keyframes -> 91 cross-doc band candidates -> 42 pairs at hamming<=3
over 24 media pairs, max band bucket 3 (non-vacuous, non-explosive);
trigram KN over 26,165 trigram tokens gives a discriminative top-20.

No reference analogue (``/root/reference`` is a 673-line DuckDB
geocoder); these are build-brief training-pipeline extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th
from scout_spark.inventory.quality_ops import _TOK
from scout_spark.inventory.r8_ops import _GRAM_SQL as _R8_GRAM_SQL

# ------------------------------------------ cross-video keyframe dedup

_KF_FRAME = 64
_KF_THRESHOLD = 200
_KF_BANDS = 4
_KF_HAM = 3


def _keyframe_ctes() -> str:
    """The WITH body (shot detection + per-keyframe WHT hash +
    band-blocked candidate pairs) shared by the pair-level oracle and
    the r10 per-source dup-rate KPI oracle, so the two cannot diverge.
    Recomputed from code points (the audio-energy/pHash ord()
    discipline; every intermediate is int64). Keyframes are frame 0
    plus every frame whose signature jump exceeds the threshold —
    identical to the mapInPandas kernel by construction. The checked
    ASCII precondition (length = strlen) excludes non-ASCII docs
    identically on both engines (byte == code point only then)."""
    return f"""b AS (
        SELECT doc_id, text, (length(text) // {_KF_FRAME})::INT AS n
        FROM documents
        WHERE length(text) >= {_KF_FRAME}
          AND length(text) = strlen(text)
      ),
      f AS (
        SELECT doc_id, n, unnest(range(0, n)) AS fi, text FROM b
      ),
      s AS (
        SELECT doc_id, fi,
               list_sum(list_transform(range(1, {_KF_FRAME} + 1),
                 i -> ascii(substr(text, (fi * {_KF_FRAME})::INT + i, 1))
               ))::BIGINT AS fs
        FROM f
      ),
      j AS (
        SELECT doc_id, fi,
               abs(fs - lag(fs) OVER (
                 PARTITION BY doc_id ORDER BY fi)) AS jump
        FROM s
      ),
      kf AS (
        SELECT doc_id, fi,
               (row_number() OVER (
                  PARTITION BY doc_id ORDER BY fi) - 1)::INT AS shot_id
        FROM j WHERE fi = 0 OR jump > {_KF_THRESHOLD}
      ),
      px AS (
        SELECT kf.doc_id, kf.shot_id, g.k AS k,
               ascii(substr(b.text,
                            (kf.fi * {_KF_FRAME})::INT + g.k + 1, 1)) AS p
        FROM kf JOIN b USING (doc_id)
        CROSS JOIN generate_series(0, 63) g(k)
      ),
      sgn AS (
        SELECT u.u, v.v, g.k,
               (1 - 2 * (bit_count((u.u & (g.k // 8))::BIGINT) % 2))
             * (1 - 2 * (bit_count((v.v & (g.k % 8))::BIGINT) % 2)) AS s
        FROM generate_series(0, 7) u(u),
             generate_series(0, 7) v(v),
             generate_series(0, 63) g(k)
      ),
      coef AS (
        SELECT px.doc_id, px.shot_id, sgn.u, sgn.v,
               sum(sgn.s * px.p)::BIGINT AS c
        FROM px JOIN sgn ON sgn.k = px.k
        GROUP BY px.doc_id, px.shot_id, sgn.u, sgn.v
      ),
      h AS (
        SELECT doc_id, shot_id,
               coalesce(sum(
                 CASE WHEN c > 0 AND u + v > 0
                      THEN (1::BIGINT << ((u * 8 + v) - 1))
                      ELSE 0 END), 0)::BIGINT AS ph
        FROM coef GROUP BY doc_id, shot_id
      ),
      bands AS (
        SELECT doc_id, shot_id, ph, g.i AS band,
               ((ph >> (16 * g.i)) & 65535) AS bv
        FROM h CROSS JOIN generate_series(0, {_KF_BANDS - 1}) g(i)
      ),
      cand AS (
        SELECT DISTINCT a.doc_id AS da, a.shot_id AS sa,
               b.doc_id AS db, b.shot_id AS sb,
               bit_count(xor(a.ph, b.ph))::BIGINT AS hamming
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.ph, b.ph)) <= {_KF_HAM}
      )"""


def _keyframe_oracle() -> str:
    return f"""
      WITH {_keyframe_ctes()}
      SELECT da AS media_a, db AS media_b,
             count(*)::BIGINT AS n_shared_keyframes,
             min(hamming)::BIGINT AS min_hamming
      FROM cand GROUP BY da, db
      ORDER BY media_a, media_b
    """


def keyframe_band_index(sigs: DataFrame) -> DataFrame:
    """(media_id, shot_id, ph) -> banded (media_id, shot_id, ph, band,
    bv) — the 4x16-bit band explode SHARED by the batch entry and the
    streaming ingest probe (streaming/keyframe.py), so the two paths
    cannot diverge."""
    return sigs.select(
        "media_id",
        "shot_id",
        "ph",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        (
                            F.shiftright(F.col("ph"), 16 * i)
                            .bitwiseAND(F.lit(65535))
                        ).alias("bv"),
                    )
                    for i in range(_KF_BANDS)
                ]
            )
        ).alias("x"),
    ).select("media_id", "shot_id", "ph", "x.band", "x.bv")


def keyframe_candidate_pairs(sigs: DataFrame) -> DataFrame:
    """Banded keyframe candidate pairs (da, sa, db, sb, hamming) at
    hamming <= {_KF_HAM} — the band-bucket equi-join SHARED by the
    pair-level dedup entry and the r10 per-source dup-rate KPI (and
    matching the `cand` CTE in _keyframe_ctes), so engine and oracle
    pair semantics live in exactly one place each."""
    banded = keyframe_band_index(sigs)
    a = banded.alias("a")
    b = banded.alias("b")
    ham = F.bit_count(
        F.col("a.ph").bitwiseXOR(F.col("b.ph"))
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .where(ham <= _KF_HAM)
        .select(
            F.col("a.media_id").alias("da"),
            F.col("a.shot_id").alias("sa"),
            F.col("b.media_id").alias("db"),
            F.col("b.shot_id").alias("sb"),
            ham.alias("hamming"),
        )
        .distinct()
    )



@register(
    "dedup_video_keyframe_phash",
    "Cross-video keyframe dedup — the composition a video-curation "
    "pipeline runs to find videos sharing near-identical shots: shot "
    "boundaries on the frame-signature stream (the r8 detector), the "
    "FIRST frame of each shot as its keyframe, a 63-bit WHT "
    "perceptual hash per keyframe (ONE batched numpy matmul per "
    f"Arrow batch), then the proven {_KF_BANDS}x16-bit band blocking "
    f"(pigeonhole-lossless for hamming <= {_KF_HAM}) and a bucket "
    "equi-join; media pairs aggregate shared-keyframe counts. All "
    "intermediates int64 => bit-for-bit oracle-reproducible from "
    "code points; checked ASCII precondition on both engines. "
    "Prototyped before building: 724 keyframes, 42 keyframe pairs "
    "over 24 media pairs at sf0.01, max band bucket 3. 100 TB: one "
    "map-side kernel pass; shuffles carry only (media, shot, ph); "
    "never all-pairs — candidates are band-bucket-bounded exactly "
    "like the image pHash entry.",
    oracle=_keyframe_oracle(),
)
def dedup_video_keyframe_phash(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.operators.multimodal import (
        pack_blobs,
        shot_keyframe_hashes,
    )

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
    # lazy localCheckpoint: the same CollapseProject fence the image
    # pHash entry needs — without it the Arrow kernel re-runs in the
    # band-explode Generate and on each join side (r07 plan audit)
    sigs = shot_keyframe_hashes(
        blobs, frame_bytes=_KF_FRAME, threshold=_KF_THRESHOLD
    ).localCheckpoint(eager=False)
    cand = keyframe_candidate_pairs(sigs)
    return (
        cand.groupBy(
            F.col("da").alias("media_a"), F.col("db").alias("media_b")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_keyframes"),
            F.min("hamming").cast("long").alias("min_hamming"),
        )
        .orderBy("media_a", "media_b")
    )


# ------------------------------------- URL/domain blocklist curation

# deterministic URL synthesis (the PNM-entry recipe: the parsing logic
# is the real production path, the payload is synthesized from existing
# columns because the corpus carries no URLs)
_URL_SUBS = ("www", "cdn", "m")
_URL_TLDS = ("com", "org", "net", "co.uk", "io")
# blocked registrable domains — the curation blocklist (spam/adult/SEO
# lists in production); chosen to hit several sources and both the
# 1-label and 2-label public-suffix branches
_URL_BLOCKLIST = ("src3.com", "src7.org", "src11.net", "src2.co.uk")


def _url_expr_sql() -> str:
    # tld index uses doc_id // 20, NOT doc_id % k: on this corpus
    # doc_id % 20 == the source index, so any doc_id % k with k | 20
    # is CONSTANT per source and the synthesis would collapse to one
    # tld per source (prototype-measured — the blocklist was vacuous
    # under the first % 5 draft). doc_id is non-negative, so DuckDB's
    # truncating // and Spark's `div` agree.
    # source is coalesced like lang (ADVICE r09): a NULL source would
    # otherwise NULL the whole Spark concat (reg_domain '' via
    # concat_ws over a NULL split) while DuckDB's || yields NULL — a
    # latent parity divergence if a regenerated corpus ever carries
    # NULL sources.
    return (
        "concat('https://', "
        "['www','cdn','m'][(doc_id % 3 + 1)::INT], '.', "
        "lower(coalesce(source, 'unksrc')), '.', "
        "['com','org','net','co.uk','io']"
        "[((doc_id // 20) % 5 + 1)::INT], "
        "'/d/', doc_id, '?ref=', coalesce(lang, 'xx'))"
    )


def url_flag_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, host, reg_domain, blocked) — URL synthesis, the REAL
    parse path (parse_url host extraction + public-suffix registrable-
    domain rule), and the broadcast blocklist flag. Pure-Column +
    stream-static broadcast join, so it runs identically on a batch
    frame and a streaming frame (shared-helper discipline: the batch
    entry and the streaming twin cannot diverge)."""
    d = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.element_at(
                F.array(*[F.lit(s) for s in _URL_SUBS]),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ),
            F.lit("."),
            # coalesce matches the oracle's _url_expr_sql (ADVICE r09
            # NULL-source pin; see the comment there)
            F.lower(F.coalesce(F.col("source"), F.lit("unksrc"))),
            F.lit("."),
            F.element_at(
                F.array(*[F.lit(t) for t in _URL_TLDS]),
                (F.expr("doc_id div 20") % 5 + 1).cast("int"),
            ),
            F.lit("/d/"),
            F.col("doc_id").cast("string"),
            F.lit("?ref="),
            F.coalesce(F.col("lang"), F.lit("xx")),
        ).alias("url"),
    )
    host = F.expr("parse_url(url, 'HOST')")
    # Registrable-domain rule as ONE anchored regexp over ONE host
    # reference: "(label).(2-label public suffix)" else
    # "(label).(label)" at end-of-string — the same public-suffix+1
    # rule as the previous split/slice form, which referenced the
    # host expression 6x (labels x4, size, endswith) and so
    # CollapseProject-inlined parse_url+split into every reference
    # (FLOOR_r11: the k-eval trap, parse_url edition). Now host is
    # referenced twice total (output column + this regexp).
    reg = F.regexp_extract(host, r"([^.]+\.co\.uk|[^.]+\.[^.]+)$", 1)
    parsed = d.select(
        F.col("doc_id"), host.alias("host"), reg.alias("reg_domain")
    )
    block = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(b,) for b in _URL_BLOCKLIST], "reg_domain string"
        ).withColumn("blocked_flag", F.lit(True))
    )
    return parsed.join(block, "reg_domain", "left").select(
        "doc_id",
        "host",
        "reg_domain",
        F.coalesce(F.col("blocked_flag"), F.lit(False)).alias("blocked"),
    )


def domain_block_counters(docs: DataFrame) -> DataFrame:
    """Per-(domain, blocked) doc counts — plain decomposable sums,
    MERGEABLE streaming state (complete-mode agg; each micro-batch
    adds in). The n_hosts distinct stays in the batch entry only —
    exact distinct is not mergeable counter state."""
    return url_flag_frame(docs).groupBy("reg_domain", "blocked").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


@register(
    "curation_url_domain_blocklist",
    "URL -> registrable-domain curation stage (VERDICT r08 item 5b): "
    "synthesize a deterministic URL per document (no URLs in the "
    "corpus — the PNM recipe: REAL parsing logic, synthesized "
    "payload), extract the host with Spark's parse_url, reduce it to "
    "the registrable domain with a public-suffix-style rule (2-label "
    "suffixes like co.uk keep 3 labels, else 2 — the rule every "
    "URL-dedup/blocklist pipeline needs), then apply a blocklist via "
    "BROADCAST anti-semantics (flag, not drop, so the report shows "
    "both sides of the funnel). The oracle never calls a URL parser: "
    "it predicts host and domain from the same construction "
    "arithmetic, so a parse_url or suffix-rule bug breaks the hash "
    "match. 100 TB: parse/suffix logic is pure-Column (codegen), the "
    "blocklist is a broadcast dim; one shuffle for the per-domain "
    "rollup.",
    oracle=f"""
      WITH d AS (
        SELECT doc_id, source, {_url_expr_sql()} AS url
        FROM documents
      ),
      parsed AS (
        SELECT doc_id,
               lower(coalesce(source, 'unksrc')) || '.' ||
                 ['com','org','net','co.uk','io']
                 [((doc_id // 20) % 5 + 1)::INT] AS reg_domain,
               ['www','cdn','m'][(doc_id % 3 + 1)::INT] || '.' ||
                 lower(coalesce(source, 'unksrc')) || '.' ||
                 ['com','org','net','co.uk','io']
                 [((doc_id // 20) % 5 + 1)::INT] AS host
        FROM d
      )
      SELECT reg_domain,
             (reg_domain IN {tuple(_URL_BLOCKLIST)}) AS blocked,
             count(*)::BIGINT AS n_docs,
             count(DISTINCT host)::BIGINT AS n_hosts
      FROM parsed
      GROUP BY reg_domain
      ORDER BY reg_domain
    """,
)
def curation_url_domain_blocklist(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    flagged = url_flag_frame(_t(spark, sf_dir, "documents"))
    return (
        flagged.groupBy("reg_domain", "blocked")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("host").cast("long").alias("n_hosts"),
        )
        .orderBy("reg_domain")
    )


# --------------------------------------------- trigram Kneser-Ney LM


@register(
    "lm_kneser_ney_trigram",
    "Interpolated trigram Kneser-Ney (Chen & Goodman 1999 recursion, "
    "one order above lm_kneser_ney_bigram): P(w3|w1w2) backs off into "
    "the CONTINUATION bigram distribution, whose counts come from the "
    "trigram TYPE table (N1+(.w2w3) distinct-predecessor counts, "
    "N1+(.w2.) middle-type totals, bigram-type unigram continuation) "
    "— the full backoff chain, not a renormalized shortcut. All "
    "counts are exact integers from ONE trigram aggregate plus "
    "windows over the vocab^3-bounded type frame and a join to the "
    "vocab^2-bounded bigram-type frame (31-word vocab here; at 100 TB "
    "both frames are vocabulary-bounded, never corpus-sized). The "
    "probability is the IDENTICAL parenthesized expression over "
    "identical integers on both engines — deterministic IEEE ops. "
    "Deterministic LIMIT tie-break. Prototyped in DuckDB before "
    "building (26,165 trigram tokens, discriminative top-20).",
    oracle=f"""
      WITH t AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '{_TOK}') AS toks
        FROM documents
      ),
      tg0 AS (
        SELECT toks[ue.i] AS w1, toks[ue.i + 1] AS w2,
               toks[ue.i + 2] AS w3
        FROM t, LATERAL unnest(
          range(1, greatest(len(toks) - 1, 1)::BIGINT)) ue(i)
      ),
      tg AS (
        SELECT w1, w2, w3, count(*)::BIGINT AS c123
        FROM tg0 GROUP BY w1, w2, w3
      ),
      bt AS (
        SELECT w2, w3, count(*)::BIGINT AS n_prec
        FROM tg GROUP BY w2, w3
      ),
      bts AS (
        SELECT w2, w3, n_prec,
               sum(n_prec) OVER (PARTITION BY w2)::BIGINT AS nmid_2,
               count(*) OVER (PARTITION BY w2)::BIGINT AS n23_types,
               count(*) OVER (PARTITION BY w3)::BIGINT AS nprec_3,
               count(*) OVER ()::BIGINT AS ntot
        FROM bt
      ),
      st AS (
        SELECT w1, w2, w3, c123,
               sum(c123) OVER (PARTITION BY w1, w2)::BIGINT AS c12,
               count(*) OVER (PARTITION BY w1, w2)::BIGINT AS n3_foll
        FROM tg
      )
      SELECT st.w1, st.w2, st.w3, st.c123,
             round(greatest(st.c123 - 0.75, 0) / st.c12
                   + ((0.75 * st.n3_foll) / st.c12)
                     * (greatest(b.n_prec - 0.75, 0) / b.nmid_2
                        + ((0.75 * b.n23_types) / b.nmid_2)
                          * (b.nprec_3::DOUBLE / b.ntot)), 6) AS p_kn3
      FROM st JOIN bts b ON st.w2 = b.w2 AND st.w3 = b.w3
      ORDER BY p_kn3 DESC, st.w1, st.w2, st.w3
      LIMIT 20
    """,
)
def lm_kneser_ney_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _th(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(_TOK), 0
            ).alias("t"),
        )
        .repartition(max(spark.sparkContext.defaultParallelism, 8))
    )
    # arrays_zip of three shifted slices — O(1) references to the
    # derived token array (the CollapseProject discipline)
    tg0 = d.select(
        F.explode(
            F.expr(
                "arrays_zip("
                "slice(t, 1, greatest(size(t) - 2, 0)), "
                "slice(t, 2, greatest(size(t) - 2, 0)), "
                "slice(t, 3, greatest(size(t) - 2, 0)))"
            )
        ).alias("s")
    ).select(
        F.expr("s['0']").alias("w1"),
        F.expr("s['1']").alias("w2"),
        F.expr("s['2']").alias("w3"),
    )
    tg = tg0.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("long").alias("c123")
    )
    bt = tg.groupBy("w2", "w3").agg(
        F.count(F.lit(1)).cast("long").alias("n_prec")
    )
    # windows over the vocab^2-bounded bigram-type frame (bounds: the
    # 31-word corpus vocab; vocabulary-bounded at any corpus size)
    bts = bt.select(
        "w2",
        "w3",
        "n_prec",
        F.sum("n_prec").over(Window.partitionBy("w2")).alias("nmid_2"),
        F.count(F.lit(1))
        .over(Window.partitionBy("w2"))
        .alias("n23_types"),
        F.count(F.lit(1))
        .over(Window.partitionBy("w3"))
        .alias("nprec_3"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("ntot"),
    )
    # windows over the vocab^3-bounded trigram type frame
    st = tg.select(
        "w1",
        "w2",
        "w3",
        "c123",
        F.sum("c123").over(Window.partitionBy("w1", "w2")).alias("c12"),
        F.count(F.lit(1))
        .over(Window.partitionBy("w1", "w2"))
        .alias("n3_foll"),
    )
    j = st.join(
        bts.withColumnRenamed("w2", "bw2").withColumnRenamed(
            "w3", "bw3"
        ),
        (F.col("w2") == F.col("bw2")) & (F.col("w3") == F.col("bw3")),
    )
    # the IDENTICAL parenthesized expression as the oracle
    p_lower = F.greatest(F.col("n_prec") - 0.75, F.lit(0)) / F.col(
        "nmid_2"
    ) + ((0.75 * F.col("n23_types")) / F.col("nmid_2")) * (
        F.col("nprec_3").cast("double") / F.col("ntot")
    )
    p_kn3 = F.round(
        F.greatest(F.col("c123") - 0.75, F.lit(0)) / F.col("c12")
        + ((0.75 * F.col("n3_foll")) / F.col("c12")) * p_lower,
        6,
    )
    return (
        j.select("w1", "w2", "w3", "c123", p_kn3.alias("p_kn3"))
        .orderBy(F.desc("p_kn3"), "w1", "w2", "w3")
        .limit(20)
    )


# ----------------------------- dup-rate x quality-band interaction


_STOPWORDS = ("the", "a")


@register(
    "curation_dup_by_quality_band",
    "Duplication x quality FILTER-INTERACTION audit — the 2x2 "
    "contingency a curation team reads before ordering its pipeline "
    "stages: are the high-stopword (low-quality) documents also the "
    "duplicated ones, i.e. how much work does running the quality "
    "filter first save the (more expensive) dedup stage? Per-doc dup "
    "coverage comes from the proven 8-gram machinery "
    "(r8_ops._gram_frame: shifted-slice zip behind a repartition "
    "barrier; corpus frequency rides a hash-partitioned window on the "
    "8-byte gram hash); flags compare in INTEGERS (n_stop*10 >= n_tok "
    "<=> stopword ratio >= 0.1; covered*5 >= n_tok <=> coverage >= "
    "0.2) so no FP threshold flap; cell metrics are integer sums with "
    "one rounded division. 100 TB: the gram-frame window is the "
    "substring-dedup shuffle already adjudicated; everything after is "
    "a 4-row contingency.",
    oracle=f"""
      WITH {_R8_GRAM_SQL},
      gc AS (SELECT g AS gg, count(*)::BIGINT AS c FROM g GROUP BY g),
      dup AS (
        -- JOIN resolved BEFORE the LATERAL unnest: the comma-join
        -- form (g, gc, LATERAL ...) planned as a nested loop over
        -- |g| x |gc| and ran for minutes — explicit join first keeps
        -- it a hash join feeding a bounded unnest
        SELECT DISTINCT a.doc_id, ue.cp
        FROM (SELECT a0.doc_id, a0.p
              FROM g a0 JOIN gc ON a0.g = gc.gg
              WHERE gc.c >= 2) a,
             LATERAL unnest(range(a.p, a.p + 8)) ue(cp)
      ),
      cov AS (
        SELECT doc_id, count(*)::BIGINT AS covered
        FROM dup GROUP BY doc_id
      ),
      q AS (
        SELECT doc_id,
               len(regexp_extract_all(lower(text), '{_TOK}'))::BIGINT
                 AS n_tok,
               len(list_filter(regexp_extract_all(lower(text), '{_TOK}'),
                   x -> x IN {_STOPWORDS}))::BIGINT AS n_stop
        FROM documents
      ),
      f AS (
        SELECT q.doc_id, q.n_tok, q.n_stop,
               coalesce(cov.covered, 0) AS covered
        FROM q LEFT JOIN cov USING (doc_id)
        WHERE q.n_tok > 0
      )
      SELECT (n_stop * 10 >= n_tok) AS high_stopword,
             (covered * 5 >= n_tok) AS high_dup,
             count(*)::BIGINT AS n_docs,
             sum(covered)::BIGINT AS covered_tokens,
             sum(n_tok)::BIGINT AS total_tokens,
             round(sum(covered)::DOUBLE / sum(n_tok), 6)
               AS pooled_dup_coverage
      FROM f GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def curation_dup_by_quality_band(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.inventory.r8_ops import _gram_frame

    ex = _gram_frame(spark, sf_dir).select(
        "doc_id", "p", F.xxhash64("g").alias("h")
    )
    # corpus frequency via hash-partitioned window on the 8-byte gram
    # hash (the dedup_duplicated_ngram_coverage shuffle; same accepted
    # 64-bit collision class)
    freq = ex.withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("h"))
    )
    cov = (
        freq.where(F.col("cnt") >= 2)
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("p"), F.col("p") + 7)).alias(
                "cp"
            ),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("covered"))
    )
    # token + stopword counts off ONE tokenize behind the repartition
    # barrier (regex runs once per row, not once per reference)
    q = (
        _th(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(_TOK), 0
            ).alias("t"),
        )
        .repartition(max(spark.sparkContext.defaultParallelism, 8))
        .select(
            "doc_id",
            F.size("t").cast("long").alias("n_tok"),
            F.size(
                F.filter(F.col("t"), lambda x: x.isin(*_STOPWORDS))
            )
            .cast("long")
            .alias("n_stop"),
        )
    )
    f = (
        q.join(cov, "doc_id", "left")
        .withColumn("covered", F.coalesce(F.col("covered"), F.lit(0)))
        .where(F.col("n_tok") > 0)
    )
    return (
        f.groupBy(
            (F.col("n_stop") * 10 >= F.col("n_tok")).alias(
                "high_stopword"
            ),
            (F.col("covered") * 5 >= F.col("n_tok")).alias("high_dup"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("covered").cast("long").alias("covered_tokens"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.round(
                F.sum("covered").cast("double") / F.sum("n_tok"), 6
            ).alias("pooled_dup_coverage"),
        )
        .orderBy("high_stopword", "high_dup")
    )
