"""Oracle-expressible companions for the hashing dedup family
(round-1 verdict item 8: dedup_simhash / dedup_minhash_lsh are
rows-only because murmur3/crc32 aren't reproducible in DuckDB — md5
IS available in both engines, so these twins pin the full kernels
cross-engine with the hard rows+schema+hash signal).

Shared construction: tokens = regexp_extract_all(lower(text),
'[a-z0-9]+') — ASCII-class extraction behaves identically in Java and
DuckDB regex dialects (no empty-string or unicode-case edge cases);
token/shingle hash = first 8 hex chars of md5 parsed as an int
(Spark conv(...,16,10) ≡ DuckDB ('0x'||substr)::BIGINT).

The simhash pair query's band blocking is EXACT, not approximate: with
8 bands of 4 bits, any pair within hamming d ≤ 7 differs in at most d
bands (pigeonhole), so it shares at least one identical band; the
threshold here is 2. The DuckDB oracle does the all-pairs O(n²) check;
band blocking must therefore return exactly the same rows — the
correctness check proves the scale path lossless, not just plausible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th

_SIMHASH_BITS = 32
_BANDS = 8  # 4-bit bands; exact for hamming <= _BANDS - 2
_HAMMING_MAX = 2
_MIN_TOKENS = 8  # tiny token sets make 32-bit simhash collide by chance
_MINHASH_K = 16
_MINHASH_P = 2147483647  # 2^31 - 1


def _tokens(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit("[a-z0-9]+"), 0)


def _md5_32(s: Column) -> Column:
    """32-bit int from the first 8 hex chars of md5 — reproducible in
    DuckDB as ('0x'||substr(md5(s),1,8))::BIGINT."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def _simhash(text: Column) -> Column:
    """32-bit SimHash over distinct md5-hashed tokens, pure Column
    expressions: one fold accumulates the 32 bit-votes (md5 computed
    once per token), then votes collapse to sign bits."""
    return _simhash_from_tokens(F.array_distinct(_tokens(text)))


def _simhash_from_tokens(tk: Column) -> Column:
    """SimHash from an already-derived distinct-token array column —
    callers that also filter on token count should pass the SAME
    column so the tokenizer isn't re-evaluated per reference."""
    th = F.transform(tk, _md5_32)

    def _vote_vector(h: Column) -> Column:
        return F.array(
            *[
                (h.bitwiseAND(F.lit(1 << b)) != 0).cast("int") * 2 - 1
                for b in range(_SIMHASH_BITS)
            ]
        )

    votes = F.aggregate(
        th,
        F.array(*[F.lit(0)] * _SIMHASH_BITS),
        lambda acc, h: F.zip_with(acc, _vote_vector(h), lambda a, v: a + v),
    )
    # sign bits collapse through ONE fold referencing `votes` once — a
    # per-bit element_at chain references the whole vote fold 32 times,
    # and projection collapse then re-evaluates the token fold per
    # reference (32x per row; part of the measured 21 s -> 1 s fix)
    return F.aggregate(
        F.zip_with(
            votes,
            F.sequence(F.lit(0), F.lit(_SIMHASH_BITS - 1)),
            # 2^b via pow is exact in double for b < 32
            lambda v, b: F.when(v > 0, F.pow(F.lit(2.0), b).cast("long"))
            .otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


@register(
    "dedup_simhash_hamming_pairs",
    "SimHash near-dup pairs with a CROSS-ENGINE signature (md5 token "
    "hashes) and exact band blocking: 8×4-bit bands guarantee every "
    "pair within the hamming threshold shares a band (pigeonhole), so "
    "the banded "
    "plan — the 100 TB path, shuffling only (id, band, bucket) — "
    "returns exactly what the oracle's all-pairs scan returns. The "
    "oracle check therefore proves the blocking lossless, not just "
    "plausible.",
    oracle=f"""
      WITH s AS (
        SELECT doc_id,
               list_sum(list_transform(range(0, {_SIMHASH_BITS}), b ->
                 CASE WHEN list_sum(list_transform(th, h ->
                        CASE WHEN (h // power(2, b)::BIGINT) % 2 = 1
                             THEN 1 ELSE -1 END)) > 0
                      THEN power(2, b)::BIGINT ELSE 0 END))::BIGINT AS simhash
        FROM (
          SELECT doc_id,
                 list_transform(
                   list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')),
                   tok -> ('0x' || substr(md5(tok), 1, 8))::BIGINT) AS th
          FROM documents) t
        WHERE len(th) >= {_MIN_TOKENS}
      )
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             bit_count(xor(a.simhash, b.simhash)) AS hamming
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= {_HAMMING_MAX}
    """,
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _th(spark, sf_dir, "documents")
    # the repartition barrier below is LOAD-BEARING even though sigs
    # now has a single consumer (the band explode): without it,
    # projection collapse inlines the token/vote fold into each of the
    # 8 band-bucket expressions in the explode projection — 8x the
    # signature cost per row (part of the measured 21 s)
    sigs = (
        d.select(
            "doc_id",
            F.array_distinct(_tokens(F.col("text"))).alias("tk"),
        )
        .where(F.size("tk") >= _MIN_TOKENS)
        .select(
            "doc_id",
            _simhash_from_tokens(F.col("tk")).alias("simhash"),
        )
        .repartition(
            # barrier count scales with the cluster, not the bench box
            # (ADVICE r04): parallelism is whatever the session offers,
            # floored at 8 so the bench's single row group still fans out
            max(spark.sparkContext.defaultParallelism, 8),
            "doc_id",
        )
    )
    band_width = _SIMHASH_BITS // _BANDS
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright(F.col("simhash"), b * band_width)
                        .bitwiseAND(F.lit((1 << band_width) - 1))
                        .alias("bucket"),
                    )
                    for b in range(_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_idx", "band.bucket")
    # the hamming verify is a bucket-local EQUI-JOIN carrying the
    # signature on both sides, so bit_count runs inside codegen and
    # only verified pairs reach dropDuplicates. Two earlier shapes
    # both lost: (r04-) shuffling every candidate through
    # dropDuplicates + two signature joins (21 s); (r05) grouped-list
    # HOF pair expansion, which collapses each bucket into ONE
    # interpreted O(n²) task — fine at the then-measured ~17x
    # candidate ratio, but the regenerated corpus concentrates
    # signatures into ~4k-doc buckets (38M candidates at sf0.1) and a
    # dense bucket becomes a single-task straggler: 17.7 s, vs 4.6 s
    # for this join (the CLAUDE.md HOF-vs-join crossover at scale;
    # the residual is the inherent 38M bit_count verifications).
    # At 100 TB the banding parameters bound bucket density; the join
    # parallelizes whatever density remains.
    banded = banded.localCheckpoint()  # two join sides, one signature eval
    a = banded.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sa"),
        "band_idx",
        "bucket",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sb"),
        "band_idx",
        "bucket",
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        a.join(b, ["band_idx", "bucket"])
        .where((F.col("doc_a") < F.col("doc_b")) & (ham <= _HAMMING_MAX))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .dropDuplicates(["doc_a", "doc_b"])
    )


def _minhash_md5_signature(text: Column) -> Column:
    """k=16 minhash over distinct 3-token shingles with md5 shingle
    hashes and (a_k·h + b_k) mod 2^31-1 universal hashing — every step
    reproducible in DuckDB SQL. One fold pass; md5 once per shingle."""
    toks = _tokens(text)
    shingles = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 3)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    th = F.transform(F.array_distinct(shingles), _md5_32)

    def _hash_vector(h: Column) -> Column:
        return F.array(
            *[
                (h * (2 * k + 3) + (k * 1000003 + 7)) % _MINHASH_P
                for k in range(_MINHASH_K)
            ]
        )

    return F.aggregate(
        th,
        F.array(*[F.lit(_MINHASH_P).cast("long")] * _MINHASH_K),
        lambda acc, h: F.zip_with(acc, _hash_vector(h), lambda a, b: F.least(a, b)),
    )


@register(
    "dedup_minhash_md5_signatures",
    "MinHash signature kernel with CROSS-ENGINE hashing (md5 shingle "
    "hashes + universal hashing mod 2^31-1): the oracle reproduces the "
    "full shingle→hash→min pipeline in DuckDB SQL and the value hash "
    "pins every signature element. Companion to dedup_minhash_lsh "
    "(whose crc32/SipHash kernels are faster but engine-specific, hence "
    "rows-only). Top-100 docs by id keep the check O(100·shingles). "
    "The signature is serialized as a comma-joined string — the "
    "driver's canonicalizer cannot hash list cells.",
    oracle=f"""
      SELECT doc_id,
             array_to_string(
               list_transform(range(0, {_MINHASH_K}), k ->
                 coalesce(list_min(list_transform(th, h ->
                   (h * (2*k + 3) + (k * 1000003 + 7)) % {_MINHASH_P})),
                   {_MINHASH_P})), ',') AS minhash_sig
      FROM (
        SELECT doc_id,
               list_transform(
                 list_distinct(
                   CASE WHEN len(toks) >= 3
                        THEN list_transform(range(1, len(toks) - 1), i ->
                               concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                        ELSE [array_to_string(toks, ' ')] END),
                 s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS th
        FROM (
          SELECT doc_id,
                 regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
          FROM documents
          ORDER BY doc_id LIMIT 100) t
      ) x
      ORDER BY doc_id
    """,
)
def dedup_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _th(spark, sf_dir, "documents")
    return (
        d.orderBy("doc_id")
        .limit(100)
        .select(
            "doc_id",
            F.array_join(
                F.transform(
                    _minhash_md5_signature(F.col("text")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("minhash_sig"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------- incremental probe twin


_PROBE_BANDS = 4
_PROBE_ROWS_PER_BAND = _MINHASH_K // _PROBE_BANDS
_PROBE_CORPUS_N = 150
_PROBE_MIN_AGREE = 8  # est jaccard >= 0.5


def _probe_sig_sql(src: str) -> str:
    """DuckDB twin of _minhash_md5_signature over ``src`` (id, text)."""
    return f"""
        SELECT id,
               list_transform(range(0, {_MINHASH_K}), k ->
                 coalesce(list_min(list_transform(th, h ->
                   (h * (2*k + 3) + (k * 1000003 + 7)) % {_MINHASH_P})),
                   {_MINHASH_P})) AS sig
        FROM (
          SELECT id,
                 list_transform(
                   list_distinct(
                     CASE WHEN len(toks) >= 3
                          THEN list_transform(range(1, len(toks) - 1), i ->
                                 concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                          ELSE [array_to_string(toks, ' ')] END),
                   s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS th
          FROM (
            SELECT id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
            FROM ({src}) _t0) _t1
        ) _t2
    """


def _probe_band_sql(sig_cte: str) -> str:
    w = _PROBE_ROWS_PER_BAND
    return f"""
        SELECT id, b.b AS band,
               array_to_string(
                 list_slice(sig, b.b * {w} + 1, b.b * {w} + {w}), ',') AS bucket
        FROM {sig_cte}, (SELECT unnest(range(0, {_PROBE_BANDS})) AS b) b
    """


@register(
    "dedup_minhash_md5_incremental_probe",
    "Incremental near-dup probe with a CROSS-ENGINE kernel: the md5 "
    "minhash signatures (dedup_minhash_md5_signatures' kernel) are "
    "banded into 4x4 LSH buckets whose ids are the band's literal "
    "signature slice (engine-exact strings, per VERDICT r04 item 8); "
    "a deterministic synthetic batch (first-token-dropped near-copies "
    "that must hit + salted novel docs that must miss) probes the "
    "corpus index via a band-bucket equi-join with the batch side "
    "broadcast, and candidates verify with the INTEGER agreement "
    "count (n positions equal of 16) — corpus text is read only to "
    "build the index, exactly the steady-state shape of "
    "operators/dedup.py::minhash_probe. The oracle reproduces "
    "signatures, banding, probe join, and verification in DuckDB SQL, "
    "so the hash match pins the full incremental path. 100 TB: probe "
    "cost is O(batch x bands) bucket lookups against a sorted index; "
    "the corpus-side frame never re-shuffles.",
    oracle=f"""
      WITH corpus_src AS (
        SELECT doc_id AS id, text FROM documents
        ORDER BY doc_id LIMIT {_PROBE_CORPUS_N}
      ),
      batch_src AS (
        SELECT id + 1000000 AS id,
               regexp_replace(text, '^\\S+\\s+', '') AS text
        FROM corpus_src WHERE id % 20 = 0
        UNION ALL
        SELECT id + 2000000 AS id,
               concat('novel', id, ' isolated vocabulary payload') AS text
        FROM corpus_src WHERE id % 20 = 7
      ),
      csig AS ({_probe_sig_sql("SELECT * FROM corpus_src")}),
      bsig AS ({_probe_sig_sql("SELECT * FROM batch_src")}),
      cband AS ({_probe_band_sql("csig")}),
      bband AS ({_probe_band_sql("bsig")}),
      cand AS (
        SELECT DISTINCT bb.id AS batch_id, cb.id AS corpus_id
        FROM bband bb JOIN cband cb
          ON bb.band = cb.band AND bb.bucket = cb.bucket
      )
      SELECT c.batch_id::BIGINT AS batch_id,
             c.corpus_id::BIGINT AS corpus_id,
             len(list_filter(range(1, {_MINHASH_K} + 1),
                             i -> bs.sig[i] = cs.sig[i]))::BIGINT AS n_agree
      FROM cand c
      JOIN bsig bs ON bs.id = c.batch_id
      JOIN csig cs ON cs.id = c.corpus_id
      WHERE len(list_filter(range(1, {_MINHASH_K} + 1),
                            i -> bs.sig[i] = cs.sig[i])) >= {_PROBE_MIN_AGREE}
      ORDER BY batch_id, corpus_id
    """,
)
def dedup_minhash_md5_incremental_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _th(spark, sf_dir, "documents")
    corpus = (
        d.orderBy("doc_id")
        .limit(_PROBE_CORPUS_N)
        .select(F.col("doc_id").alias("id"), "text")
    )
    near = corpus.where(F.col("id") % 20 == 0).select(
        (F.col("id") + 1_000_000).alias("id"),
        F.regexp_replace("text", r"^\S+\s+", "").alias("text"),
    )
    novel = corpus.where(F.col("id") % 20 == 7).select(
        (F.col("id") + 2_000_000).alias("id"),
        F.concat(
            F.lit("novel"),
            F.col("id").cast("string"),
            F.lit(" isolated vocabulary payload"),
        ).alias("text"),
    )
    batch = near.unionByName(novel)
    # signatures materialize ONCE (localCheckpoint): each frame feeds
    # both the band explode and the verification join, and the band
    # struct array references `sig` 4x — CollapseProject would inline
    # the signature fold per reference otherwise
    csig = corpus.select(
        "id", _minhash_md5_signature(F.col("text")).alias("sig")
    ).localCheckpoint()
    bsig = batch.select(
        "id", _minhash_md5_signature(F.col("text")).alias("sig")
    ).localCheckpoint()

    w = _PROBE_ROWS_PER_BAND

    def _bands(s: DataFrame) -> DataFrame:
        return s.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.array_join(
                                F.slice("sig", b * w + 1, w), ","
                            ).alias("bucket"),
                        )
                        for b in range(_PROBE_BANDS)
                    ]
                )
            ).alias("x"),
        ).select("id", "x.band", "x.bucket")

    cband = _bands(csig)
    bband = _bands(bsig)
    cand = (
        # bband is BATCH-sized (the incoming increment, bounded by the
        # probe design — corpus side stays un-broadcast), so the hint
        # holds at any corpus scale.
        cband.join(F.broadcast(bband), ["band", "bucket"])
        .select(
            bband["id"].alias("batch_id"), cband["id"].alias("corpus_id")
        )
        .distinct()
    )
    agree = F.aggregate(
        F.zip_with(
            F.col("bs"), F.col("cs"), lambda a, b: (a == b).cast("int")
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    return (
        cand.join(
            F.broadcast(bsig.select(F.col("id").alias("batch_id"), F.col("sig").alias("bs"))),
            "batch_id",
        )
        .join(
            csig.select(F.col("id").alias("corpus_id"), F.col("sig").alias("cs")),
            "corpus_id",
        )
        .select(
            F.col("batch_id").cast("bigint").alias("batch_id"),
            F.col("corpus_id").cast("bigint").alias("corpus_id"),
            agree.cast("bigint").alias("n_agree"),
        )
        .where(F.col("n_agree") >= _PROBE_MIN_AGREE)
        .orderBy("batch_id", "corpus_id")
    )
