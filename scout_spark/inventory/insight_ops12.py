"""Round-5 fifteenth wave: bloom runtime join pruning and KWIC
concordance extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t


# ------------------------------------ bloom-pruned shuffle join

_BJ_PRICE = 480_000
_BJ_K = 3
_BJ_M = 65_536  # sized for the build side: ~10x bits per member at bench scale


@register(
    "join_bloom_runtime_filter",
    "Bloom-PRUNED shuffle join — the runtime-filter technique behind "
    "spark.sql.optimizer.runtime.bloomFilter, made explicit and "
    "engine-exact: the selective build side (orders above "
    f"{_BJ_PRICE:,}) publishes a {_BJ_M}-bit / k={_BJ_K} md5 bloom; "
    "the probe side (lineitem) drops non-members MAP-SIDE via "
    f"{_BJ_K} broadcast hash-joins against the bit table BEFORE the "
    "big shuffle join (hinted merge — the big-big shape where "
    "neither side broadcasts), so the shuffle carries matching rows "
    "plus a provably-small false-positive tail instead of the whole "
    "fact table (asserted in tests/test_shuffle_volume.py). Bloom "
    "false positives are eliminated by the join itself — the filter "
    "is LOSSLESS for inner joins (no false negatives), which is why "
    "the plain-join oracle must match exactly. 100 TB: the bit "
    "table is <= m rows regardless of build cardinality; probe "
    "pruning is map-side; the shuffle shrinks by the join "
    "selectivity.",
    oracle=f"""
      WITH members AS (
        SELECT o_orderkey FROM orders WHERE o_totalprice > {_BJ_PRICE}
      )
      SELECT l.l_returnflag,
             count(*)::BIGINT AS n_items,
             sum(round(l.l_extendedprice * 100)::BIGINT)::BIGINT
               AS revenue_cents
      FROM lineitem l JOIN members m ON l.l_orderkey = m.o_orderkey
      GROUP BY l.l_returnflag
      ORDER BY l.l_returnflag
    """,
)
def join_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    members = o.where(F.col("o_totalprice") > _BJ_PRICE).select(
        "o_orderkey"
    )

    def pos(key, s):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(key.cast("string"), F.lit(f":{s}"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _BJ_M
        )

    # bit table: <= m rows at ANY build cardinality -> broadcast
    bits = (
        members.select(
            F.explode(
                F.array(
                    *[pos(F.col("o_orderkey"), s) for s in range(_BJ_K)]
                )
            ).alias("pos")
        )
        .distinct()
        .persist()  # consumed by k probe joins
    )
    probe = li.select(
        "l_orderkey",
        "l_returnflag",
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias(
            "cents"
        ),
    )
    # k map-side broadcast joins set one hit flag each; a row survives
    # only if every bloom position is set — no shuffle yet
    for s in range(_BJ_K):
        b = F.broadcast(
            bits.select(F.col("pos").alias(f"p{s}"), F.lit(1).alias(f"h{s}"))
        )
        probe = probe.join(
            b, pos(F.col("l_orderkey"), s) == F.col(f"p{s}"), "left"
        ).drop(f"p{s}")
    pruned = probe.where(
        F.lit(True)
        & F.col("h0").isNotNull()
        & F.col("h1").isNotNull()
        & F.col("h2").isNotNull()
    ).drop("h0", "h1", "h2")
    # the big-big join: hinted merge so neither side broadcasts — the
    # shape where the bloom pruning is the only thing keeping the
    # shuffle small
    joined = pruned.join(
        members.hint("merge"),
        pruned.l_orderkey == members.o_orderkey,
    )
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("l_returnflag")
    )


# ----------------------------------------- KWIC concordance

_KWIC_PATTERN = "big query"
_KWIC_CTX = 24


@register(
    "search_kwic_concordance",
    "Keyword-in-context (KWIC) concordance — the classic corpus-"
    "linguistics presentation of search hits: for every document "
    "containing the pattern, the first match position and a "
    f"+/-{_KWIC_CTX}-char context snippet, clamped at text start. "
    "Pure scan-side string ops (locate/substr — codegen, no UDF, no "
    "shuffle except the result sort); the trigram candidates of "
    "search_trigram_index_like are the index-accelerated front end "
    "of the same query. 100 TB: embarrassingly parallel scan; "
    "output is |matches| rows.",
    oracle=f"""
      SELECT doc_id,
             strpos(text, '{_KWIC_PATTERN}')::BIGINT AS match_pos,
             substr(text,
                    greatest(strpos(text, '{_KWIC_PATTERN}')
                             - {_KWIC_CTX}, 1),
                    {_KWIC_CTX} + {len(_KWIC_PATTERN)} + {_KWIC_CTX}
                    + least(strpos(text, '{_KWIC_PATTERN}')
                            - {_KWIC_CTX} - 1, 0)) AS snippet
      FROM documents
      WHERE strpos(text, '{_KWIC_PATTERN}') > 0
      ORDER BY doc_id
    """,
)
def search_kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    mp = F.locate(_KWIC_PATTERN, F.col("text"))
    start = F.greatest(mp - _KWIC_CTX, F.lit(1))
    # when the match sits near the text start, the window shrinks by
    # the clamped amount so both engines cut identical snippets
    length = (
        F.lit(_KWIC_CTX + len(_KWIC_PATTERN) + _KWIC_CTX)
        + F.least(mp - _KWIC_CTX - 1, F.lit(0))
    )
    return (
        d.where(mp > 0)
        .select(
            "doc_id",
            mp.cast("long").alias("match_pos"),
            F.col("text").substr(start, length).alias("snippet"),
        )
        .orderBy("doc_id")
    )
