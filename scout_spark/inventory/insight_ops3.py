"""Round-5 fourth wave: Bloom-filter membership (the runtime
join-filter pattern, made engine-exact), Poisson-bootstrap confidence
intervals (the resampling scheme that actually scales), grid-blocked
spatial radius self-join (filter-then-verify in coordinate space),
largest-remainder proportional allocation, and partitioned
gaps-and-islands.  Every entry is integer-exact end to end except the
final rounded ratio columns, so the DuckDB twins hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t


def _md5_long(col):
    """First 8 md5 hex chars as a bigint — the hash_parity.py idiom
    (Spark conv(...,16,10) == DuckDB ('0x'||substr)::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


# ------------------------------------------------ Bloom filter twin

_BLOOM_M = 4096  # bits
_BLOOM_K = 3  # hash functions
_BLOOM_PRICE = 350000.0  # member predicate: any order above this


@register(
    "sketch_bloom_md5_membership",
    "Bloom-filter membership with a measured false-positive audit — "
    "the data structure behind Spark's own runtime join filters "
    "(spark.sql.optimizer.runtime.bloomFilter) and every large-scale "
    "needs-a-prefilter join, made CROSS-ENGINE EXACT: the member set "
    "is the distinct custkeys with any order above a price threshold, "
    "each member sets k=3 bit positions md5(key:seed) % 4096, and "
    "every customer is probed against the filter (positive iff all 3 "
    "bits set). Output: probe/member/positive/false-positive counts, "
    "bits set, and the realized FP rate — which the run CHECKS "
    "against theory instead of assuming. 100 TB: the bit set is "
    "bounded by m=4096 positions regardless of member count, so it "
    "broadcasts (a join-prefilter that costs one map-side lookup); "
    "the probe side never shuffles. Cites reference repo.py's "
    "exact-membership lookups as the operation being accelerated.",
    oracle=f"""
      WITH members AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_totalprice > {_BLOOM_PRICE}
      ),
      seeds AS (SELECT unnest(range(0, {_BLOOM_K})) AS s),
      bits AS (
        SELECT DISTINCT
               ('0x' || substr(md5(o_custkey::VARCHAR || ':' || s::VARCHAR),
                               1, 8))::BIGINT % {_BLOOM_M} AS pos
        FROM members, seeds
      ),
      probe AS (
        SELECT c.c_custkey,
               sum(CASE WHEN ('0x' || substr(
                     md5(c.c_custkey::VARCHAR || ':' || s::VARCHAR),
                     1, 8))::BIGINT % {_BLOOM_M}
                     IN (SELECT pos FROM bits)
                   THEN 1 ELSE 0 END) AS hits,
               max(CASE WHEN c.c_custkey IN (SELECT o_custkey FROM members)
                   THEN 1 ELSE 0 END) AS is_member
        FROM customer c, seeds
        GROUP BY c.c_custkey
      )
      SELECT count(*) AS n_probes,
             sum(is_member)::BIGINT AS n_members,
             sum(CASE WHEN hits = {_BLOOM_K} THEN 1 ELSE 0 END)::BIGINT
               AS n_bloom_pos,
             sum(CASE WHEN hits = {_BLOOM_K} AND is_member = 0
                 THEN 1 ELSE 0 END)::BIGINT AS n_false_pos,
             (SELECT count(*) FROM bits)::BIGINT AS n_bits_set,
             round(sum(CASE WHEN hits = {_BLOOM_K} AND is_member = 0
                       THEN 1 ELSE 0 END)::DOUBLE
                   / count(*), 6) AS fp_rate
      FROM probe
    """,
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    members = (
        o.where(F.col("o_totalprice") > _BLOOM_PRICE)
        .select(F.col("o_custkey").alias("key"))
        .distinct()
        # one orders scan, not two: the frame is read by BOTH the
        # build-time bit-position collect and the truth-audit
        # broadcast — separate jobs, no cross-job subtree reuse (the
        # BM25/kn3 lesson; caught by the r10 ratio triage)
        .localCheckpoint(eager=False)
    )
    def pos(key, s):
        return (
            _md5_long(F.concat_ws(":", key.cast("string"), F.lit(str(s))))
            % _BLOOM_M
        )

    # build: the filter collapses to <= m distinct bit positions at ANY
    # member cardinality — that is the point of the sketch. It resolves
    # driver-side (build-time parameter pattern, bounded at 4096 ints)
    # into a literal bitmask, so the PROBE below is pure map-side
    # column arithmetic with no join at all — the exact shape of
    # Spark's own runtime bloom-filter pushdown.
    bit_rows = (
        members.select(
            F.explode(
                F.array(*[pos(F.col("key"), s) for s in range(_BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    n_bits_set = len(bit_rows)
    mask = ["0"] * _BLOOM_M
    for r in bit_rows:
        mask[r["pos"]] = "1"
    mask_str = "".join(mask)

    hit_cols = [
        (
            F.expr(f"substring(_mask, cast(p{s} as int) + 1, 1)") == "1"
        ).cast("int")
        for s in range(_BLOOM_K)
    ]
    probed = (
        c.select(F.col("c_custkey").alias("key"))
        .withColumn("_mask", F.lit(mask_str))
        .select(
            "key",
            "_mask",
            *[pos(F.col("key"), s).alias(f"p{s}") for s in range(_BLOOM_K)],
        )
        .select("key", sum(hit_cols[1:], hit_cols[0]).alias("hits"))
    )
    # the exact-membership audit join is the expensive path the bloom
    # filter exists to avoid — it is here only to MEASURE the fp rate
    truth = probed.join(
        F.broadcast(members.withColumn("is_m", F.lit(1))), "key", "left"
    ).select(
        "hits", F.coalesce(F.col("is_m"), F.lit(0)).alias("is_member")
    )
    return truth.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum("is_member").cast("long").alias("n_members"),
        F.sum((F.col("hits") == _BLOOM_K).cast("int"))
        .cast("long")
        .alias("n_bloom_pos"),
        F.sum(
            ((F.col("hits") == _BLOOM_K) & (F.col("is_member") == 0))
            .cast("int")
        )
        .cast("long")
        .alias("n_false_pos"),
    ).select(
        "n_probes",
        "n_members",
        "n_bloom_pos",
        "n_false_pos",
        F.lit(n_bits_set).cast("long").alias("n_bits_set"),
        F.round(
            F.col("n_false_pos").cast("double") / F.col("n_probes"), 6
        ).alias("fp_rate"),
    )


# -------------------------------------------- Poisson bootstrap CI

_BOOT_B = 32
# Poisson(1) CDF * 1e6, as integer thresholds: P(W <= j). A uniform
# md5 draw in [0, 1e6) inverted through this table gives each row an
# i.i.d.-across-(doc, b) pseudo-Poisson(1) resample weight — the
# Google "Poisson bootstrap" trick that replaces sample-with-
# replacement (which needs global coordination) with a per-row local
# draw, making the bootstrap embarrassingly parallel.
_POIS_CDF = [367879, 735759, 919699, 981012, 996340, 999406, 999917]


def _pois_weight_spark(u):
    w = F.lit(len(_POIS_CDF))
    for j in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(u < _POIS_CDF[j], F.lit(j)).otherwise(w)
    return w


def _pois_weight_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {j}" for j, t in enumerate(_POIS_CDF)
    )
    return f"CASE {branches} ELSE {len(_POIS_CDF)} END"


@register(
    "stats_poisson_bootstrap_ci",
    "Bootstrap resampling that actually works at 100 TB: classic "
    "bootstrap draws n samples WITH replacement per replicate — a "
    "global shuffle per replicate. The POISSON BOOTSTRAP (Chamandy "
    "et al., Google) replaces it with a per-row local draw: each "
    "(doc, replicate) pair gets an independent Poisson(1) weight, "
    "and the weighted mean per replicate converges to the same "
    "bootstrap distribution. Here the uniform draw is md5(doc:b) "
    "mod 1e6 inverted through the integer Poisson CDF table, so both "
    "engines produce IDENTICAL resamples — the statistic (mean doc "
    "length, B=32 replicates) is exact-integer sums divided once at "
    "the end. Output: one row per replicate with its effective n and "
    "mean. 100 TB: explode x32 then groupBy(b) is map-side "
    "combinable — the shuffle carries 32 partial sums per partition, "
    "not rows.",
    oracle=f"""
      WITH draws AS (
        SELECT b,
               {_pois_weight_sql(
                   "('0x' || substr(md5(doc_id::VARCHAR || ':' || "
                   "b::VARCHAR), 1, 8))::BIGINT % 1000000"
               )} AS w,
               n_chars
        FROM documents, (SELECT unnest(range(0, {_BOOT_B})) AS b)
      )
      SELECT b AS resample,
             sum(w)::BIGINT AS n_eff,
             round(sum(w * n_chars)::DOUBLE / sum(w), 6) AS mean_len
      FROM draws
      GROUP BY b
      ORDER BY b
    """,
)
def stats_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    u = (
        _md5_long(
            F.concat_ws(
                ":",
                F.col("doc_id").cast("string"),
                F.col("b").cast("string"),
            )
        )
        % 1000000
    )
    draws = d.select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    ).select("b", _pois_weight_spark(u).alias("w"), "n_chars")
    return (
        draws.groupBy("b")
        .agg(
            F.sum("w").cast("long").alias("n_eff"),
            F.round(
                F.sum(F.col("w") * F.col("n_chars")).cast("double")
                / F.sum("w"),
                6,
            ).alias("mean_len"),
        )
        .select(F.col("b").alias("resample"), "n_eff", "mean_len")
        .orderBy("resample")
    )


# -------------------------------- grid-blocked spatial radius join

# Synthetic integer coordinates in [0, 100000)^2 derived from the
# custkey (same spirit as layout_zorder_key's lon/lat scramble, but
# all-integer so the twin is exact with zero FP anywhere).
_GRID_LON_MUL = 7919
_GRID_LAT_MUL = 104729
_GRID_MOD = 100000
_GRID_CELL = 2500
_GRID_R = 2000  # radius; R <= CELL so the 3x3 neighborhood is exact
_GRID_TOPK = 15


@register(
    "spatial_radius_pairs_grid",
    "Spatial radius self-join via GRID BLOCKING — the filter-then-"
    "verify signature applied to coordinate space (the same shape as "
    "reference ranking.py's candidate-scan + exact-score): points "
    "land in cells of side >= radius, each point probes its own and "
    "the 8 neighboring cells (candidate generation with ZERO false "
    "negatives, by the triangle bound R <= cell), and exact integer "
    "squared distance verifies. Coordinates are integer scrambles of "
    "the custkey, so Spark's blocked plan and DuckDB's quadratic "
    "cross-join twin agree bit-for-bit — two strategies, one answer. "
    "Output: the 15 closest pairs within radius. 100 TB: candidate "
    "pairs are |cells| * density^2 * 9 instead of n^2; the join "
    "shuffles on the cell key, so co-located points hash to the same "
    "reducer — the standard distributed spatial-join layout (cf. "
    "Sedona/Magellan grid partitioners).",
    oracle=f"""
      WITH pts AS (
        SELECT c_custkey AS k,
               (c_custkey * {_GRID_LON_MUL}) % {_GRID_MOD} AS x,
               (c_custkey * {_GRID_LAT_MUL}) % {_GRID_MOD} AS y
        FROM customer
      )
      SELECT a.k AS a_key, b.k AS b_key,
             (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
      FROM pts a, pts b
      WHERE a.k < b.k
        AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
            <= {_GRID_R} * {_GRID_R}
      ORDER BY d2, a_key, b_key
      LIMIT {_GRID_TOPK}
    """,
)
def spatial_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("k"),
        ((F.col("c_custkey") * _GRID_LON_MUL) % _GRID_MOD).alias("x"),
        ((F.col("c_custkey") * _GRID_LAT_MUL) % _GRID_MOD).alias("y"),
    ).selectExpr(
        "k",
        "x",
        "y",
        f"x div {_GRID_CELL} AS cx",
        f"y div {_GRID_CELL} AS cy",
    )
    # left side expands to its 3x3 cell neighborhood; right side stays
    # on its home cell — every within-radius pair meets in exactly one
    # (cell, orientation), so no dedup pass is needed
    probe = pts.select(
        "k",
        "x",
        "y",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + dx).alias("gx"),
                        (F.col("cy") + dy).alias("gy"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("g"),
    ).select("k", "x", "y", F.col("g.gx").alias("gx"), F.col("g.gy").alias("gy"))
    home = pts.select(
        F.col("k").alias("bk"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("gx"),
        F.col("cy").alias("gy"),
    )
    d2 = (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx")) + (
        F.col("y") - F.col("by")
    ) * (F.col("y") - F.col("by"))
    return (
        probe.join(home, ["gx", "gy"])
        .where(F.col("k") < F.col("bk"))
        .select(
            F.col("k").alias("a_key"),
            F.col("bk").alias("b_key"),
            d2.alias("d2"),
        )
        .where(F.col("d2") <= _GRID_R * _GRID_R)
        .orderBy("d2", "a_key", "b_key")
        .limit(_GRID_TOPK)
    )


# ------------------------------- largest-remainder allocation

_ALLOC_SEATS = 1000


@register(
    "alloc_largest_remainder",
    "Proportional allocation by the LARGEST-REMAINDER method "
    "(Hamilton/Hare) — the 'split this budget/quota/sample-count "
    "across groups proportionally, in whole units, summing exactly to "
    "the total' operation every mixture/sampling pipeline needs (cf. "
    "sample_mixture_rebalance, which allocates fractionally): each "
    "nation's revenue cents earn floor(share * 1000) seats, and the "
    "unallocated remainder seats go to the largest fractional parts "
    "(tie-break nation key). All arithmetic is exact bigint "
    "(rev * 1000 div/mod total), so seats sum to exactly 1000 on both "
    "engines by construction. 100 TB: the fact scan collapses to one "
    "row per nation before the bounded (25-row) ranking window — the "
    "windows only ever see |groups| rows.",
    oracle=f"""
      WITH rev AS (
        SELECT n.n_name AS nation, n.n_nationkey AS nk,
               sum(round(o.o_totalprice * 100)::BIGINT)::BIGINT AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, n.n_nationkey
      ),
      base AS (
        SELECT nation, nk, cents,
               (cents * {_ALLOC_SEATS}) // sum(cents) OVER () AS floor_seats,
               (cents * {_ALLOC_SEATS}) % sum(cents) OVER () AS rem
        FROM rev
      ),
      ranked AS (
        SELECT *,
               row_number() OVER (ORDER BY rem DESC, nk) AS rr,
               {_ALLOC_SEATS} - sum(floor_seats) OVER () AS leftover
        FROM base
      )
      SELECT nation, cents,
             (floor_seats + CASE WHEN rr <= leftover THEN 1 ELSE 0 END)
               ::BIGINT AS seats
      FROM ranked
      ORDER BY seats DESC, nation
    """,
)
def alloc_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("n_nationkey").alias("nk"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    # every window below runs over the 25-row per-nation frame — the
    # single-partition totals are bounded by |nations|, never by facts.
    # `div` keeps the quotient in exact bigint arithmetic (Spark's `/`
    # on bigints is DOUBLE division — a rounding hazard near-integer)
    wall = Window.partitionBy()
    base = rev.withColumn("total", F.sum("cents").over(wall)).selectExpr(
        "nation",
        "nk",
        "cents",
        f"(cents * {_ALLOC_SEATS}) div total AS floor_seats",
        f"(cents * {_ALLOC_SEATS}) % total AS rem",
    )
    ranked = base.select(
        "nation",
        "cents",
        "floor_seats",
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), "nk"))
        .alias("rr"),
        (F.lit(_ALLOC_SEATS) - F.sum("floor_seats").over(wall)).alias(
            "leftover"
        ),
    )
    return ranked.select(
        "nation",
        "cents",
        (
            F.col("floor_seats")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("seats"),
    ).orderBy(F.col("seats").desc(), "nation")


# ------------------------------------ partitioned gaps-and-islands

_GAP_BUCKET = 1024
_GAP_TOPK = 10


@register(
    "audit_sequence_gaps",
    "Gaps in a sparse key sequence (free-ID ranges / missing-record "
    "audit) — the classic gaps-and-islands query, but PARTITIONED so "
    "it scales: the textbook lag-over-global-order needs one total "
    "sort; here keys bucket by key div 1024, within-bucket gaps come "
    "from a lag window PARTITIONED by bucket (parallel), and cross-"
    "bucket gaps from a per-bucket min/max aggregate whose frame is "
    "bounded by |buckets| — together these enumerate exactly the "
    "consecutive pairs of the global order. Key set: orderkeys of "
    "finished ('F') orders, a sparse subset of the dense key space. "
    "The oracle is the textbook single-window global formulation — "
    "two strategies, one answer. Output: the 10 widest gaps. 100 TB: "
    "no global sort; the only single-partition frame is the "
    "|buckets|-row boundary pass.",
    oracle=f"""
      WITH ks AS (
        SELECT DISTINCT o_orderkey AS k FROM orders
        WHERE o_orderstatus = 'F'
      ),
      lagged AS (
        SELECT k, lag(k) OVER (ORDER BY k) AS pk FROM ks
      )
      SELECT (pk + 1)::BIGINT AS gap_start,
             (k - 1)::BIGINT AS gap_end,
             (k - pk - 1)::BIGINT AS gap_len
      FROM lagged
      WHERE pk IS NOT NULL AND k - pk > 1
      ORDER BY gap_len DESC, gap_start
      LIMIT {_GAP_TOPK}
    """,
)
def audit_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    ks = (
        o.where(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
        .withColumn("bkt", (F.col("k") / _GAP_BUCKET).cast("long"))
    )
    wb = Window.partitionBy("bkt").orderBy("k")
    within = (
        ks.select("k", F.lag("k").over(wb).alias("pk"))
        .where(F.col("pk").isNotNull() & (F.col("k") - F.col("pk") > 1))
        .select("k", "pk")
    )
    # boundary pass: one row per non-empty bucket — bounded at
    # |keyspace| / 1024 rows, so the single-partition lag is safe
    bounds = ks.groupBy("bkt").agg(
        F.min("k").alias("bmin"), F.max("k").alias("bmax")
    )
    across = (
        bounds.select(
            F.col("bmin").alias("k"),
            F.lag("bmax").over(Window.orderBy("bkt")).alias("pk"),
        )
        .where(F.col("pk").isNotNull() & (F.col("k") - F.col("pk") > 1))
    )
    return (
        within.unionByName(across)
        .select(
            (F.col("pk") + 1).cast("long").alias("gap_start"),
            (F.col("k") - 1).cast("long").alias("gap_end"),
            (F.col("k") - F.col("pk") - 1).cast("long").alias("gap_len"),
        )
        .orderBy(F.col("gap_len").desc(), "gap_start")
        .limit(_GAP_TOPK)
    )
