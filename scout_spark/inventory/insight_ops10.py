"""Round-5 thirteenth wave: HLL register merging (sketch union),
centroid silhouette, calibration reliability bins, and integer
Bellman-Ford shortest paths.  All oracle-backed: md5 register kernel,
integer quadratic-form distances, IEEE-deterministic binning, and the
unrolled min-plus CTE discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th


# --------------------------------------- HLL union via register merge

from scout_spark.inventory.analytics_ops import (  # noqa: E402
    _HLL_ALPHA_M2,
    _HLL_B,
    _HLL_M,
)


@register(
    "sketch_hll_md5_union_merge",
    "HyperLogLog register MERGE — the property that makes HLL a "
    "distributed sketch at all: per-source register banks combine "
    "into the union's bank by max(rho) per bucket, so 'distinct "
    "tokens across ALL sources' never re-reads the sources (the "
    "partial-combine / cross-partition / cross-day rollup story in "
    "one operator). Same CROSS-ENGINE md5 kernel as "
    "sketch_hll_md5_distinct; reports the merged-union estimate "
    "against the exact global distinct AND the sum of per-source "
    "exact distincts (whose gap is the cross-source overlap a naive "
    "sum double-counts). 100 TB: per-source banks are <= m rows "
    "each; the merge shuffles at most |sources|*m register rows.",
    oracle=f"""
      WITH tok AS (
        SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
          AS tok
        FROM documents
      ),
      h AS (
        SELECT source, tok,
               ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
        FROM tok
      ),
      rr AS (
        SELECT source, hv % {_HLL_M} AS bucket,
               CASE WHEN (hv >> {_HLL_B}) > 0
                    THEN 53 - length(bin(hv >> {_HLL_B}))
                    ELSE 53 END AS rho
        FROM h
      ),
      srcregs AS (
        SELECT source, bucket, max(rho) AS r FROM rr GROUP BY source, bucket
      ),
      merged AS (
        SELECT bucket, max(r) AS r FROM srcregs GROUP BY bucket
      ),
      est AS (
        SELECT count(*) AS n_regs,
               sum(1.0 / (1::BIGINT << r)) AS s_present
        FROM merged
      ),
      ex AS (SELECT count(DISTINCT tok)::BIGINT AS exact_union FROM tok),
      persrc AS (
        SELECT sum(dd)::BIGINT AS sum_source_exact
        FROM (SELECT count(DISTINCT tok) AS dd FROM tok GROUP BY source)
      )
      SELECT ex.exact_union,
             persrc.sum_source_exact,
             round(CASE WHEN {_HLL_ALPHA_M2}
                             / (e.s_present + ({_HLL_M} - e.n_regs))
                             <= 2.5 * {_HLL_M}
                         AND e.n_regs < {_HLL_M}
                        THEN {_HLL_M}
                             * ln({_HLL_M}::DOUBLE / ({_HLL_M} - e.n_regs))
                        ELSE {_HLL_ALPHA_M2}
                             / (e.s_present + ({_HLL_M} - e.n_regs))
                   END, 2) AS merged_hll_estimate
      FROM est e, ex, persrc
    """,
)
def sketch_hll_md5_union_merge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.inventory.quality_ops import doc_tokens

    tok = doc_tokens(spark, sf_dir).select("source", "tok")
    hv = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    w = F.shiftright(hv, _HLL_B)
    # single-reference rho (see analytics_ops.sketch_hll_md5): avoids
    # the 3x md5 CollapseProject inline; identical integers
    rho = F.lit(54) - F.length(F.bin(F.shiftleft(w, 1) + 1))
    srcregs = (
        tok.select("source", (hv % _HLL_M).alias("bucket"), rho.alias("rho"))
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    merged = srcregs.groupBy("bucket").agg(F.max("r").alias("r"))
    est = merged.agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(F.expr("1.0 / shiftleft(cast(1 as bigint), r)")).alias(
            "s_present"
        ),
    )
    raw = F.lit(float(_HLL_ALPHA_M2)) / (
        F.col("s_present") + (_HLL_M - F.col("n_regs"))
    )
    small = (raw <= 2.5 * _HLL_M) & (F.col("n_regs") < _HLL_M)
    linear = _HLL_M * F.log(
        F.lit(float(_HLL_M)) / (_HLL_M - F.col("n_regs"))
    )
    ex = tok.agg(F.count_distinct("tok").cast("long").alias("exact_union"))
    persrc = (
        tok.groupBy("source")
        .agg(F.count_distinct("tok").alias("dd"))
        .agg(F.sum("dd").cast("long").alias("sum_source_exact"))
    )
    return (
        ex.crossJoin(F.broadcast(persrc))
        .crossJoin(F.broadcast(est))
        .select(
            "exact_union",
            "sum_source_exact",
            F.round(F.when(small, linear).otherwise(raw), 2).alias(
                "merged_hll_estimate"
            ),
        )
    )


# ------------------------------------------- centroid silhouette

_SIL_Q = 10_000  # quantization keeps the quadratic form in BIGINT range


@register(
    "embedding_centroid_silhouette",
    "Centroid-variant silhouette score per label — 'how separable is "
    "this labeling': s = (b - a)/max(a, b) with a = distance to own "
    "centroid, b = distance to the nearest other centroid (the "
    "linear-time variant of the quadratic classic; centroids include "
    "the point — documented variant). ENGINE-EXACT: vectors quantize "
    f"to floor(v*{_SIL_Q}), centroids stay RATIONAL (integer "
    "dim-sums S_d over count n, never a double mean), and the "
    "distance quadratic form n^2*d^2 = sum_d (n*q_d - S_d)^2 is pure "
    "BIGINT; only the final sqrt/division are doubles (IEEE ops are "
    "correctly rounded, hence bit-identical cross-engine — unlike "
    "exp/ln). 100 TB: centroids are one (label, dim) integer agg "
    "broadcast back; per-point work is |labels| quadratic forms, "
    "row-local.",
    oracle=f"""
      WITH q AS (
        SELECT vec_id, label,
               list_transform(embedding,
                              x -> floor(x::DOUBLE * {_SIL_Q})::BIGINT) AS q
        FROM embeddings
      ),
      flat AS (
        SELECT vec_id, label, unnest(q) AS v,
               unnest(range(1, len(q) + 1)) AS d
        FROM q
      ),
      cent AS (
        SELECT label AS clabel, d, sum(v)::BIGINT AS s,
               count(DISTINCT vec_id)::BIGINT AS n
        FROM flat GROUP BY label, d
      ),
      dist AS (
        SELECT f.vec_id, f.label, c.clabel,
               sqrt(sum((c.n * f.v - c.s) * (c.n * f.v - c.s))::DOUBLE)
                 / max(c.n) AS dist
        FROM flat f JOIN cent c USING (d)
        GROUP BY f.vec_id, f.label, c.clabel
      ),
      ab AS (
        SELECT vec_id, label,
               max(CASE WHEN label = clabel THEN dist END) AS a,
               min(CASE WHEN label <> clabel THEN dist END) AS b
        FROM dist GROUP BY vec_id, label
      )
      SELECT label, count(*)::BIGINT AS n_points,
             round(avg(CASE WHEN greatest(a, b) = 0 THEN 0.0
                       ELSE (b - a) / greatest(a, b) END), 6)
               AS mean_silhouette
      FROM ab GROUP BY label
      ORDER BY label
    """,
)
def embedding_centroid_silhouette(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _th(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        "label",
        F.expr(
            f"transform(embedding,"
            f" x -> cast(floor(cast(x as double) * {_SIL_Q}) as bigint))"
        ).alias("q"),
    )
    flat = q.select(
        "vec_id", "label", F.posexplode("q").alias("d", "v")
    )
    cent = flat.groupBy(F.col("label").alias("clabel"), "d").agg(
        F.sum("v").alias("s"),
        F.count_distinct("vec_id").alias("n"),
    )
    dist = (
        flat.join(F.broadcast(cent), "d")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            (
                F.sqrt(
                    F.sum(
                        (F.col("n") * F.col("v") - F.col("s"))
                        * (F.col("n") * F.col("v") - F.col("s"))
                    ).cast("double")
                )
                / F.max("n")
            ).alias("dist")
        )
    )
    ab = dist.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("label") == F.col("clabel"), F.col("dist"))
        ).alias("a"),
        F.min(
            F.when(F.col("label") != F.col("clabel"), F.col("dist"))
        ).alias("b"),
    )
    # singleton-label guard (a = b = 0): classic silhouette defines
    # s = 0 there; an unguarded 0/0 would be NaN-vs-error cross-engine
    s = F.when(
        F.greatest(F.col("a"), F.col("b")) == 0, F.lit(0.0)
    ).otherwise(
        (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b"))
    )
    return (
        ab.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.round(F.avg(s), 6).alias("mean_silhouette"),
        )
        .orderBy("label")
    )


# -------------------------------------- calibration reliability bins


@register(
    "eval_calibration_reliability_bins",
    "Calibration reliability diagram for the quality scorer — per "
    "fixed-width score decile, mean predicted probability vs observed "
    "outcome rate (outcome: the >=150-token rule, the same ground "
    "truth quality_score_confusion_eval tests against) plus the "
    "signed gap: the 'is the score a probability or just a ranking' "
    "check every model-based filter needs. FIXED bins (floor(score*"
    "10)), never ntile — no global sort, and the binning is "
    "IEEE-deterministic on both engines (identical double ops on "
    "identical inputs); counts are exact integers. 100 TB: one scan, "
    "one map-side-combinable 10-group agg.",
    oracle="""
      WITH t AS (
        SELECT doc_id, text,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents
      ),
      f AS (
        SELECT doc_id,
               len(list_distinct(toks))::DOUBLE / nullif(len(toks), 0)
                 AS distinct_ratio,
               list_sum(list_transform(toks, x -> len(x)))::DOUBLE
                 / nullif(len(toks), 0) AS mean_len,
               len(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
                 / nullif(len(text), 0) AS digit_frac,
               ln(len(toks) + 1) AS ln_n,
               CASE WHEN len(toks) >= 150 THEN 1 ELSE 0 END AS outcome
        FROM t WHERE len(toks) > 0
      ),
      s AS (
        SELECT outcome,
               1.0 / (1.0 + exp(-(-2.0 + 3.0 * distinct_ratio
                     + 0.4 * mean_len + -6.0 * digit_frac
                     + 0.35 * ln_n))) AS score
        FROM f
      )
      SELECT least(floor(score * 10), 9)::BIGINT AS bin,
             count(*)::BIGINT AS n_docs,
             sum(outcome)::BIGINT AS n_positive,
             round(avg(score), 6) AS mean_score,
             round(sum(outcome)::DOUBLE / count(*), 6) AS obs_rate,
             round(avg(score) - sum(outcome)::DOUBLE / count(*), 6)
               AS calibration_gap
      FROM s
      GROUP BY 1
      ORDER BY bin
    """,
)
def eval_calibration_reliability_bins(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.inventory.quality_ops import _QW, _TOK

    d = _th(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_TOK), 0)
    t = d.select("doc_id", "text", toks.alias("toks")).where(
        F.size("toks") > 0
    )
    n = F.size("toks").cast("double")
    distinct_ratio = F.size(F.array_distinct("toks")).cast("double") / n
    mean_len = (
        F.aggregate(
            "toks", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).cast("double")
        / n
    )
    digit_frac = (
        F.length(F.regexp_replace("text", "[^0-9]", "")).cast("double")
        / F.length("text")
    )
    ln_n = F.log(n + 1)
    z = (
        F.lit(_QW[0])
        + F.lit(_QW[1]) * distinct_ratio
        + F.lit(_QW[2]) * mean_len
        + F.lit(_QW[3]) * digit_frac
        + F.lit(_QW[4]) * ln_n
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    s = t.select(
        score.alias("score"),
        (F.size("toks") >= 150).cast("int").alias("outcome"),
    )
    return (
        s.groupBy(
            F.least(F.floor(F.col("score") * 10), F.lit(9))
            .cast("long")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("outcome").cast("long").alias("n_positive"),
            F.round(F.avg("score"), 6).alias("mean_score"),
            F.round(
                F.sum("outcome").cast("double") / F.count(F.lit(1)), 6
            ).alias("obs_rate"),
            F.round(
                F.avg("score")
                - F.sum("outcome").cast("double") / F.count(F.lit(1)),
                6,
            ).alias("calibration_gap"),
        )
        .orderBy("bin")
    )


# ----------------------------------- integer Bellman-Ford SSSP

_SSSP_ROUNDS = 3


def _sssp_oracle_sql() -> str:
    """Unrolled min-plus relaxation as chained CTEs (the BFS unroll
    discipline of insight_ops2._bfs_oracle_sql, carried to WEIGHTED
    shortest paths): d_{k+1}(v) = min(d_k(v), min over edges (u,v) of
    d_k(u) + w). Cycles make the recursive CTE inexpressible; fixed
    rounds unroll exactly."""
    ctes = []
    for k in range(1, _SSSP_ROUNDS + 1):
        prev = f"d{k-1}"
        ctes.append(
            f"""
      d{k} AS (
        SELECT node, min(dist)::BIGINT AS dist FROM (
          SELECT node, dist FROM {prev}
          UNION ALL
          SELECT e.dst AS node, p.dist + e.w AS dist
          FROM e JOIN {prev} p ON e.src = p.node
        ) GROUP BY node
      )"""
        )
    chain = ",".join(ctes)
    return f"""
      WITH e0 AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      ),
      e AS (
        SELECT src, dst, 1 + (src + dst) % 5 AS w FROM e0
        UNION ALL
        SELECT dst, src, 1 + (src + dst) % 5 AS w FROM e0
      ),
      deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY src),
      hub AS (SELECT node FROM deg ORDER BY d DESC, node LIMIT 1),
      d0 AS (SELECT node, 0::BIGINT AS dist FROM hub),{chain}
      SELECT dist, count(*)::BIGINT AS n_nodes,
             min(node)::BIGINT AS first_node
      FROM d{_SSSP_ROUNDS}
      GROUP BY dist
      ORDER BY dist
    """


@register(
    "graph_sssp_bellman_integer",
    "Weighted single-source shortest paths by distributed BELLMAN-"
    f"FORD ({_SSSP_ROUNDS} min-plus relaxation rounds from the "
    "highest-degree hub of the co-purchase graph, deterministic "
    "integer edge weights 1 + (src+dst) % 5): each round is one "
    "edges-join + min-combine — the weighted generalization of "
    "graph_bfs_levels_from_hub, oracle'd with the same fixed-round "
    "unrolled-CTE discipline (cycles bar a recursive CTE; k rounds "
    "unroll exactly; all-integer distances, no FP). The distance "
    "frame is localCheckpoint'd EVERY round (the lazy-loop replay "
    "rule). 100 TB: per round one (node, dist) shuffle bounded by "
    "|reached nodes| + one edges equi-join; rounds = graph diameter, "
    "not data size.",
    oracle=_sssp_oracle_sql(),
)
def graph_sssp_bellman_integer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.inventory.graph_ops import _degrees, _sym_edges

    # VERDICT r05 #4: the symmetrized edge frame and the degree agg
    # come from the session-cached shared graph frames; the weight
    # 1+(src+dst)%5 is symmetric in (src, dst), so applying it to the
    # shared both-directions view is identical to weighting each
    # canonical edge then flipping. The localCheckpoint stays: the
    # frame feeds every relaxation round (lazy-loop replay rule).
    w = (F.lit(1) + (F.col("src") + F.col("dst")) % 5).alias("w")
    e = _sym_edges(spark, sf_dir).select("src", "dst", w).localCheckpoint()
    deg = _degrees(spark, sf_dir)
    hub = (
        deg.orderBy(F.col("d").desc(), F.col("v"))
        .limit(1)
        .collect()[0]["v"]
    )
    dist = spark.createDataFrame(
        [(int(hub), 0)], "node long, dist long"
    )
    for _ in range(_SSSP_ROUNDS):
        # broadcast the (node, dist) state — bounded by |reached
        # nodes| (tiny vs the edge frame), so each relaxation is a
        # map-side join over the checkpointed edges instead of
        # re-shuffling them every round; at frontier sizes past
        # broadcast range this flips to a bucketed shuffle join
        relaxed = (
            e.join(F.broadcast(dist), e.src == dist.node)
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return (
        dist.groupBy("dist")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("node").cast("long").alias("first_node"),
        )
        .orderBy("dist")
    )
