"""Round-5 closing entries: int8 quantization distortion and LPA
community modularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th
from scout_spark.inventory.graph_ops import _EDGES_SQL


@register(
    "embedding_quantization_distortion",
    "Int8 quantization DISTORTION audit — the storage-tradeoff number "
    "the ANN int8 family needs next to its recall: per-label "
    "reconstruction MSE, worst absolute error, and mean cosine "
    "similarity between each vector and its dequantized self. Codes "
    "use the SQL-expressible symmetric form of ann_int8_codes "
    "(sign * min(floor(|x|/s*127 + 0.5), 127) on the corpus-max "
    "scale — floor on bit-identical doubles, not np.rint's "
    "half-to-even); reconstruction c*s/127 and the error folds are "
    "sequential IEEE ops over 64 dims, identical on both engines, "
    "rounded 6dp after the per-label average. 100 TB: one scan for "
    "the scale (broadcast back), one joinless scan for the per-"
    "vector errors, one dimension-bounded agg.",
    oracle="""
      WITH s AS (
        SELECT max(list_max(list_transform(embedding,
                                           x -> abs(x::DOUBLE)))) AS s
        FROM embeddings
      ),
      per AS (
        SELECT e.label,
               list_sum(list_transform(e.embedding, x ->
                 (x::DOUBLE - (CASE WHEN x >= 0
                    THEN least(floor(x::DOUBLE / s.s * 127.0 + 0.5), 127)
                    ELSE -least(floor(-(x::DOUBLE) / s.s * 127.0 + 0.5),
                                127) END) * s.s / 127.0)
                 * (x::DOUBLE - (CASE WHEN x >= 0
                    THEN least(floor(x::DOUBLE / s.s * 127.0 + 0.5), 127)
                    ELSE -least(floor(-(x::DOUBLE) / s.s * 127.0 + 0.5),
                                127) END) * s.s / 127.0)))
                 / len(e.embedding) AS mse,
               list_max(list_transform(e.embedding, x ->
                 abs(x::DOUBLE - (CASE WHEN x >= 0
                    THEN least(floor(x::DOUBLE / s.s * 127.0 + 0.5), 127)
                    ELSE -least(floor(-(x::DOUBLE) / s.s * 127.0 + 0.5),
                                127) END) * s.s / 127.0))) AS maxerr
        FROM embeddings e, s
      )
      SELECT label, count(*)::BIGINT AS n_vectors,
             round(avg(mse), 6) AS avg_mse,
             round(max(maxerr), 6) AS max_abs_err
      FROM per GROUP BY label
      ORDER BY label
    """,
)
def embedding_quantization_distortion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _th(spark, sf_dir, "embeddings")
    s = e.agg(
        F.max(
            F.expr(
                "array_max(transform(embedding,"
                " x -> abs(cast(x as double))))"
            )
        ).alias("s")
    )
    recon_err = (
        "transform(embedding, x -> cast(x as double)"
        " - (CASE WHEN x >= 0"
        "    THEN least(floor(cast(x as double) / s * 127.0 + 0.5), 127)"
        "    ELSE -least(floor(-cast(x as double) / s * 127.0 + 0.5),"
        "                127) END) * s / 127.0)"
    )
    per = e.crossJoin(F.broadcast(s)).select(
        "label",
        F.expr(
            f"aggregate({recon_err}, cast(0.0 as double),"
            " (acc, d) -> acc + d * d) / size(embedding)"
        ).alias("mse"),
        F.expr(
            f"array_max(transform({recon_err}, d -> abs(d)))"
        ).alias("maxerr"),
    )
    return (
        per.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.round(F.avg("mse"), 6).alias("avg_mse"),
            F.round(F.max("maxerr"), 6).alias("max_abs_err"),
        )
        .orderBy("label")
    )


@register(
    "graph_modularity_lpa_partition",
    "Newman MODULARITY of the 2-round label-propagation partition — "
    "the 'was the community detection any good' score the LPA entry "
    "needs next to its community sizes: Q = sum over communities of "
    "(e_c/m - (d_c/2m)^2), with intra-community edge counts e_c, "
    "community degree sums d_c, and edge count m all EXACT integers "
    "(only the final per-community terms are doubles, summed over "
    "the bounded community frame and rounded 6dp). The labels "
    "reproduce graph_label_propagation's deterministic two-round "
    "vote exactly, so both engines score the identical partition. "
    "100 TB: the vote is the Pregel shape the LPA entry times; "
    "scoring adds two broadcast label joins + dimension-bounded "
    "aggs.",
    oracle=f"""
      WITH e0 AS ({_EDGES_SQL}),
      und AS (
        SELECT src, dst FROM e0
        UNION ALL
        SELECT dst AS src, src AS dst FROM e0
      ),
      l1 AS (SELECT dst AS v, min(src) AS lbl FROM und GROUP BY dst),
      cnt AS (
        SELECT u.dst AS v, l.lbl, count(*) AS c
        FROM und u JOIN l1 l ON u.src = l.v
        GROUP BY u.dst, l.lbl
      ),
      pick AS (
        SELECT v, lbl FROM (
          SELECT v, lbl,
                 row_number() OVER (PARTITION BY v
                                    ORDER BY c DESC, lbl) AS rn
          FROM cnt) _r
        WHERE rn = 1
      ),
      m AS (SELECT count(*)::BIGINT AS m FROM e0),
      deg AS (SELECT src AS v, count(*)::BIGINT AS d FROM und GROUP BY src),
      intra AS (
        SELECT pa.lbl, count(*)::BIGINT AS ec
        FROM e0 JOIN pick pa ON e0.src = pa.v
                JOIN pick pb ON e0.dst = pb.v
        WHERE pa.lbl = pb.lbl
        GROUP BY pa.lbl
      ),
      dsum AS (
        SELECT p.lbl, sum(deg.d)::BIGINT AS dc
        FROM deg JOIN pick p ON deg.v = p.v
        GROUP BY p.lbl
      ),
      terms AS (
        SELECT ds.lbl,
               coalesce(i.ec, 0)::DOUBLE / m.m
               - (ds.dc::DOUBLE / (2 * m.m))
                 * (ds.dc::DOUBLE / (2 * m.m)) AS q
        FROM dsum ds LEFT JOIN intra i ON ds.lbl = i.lbl CROSS JOIN m
      )
      SELECT (SELECT count(*) FROM terms)::BIGINT AS n_communities,
             (SELECT m FROM m) AS n_edges,
             (SELECT coalesce(sum(ec), 0) FROM intra)::BIGINT
               AS n_intra_edges,
             round(sum(q), 6) AS modularity
      FROM terms
    """,
)
def graph_modularity_lpa_partition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.inventory.graph_ops import _edges

    e0 = _edges(spark, sf_dir).localCheckpoint()  # edges feed und,
    # the intra join, and m — three overlapping consumers
    und = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    l1 = und.groupBy(F.col("dst").alias("v")).agg(
        F.min("src").alias("lbl")
    )
    cnt = (
        und.join(l1, und.src == l1.v)
        .groupBy(F.col("dst").alias("node"), "lbl")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pick = (
        cnt.groupBy("node")
        .agg(
            F.max_by("lbl", F.struct(F.col("c"), (-F.col("lbl")))).alias(
                "lbl"
            )
        )
        .localCheckpoint()  # labels feed two edge joins + the degree join
    )
    m = e0.agg(F.count(F.lit(1)).alias("m"))
    deg = und.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("d")
    )
    pa = pick.select(F.col("node").alias("src"), F.col("lbl").alias("la"))
    pb = pick.select(F.col("node").alias("dst"), F.col("lbl").alias("lb"))
    # pick is the |V|-sized label assignment (|parts| here, grows with
    # SF): hints hold while it fits the broadcast budget; past that
    # drop them — the label attach flips to shuffle joins on the
    # node-keyed edge frame.
    intra = (
        e0.join(F.broadcast(pa), "src")
        .join(F.broadcast(pb), "dst")
        .where(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("lbl"))
        .agg(F.count(F.lit(1)).cast("long").alias("ec"))
    )
    dsum = (
        deg.join(
            F.broadcast(pick.select(F.col("node").alias("v"), "lbl")), "v"
        )
        .groupBy("lbl")
        .agg(F.sum("d").cast("long").alias("dc"))
    )
    terms = (
        dsum.join(intra, "lbl", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "lbl",
            (
                F.coalesce(F.col("ec"), F.lit(0)).cast("double")
                / F.col("m")
                - (F.col("dc").cast("double") / (2 * F.col("m")))
                * (F.col("dc").cast("double") / (2 * F.col("m")))
            ).alias("q"),
            F.coalesce(F.col("ec"), F.lit(0)).alias("ec"),
        )
    )
    return (
        terms.agg(
            F.count(F.lit(1)).cast("long").alias("n_communities"),
            F.sum("ec").cast("long").alias("n_intra_edges"),
            F.round(F.sum("q"), 6).alias("modularity"),
        )
        .crossJoin(F.broadcast(m))
        .select(
            "n_communities",
            F.col("m").cast("long").alias("n_edges"),
            "n_intra_edges",
            "modularity",
        )
    )
