"""Round-5 twentieth wave: engine-exact HITS hubs/authorities."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t

# the L1-norm step computes raw * SCALE, and raw <= max_degree * SCALE
# after a propagation — so SCALE^2 * max_degree must stay under 2^63.
# 5e7 gives (5e7)^2 * 600 ~ 1.5e18 at sf0.1 degrees, with 5e7 parts-
# per-total precision (plenty for a ranking twin).
_HITS_SCALE = 5 * 10**7
_HITS_ITERS = 3


def _hits_oracle_sql() -> str:
    """Unrolled fixed-iteration integer HITS as chained CTEs — the
    graph_pagerank_integer_fixedpoint discipline applied to the
    Kleinberg mutual-reinforcement iteration on the order-part
    bipartite graph. L1 normalization (score * SCALE // sum) replaces
    the classic L2 (sqrt is not integer-exact); both engines floor-
    divide non-negative integers, so every score is engine-exact."""
    steps = []
    prev_h = "h0"
    for k in range(1, _HITS_ITERS + 1):
        steps.append(
            f"""
      ar{k} AS (
        SELECT i.p, sum(h.s)::BIGINT AS s
        FROM inc i JOIN {prev_h} h ON h.o = i.o
        GROUP BY i.p
      ),
      a{k} AS (
        SELECT p, (s * {_HITS_SCALE} // (SELECT sum(s) FROM ar{k}))::BIGINT
                 AS s
        FROM ar{k}
      ),
      hr{k} AS (
        SELECT i.o, sum(a.s)::BIGINT AS s
        FROM inc i JOIN a{k} a ON a.p = i.p
        GROUP BY i.o
      ),
      h{k} AS (
        SELECT o, (s * {_HITS_SCALE} // (SELECT sum(s) FROM hr{k}))::BIGINT
                 AS s
        FROM hr{k}
      )"""
        )
        prev_h = f"h{k}"
    chain = ",".join(steps)
    return f"""
      WITH inc AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
      ),
      orders_n AS (SELECT count(DISTINCT o)::BIGINT AS n FROM inc),
      h0 AS (
        SELECT DISTINCT o, ({_HITS_SCALE} // (SELECT n FROM orders_n))
                 ::BIGINT AS s
        FROM inc
      ),{chain}
      SELECT p::BIGINT AS part, s AS authority_scaled
      FROM a{_HITS_ITERS}
      ORDER BY s DESC, p
      LIMIT 10
    """


@register(
    "graph_hits_integer_authorities",
    "Engine-exact HITS (Kleinberg hubs-and-authorities) on the "
    "order-part bipartite graph — 'which parts anchor the biggest "
    f"baskets': {_HITS_ITERS} fixed mutual-reinforcement rounds "
    "(authority = sum of incident hub scores, hub = sum of incident "
    "authorities) in SCALED-INTEGER arithmetic with L1 normalization "
    "(x * SCALE // sum — the L2 of the classic needs sqrt, which is "
    "not integer-exact), so Spark and the unrolled-CTE DuckDB twin "
    "produce bit-identical authority scores: the PageRank-twin "
    "discipline extended to a second iterative algorithm. Spark: "
    "incidences checkpointed once; per-round broadcast of the slim "
    "score frame; per-round checkpoint (the lazy-loop broadcast "
    "rule). The normalizing sum is a 1-row agg crossJoin-broadcast, "
    "never a global window. 100 TB: one (node, contribution) "
    "shuffle per half-round, same as PageRank.",
    oracle=_hits_oracle_sql(),
)
def graph_hits_integer_authorities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    inc = (
        li.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint()
    )
    n_orders = inc.select("o").distinct().count()  # bounded driver scalar
    h = (
        inc.select("o")
        .distinct()
        .select("o", F.lit(_HITS_SCALE // n_orders).cast("long").alias("s"))
    )

    def l1_norm(df: DataFrame, key: str) -> DataFrame:
        tot = df.agg(F.sum("s").alias("tot"))
        return (
            df.crossJoin(F.broadcast(tot))
            .select(
                key,
                F.expr(f"s * {_HITS_SCALE} div tot").cast("long").alias("s"),
            )
        )

    a = None
    # h / a are node-score frames (|orders| / |parts|-sized, grow with
    # SF): the hints hold while a side fits the broadcast budget; past
    # that drop them — inc is the persisted incidence frame and each
    # round becomes a shuffle-hash join keyed on o / p.
    for _ in range(_HITS_ITERS):
        ar = (
            inc.join(F.broadcast(h), "o")
            .groupBy("p")
            .agg(F.sum("s").alias("s"))
        )
        a = l1_norm(ar, "p").localCheckpoint()
        hr = (
            inc.join(F.broadcast(a), "p")
            .groupBy("o")
            .agg(F.sum("s").alias("s"))
        )
        h = l1_norm(hr, "o").localCheckpoint()
    return (
        a.orderBy(F.col("s").desc(), "p")
        .limit(10)
        .select(
            F.col("p").cast("long").alias("part"),
            F.col("s").alias("authority_scaled"),
        )
    )
