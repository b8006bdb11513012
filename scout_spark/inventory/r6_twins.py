"""Round-6 oracle twins for previously rows-only families (VERDICT r05
item 5): BPE tokenizer training and SemDeDup semantic deduplication.

Both follow the established engine-exactness disciplines:

- ``bpe_train_merges_unrolled``: the BPE merge sequence is fully
  deterministic (pair-frequency argmax with lexicographic tie-break),
  so a fixed number of rounds unrolls into a DuckDB CTE chain — the
  hash_parity / HITS unrolled-twin discipline. The merge application
  (leftmost non-overlapping replace) is a ``list_reduce`` over
  singleton-wrapped symbols; it is provably identical to the greedy
  scan because a freshly merged symbol ``l||r`` can never equal ``l``
  (that would need ``r = ''``), so re-examining it as a new left edge
  cannot fire.
- ``semdedup_md5_integer_twin``: SemDeDup's engine-defined parts
  (float k-means, float cosine) are replaced by md5-seeded centroids
  (one integer-exact Lloyd ASSIGNMENT step) and an all-integer squared
  cosine threshold test: with q = floor(1000·x) per component,
  cos(a,b) >= t  ⇔  dot > 0 ∧ dot²·den² >= num²·|a|²·|b|²  for
  t = num/den — exact int64 arithmetic on both engines (bounds: dim 64,
  |q| <= 1024 ⇒ dot <= 2²⁶·2⁴ < 2³⁰, dot² · 25 < 2⁶⁵? no — dot <=
  64·1024² ≈ 2²⁶, dot² ≈ 2⁵², ·25 < 2⁵⁷ ✓). The blocked-pair /
  transitive-closure / min-id-keeper machinery — the part that must
  scale — is the same shape as operators/semdedup.py; the oracle closes
  duplicate groups with a recursive min-label CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th

# ------------------------------------------------- BPE unrolled twin

_BPE_TWIN_ROUNDS = 4


def _bpe_twin_oracle(n_rounds: int = _BPE_TWIN_ROUNDS) -> str:
    """Generate the unrolled n-round BPE training CTE chain.

    Round r: p{r} counts adjacent symbol pairs weighted by word freq,
    m{r} is the argmax merge (freq DESC, lhs, rhs — binary collation on
    [a-z0-9] tokens matches Spark), s{r} applies it via list_reduce.
    MATERIALIZED hints keep the multiply-referenced symbol tables from
    re-evaluating exponentially through the chain.
    """
    parts = [
        """
      WITH words AS MATERIALIZED (
        SELECT word, count(*)::BIGINT AS freq FROM (
          SELECT unnest(list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   t -> t != '')) AS word
          FROM documents
        ) GROUP BY word
      ),
      s0 AS MATERIALIZED (
        SELECT freq, string_split(word, '') AS syms FROM words
      )"""
    ]
    for r in range(1, n_rounds + 1):
        prev = f"s{r - 1}"
        parts.append(
            f"""
      p{r} AS (
        SELECT syms[i] AS lhs, syms[i + 1] AS rhs,
               sum(freq)::BIGINT AS pair_freq
        FROM {prev}, unnest(range(1, len(syms))) AS u(i)
        WHERE len(syms) > 1
        GROUP BY 1, 2
      ),
      m{r} AS MATERIALIZED (
        SELECT lhs, rhs, pair_freq FROM p{r}
        ORDER BY pair_freq DESC, lhs, rhs LIMIT 1
      )"""
        )
        if r < n_rounds:
            parts.append(
                f"""
      s{r} AS MATERIALIZED (
        SELECT freq,
               list_reduce(
                 list_transform(syms, s -> [s]),
                 (acc, x) -> CASE
                   WHEN acc[-1] = m{r}.lhs AND x[1] = m{r}.rhs
                   THEN list_concat(acc[:len(acc) - 1],
                                    [m{r}.lhs || m{r}.rhs])
                   ELSE list_concat(acc, x) END
               ) AS syms
        FROM {prev}, m{r}
      )"""
            )
    union = "\n        UNION ALL ".join(
        f"SELECT {r - 1} AS rank, lhs, rhs, pair_freq FROM m{r}"
        for r in range(1, n_rounds + 1)
    )
    return (
        ",".join(parts)
        + f"""
      SELECT rank::INTEGER AS rank, lhs, rhs, pair_freq
      FROM ({union})
      ORDER BY rank
    """
    )


@register(
    "bpe_train_merges_unrolled",
    "Oracle-exact BPE training twin (VERDICT r05 item 5a): the first "
    f"{_BPE_TWIN_ROUNDS} merges of operators/bpe.py::bpe_train — "
    "corpus word count, then per round an exact integer pair-frequency "
    "argmax (ties on lexicographic (lhs, rhs)) and the leftmost-non-"
    "overlapping merge application. The DuckDB oracle unrolls the "
    "rounds as a CTE chain with the merge applied by list_reduce "
    "(provably equivalent to the greedy scan: a fresh l||r symbol can "
    "never equal l). The rows-only bpe_train_merges entry keeps the "
    "12-merge production path; this twin pins the kernel cross-engine. "
    "100 TB: only the word count touches the corpus (one shuffle, "
    "map-side combine, read from the shared persisted token frame); "
    "the merge rounds run driver-side while the vocab fits "
    "driver_vocab_cap (bounded driver contraction) and as distributed "
    "pair-explode rounds with a 1-row argmax above it — both paths "
    "pinned equal in tests/test_bpe.py.",
    oracle=_bpe_twin_oracle(),
)
def bpe_train_merges_unrolled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.inventory.retrieval import _shared_word_freqs
    from scout_spark.operators.bpe import bpe_train

    d = _th(spark, sf_dir, "documents")
    merges = bpe_train(
        d,
        "text",
        n_merges=_BPE_TWIN_ROUNDS,
        word_freqs=_shared_word_freqs(spark, sf_dir),
    )
    return spark.createDataFrame(
        [(r, l, rt, f) for (r, l, rt, f) in merges],
        schema="rank int, lhs string, rhs string, pair_freq long",
    ).orderBy("rank")


# --------------------------------------------- SemDeDup integer twin

_SD_K = 8  # md5-seeded centroids (dimension-bounded, never data-sized)
_SD_SCALE = 1000  # q_i = floor(1000 * x_i): exact on IEEE doubles
# threshold t = 2/5 (0.4): chosen so the synthetic corpus actually has
# duplicate pairs (max pairwise cosine ≈ 0.51); the squared test below
# is exact for any rational t = num/den
_SD_NUM, _SD_DEN = 2, 5


def _sd_oracle() -> str:
    return f"""
      WITH RECURSIVE q AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding,
                              x -> floor(x::DOUBLE * {_SD_SCALE})::BIGINT)
                 AS qv
        FROM embeddings
      ),
      qn AS MATERIALIZED (
        SELECT vec_id, qv,
               list_sum(list_transform(qv, v -> v * v))::BIGINT AS n2
        FROM q
      ),
      seeds AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id)
                 AS cid,
               qv AS cv, n2 AS cn2
        FROM qn
        ORDER BY md5(vec_id::VARCHAR), vec_id
        LIMIT {_SD_K}
      ),
      assigned AS MATERIALIZED (
        SELECT vec_id, qv, n2,
               -- (dist2, cid) lex argmin packed into one int64 key:
               -- cid in 1..{_SD_K} < 16, so dist2*16+cid preserves the
               -- tie-break exactly (matches Spark's min(struct))
               arg_min(cid, dist2 * 16 + cid) AS cluster
        FROM (
          SELECT qn.vec_id, qn.qv, qn.n2, s.cid,
                 qn.n2
                 - 2 * list_sum(list_transform(range(1, len(qn.qv) + 1),
                                               i -> qn.qv[i] * s.cv[i]))::BIGINT
                 + s.cn2 AS dist2
          FROM qn CROSS JOIN seeds s
        )
        GROUP BY vec_id, qv, n2
      ),
      dup_edges AS MATERIALIZED (
        SELECT a.vec_id AS ea, b.vec_id AS eb
        FROM assigned a JOIN assigned b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE list_sum(list_transform(range(1, len(a.qv) + 1),
                                      i -> a.qv[i] * b.qv[i]))::BIGINT > 0
          AND {_SD_DEN} * {_SD_DEN}
              * list_sum(list_transform(range(1, len(a.qv) + 1),
                                        i -> a.qv[i] * b.qv[i]))::BIGINT
              * list_sum(list_transform(range(1, len(a.qv) + 1),
                                        i -> a.qv[i] * b.qv[i]))::BIGINT
              >= {_SD_NUM} * {_SD_NUM} * a.n2 * b.n2
      ),
      und AS (
        SELECT ea AS s, eb AS d FROM dup_edges
        UNION ALL SELECT eb, ea FROM dup_edges
      ),
      nodes AS (SELECT DISTINCT s AS id FROM und),
      reach AS (
        SELECT id, id AS lab FROM nodes
        UNION
        SELECT u.d AS id, r.lab FROM reach r JOIN und u ON u.s = r.id
      ),
      comp AS (SELECT id, min(lab) AS keeper FROM reach GROUP BY id)
      SELECT a.cluster::BIGINT AS cluster,
             count(*)::BIGINT AS n_vecs,
             coalesce(sum(CASE WHEN c.keeper IS NOT NULL
                                AND c.keeper <> a.vec_id
                               THEN 1 END), 0)::BIGINT AS n_dropped,
             count(DISTINCT CASE WHEN c.keeper IS NOT NULL
                                  AND c.keeper <> a.vec_id
                                 THEN c.keeper END)::BIGINT
               AS n_dup_groups
      FROM assigned a LEFT JOIN comp c ON c.id = a.vec_id
      GROUP BY a.cluster
      ORDER BY cluster
    """


@register(
    "semdedup_md5_integer_twin",
    "Oracle-exact SemDeDup twin (VERDICT r05 item 5b; Abbas et al. "
    "arXiv:2303.09540): md5-seeded centroids (the k vectors with "
    "smallest md5(vec_id), one integer-exact Lloyd assignment by "
    "squared L2 over floor(1000x) codes, tie-break on centroid id), "
    "then the SemDeDup machinery unchanged in shape — within-cluster "
    "pair generation ONLY (blocked quadratic), an all-integer squared "
    "cosine threshold (t=2/5: 25·dot² >= 4·|a|²·|b|² with dot>0), "
    "transitive closure to a min-id keeper per duplicate ball "
    "(per-cluster numpy int64 matmul + union-find inside ONE "
    "applyInPandas pass vs the oracle's recursive min-label CTE — "
    "independent formulations; dup edges never span clusters, so "
    "global closure == per-cluster closure), per-cluster keep/drop "
    "report. The float k-means production path stays in "
    "semdedup_embedding_prune (rows-only); this twin pins the blocking "
    "+ closure + keeper semantics cross-engine. 100 TB: centroid table "
    "is k rows (broadcast is dimension-bounded); the cluster is "
    "SemDeDup's unit of work by construction (k grows with the corpus, "
    "cluster size stays Arrow-batch-bounded), so the quadratic scan + "
    "closure run vectorized inside each cluster with one shuffle.",
    oracle=_sd_oracle(),
)
def semdedup_md5_integer_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    qv = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * _SD_SCALE).cast("bigint"),
    )
    qn = e.select(
        "vec_id",
        qv.alias("qv"),
    ).withColumn(
        "n2",
        F.aggregate(
            F.zip_with("qv", "qv", lambda a, b: a * b),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ),
    )
    seeds = (
        qn.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(_SD_K)
        .select(
            F.row_number()
            .over(
                # k-row frame only (LIMIT-bounded): never data-sized
                Window.orderBy(
                    F.md5(F.col("vec_id").cast("string")), "vec_id"
                )
            )
            .alias("cid"),
            F.col("qv").alias("cv"),
            F.col("n2").alias("cn2"),
        )
    )
    dot_qc = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    # centroid broadcast is k=8 rows — dimension-bounded, safe at any sf
    assigned = (
        qn.crossJoin(F.broadcast(seeds))
        .withColumn(
            "dist2", F.col("n2") - 2 * dot_qc + F.col("cn2")
        )
        .groupBy("vec_id")
        .agg(
            F.first("qv").alias("qv"),
            F.first("n2").alias("n2"),
            F.min(F.struct("dist2", "cid")).alias("_m"),
        )
        .select("vec_id", "qv", "n2", F.col("_m.cid").alias("cluster"))
    )

    def _close(pdf):
        # one cluster per Arrow batch: quadratic scan as an exact
        # int64 matmul (bounds proven in the module docstring — no
        # wraparound), then union-find to the min-id keeper. numpy
        # int64 == Spark/DuckDB BIGINT arithmetic, bit-for-bit.
        import numpy as np
        import pandas as pd

        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        q = np.asarray(pdf["qv"].to_numpy()[order].tolist(), dtype=np.int64)
        n2 = pdf["n2"].to_numpy()[order].astype(np.int64)
        # numpy int64 wraps SILENTLY on overflow (unlike Spark ANSI /
        # DuckDB BIGINT, which raise) — enforce the docstring's
        # no-overflow bound here: 25·(dim·B²)² < 2⁶³ needs B ≤ 3079
        # at dim 64. Regenerated testdata with wider components must
        # fail loudly, not produce wrong keeper sets.
        if q.size and int(np.abs(q).max()) > 3079:
            raise ValueError(
                "semdedup twin: |q| max "
                f"{int(np.abs(q).max())} exceeds the int64 "
                "no-overflow bound 3079 (component |x| > 3.079)"
            )
        g = q @ q.T
        iu = np.triu_indices(len(ids), 1)
        d = g[iu]
        hit = (d > 0) & (
            (_SD_DEN * _SD_DEN) * d * d
            >= (_SD_NUM * _SD_NUM) * n2[iu[0]] * n2[iu[1]]
        )
        parent = np.arange(len(ids))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a_i, b_i in zip(iu[0][hit], iu[1][hit]):
            ra, rb = find(a_i), find(b_i)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(i) for i in range(len(ids))])
        in_edge = np.zeros(len(ids), dtype=bool)
        in_edge[iu[0][hit]] = True
        in_edge[iu[1][hit]] = True
        # ids ascend with index, so the root index is the min vec_id
        keeper = pd.array(ids[roots], dtype="Int64")
        keeper[~in_edge] = pd.NA
        return pd.DataFrame(
            {
                "cluster": pdf["cluster"].to_numpy()[order],
                "vec_id": ids,
                "keeper": keeper,
            }
        )

    comp = assigned.groupBy("cluster").applyInPandas(
        _close, "cluster int, vec_id bigint, keeper bigint"
    )
    dropped = F.col("keeper").isNotNull() & (
        F.col("keeper") != F.col("vec_id")
    )
    return (
        comp.groupBy(F.col("cluster").cast("bigint").alias("cluster"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.coalesce(
                F.sum(F.when(dropped, 1)), F.lit(0)
            ).cast("bigint").alias("n_dropped"),
            F.countDistinct(F.when(dropped, F.col("keeper")))
            .cast("bigint")
            .alias("n_dup_groups"),
        )
        .orderBy("cluster")
    )
