"""Deduplication operators for the training-data pipeline (build-brief
extensions; generalize the reference's filter-then-verify core,
SURVEY.md §4 O7, to n×m near-dup scale).

Scale design:
  - exact: hash-groupBy — one shuffle on the fingerprint, map-side
    partial agg makes the shuffle tiny when dup rate is low.
  - MinHash-LSH: signatures computed row-local in the scan stage (no
    explode shuffle — array higher-order functions); only (band, bucket)
    pairs shuffle; verify joins arrays back per candidate pair.
  - SimHash: Arrow-batched pandas UDF (numpy bit-voting), then banding.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from scout_spark.functions.text import word_shingles


def exact_dedup(df: DataFrame, id_col: str, key: Column) -> DataFrame:
    """Keep the lowest id per exact-duplicate group. Returns
    (fingerprint, keeper id, group_size)."""
    return (
        df.select(F.col(id_col), key.alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias(f"keeper_{id_col}"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def _minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """array<int> of k min-hashes via seeded murmur3 over the shingle
    array — one fold pass, row-local (no explode, no shuffle).

    Single-pass matters: emitting k separate array_min(transform(...))
    columns re-inlines the whole shingle expression tree k times and
    blows up codegen (measured 7× slower). Here each shingle is hashed
    into a k-vector once and folded with an elementwise min.

    NOTE: higher-order functions run interpreted (outside whole-stage
    codegen); the Arrow path (``_minhash_signature_udf``) is ~5× faster
    and is the default in ``minhash_lsh_pairs``. This expression form is
    kept for UDF-free deployments (impl='sql').
    """

    def _hash_vector(s: Column) -> Column:
        return F.array(
            *[F.hash(F.concat(F.lit(f"{h}|"), s)) for h in range(num_hashes)]
        )

    return F.aggregate(
        F.transform(shingles, _hash_vector),
        F.array(*[F.lit(2147483647)] * num_hashes),
        lambda acc, x: F.zip_with(acc, x, lambda a, b: F.least(a, b)),
    )


_MERSENNE61 = (1 << 61) - 1


def _minhash_signature_udf(num_hashes: int, shingle_k: int):
    """Arrow-batched minhash, fully vectorized: ONE pandas
    ``hash_array`` call hashes every token of the batch (C-level
    SipHash with a fixed key — deterministic across executors and runs,
    no PYTHONHASHSEED), a numpy rolling polynomial combines consecutive
    token hashes into shingle hashes (no per-shingle string
    allocation), then universal hashing ((a·h + b) mod 2^61-1) and a
    column-wise min yield the signature."""
    import numpy as np

    a = (np.arange(1, num_hashes + 1, dtype=np.uint64) * 2 + 1) * np.uint64(
        0x9E3779B97F4A7C15
    ) % np.uint64(_MERSENNE61)
    b = (np.arange(num_hashes, dtype=np.uint64) + 1) * np.uint64(
        0xC2B2AE3D27D4EB4F
    ) % np.uint64(_MERSENNE61)

    # per-window-position multipliers for the rolling shingle hash:
    # shingle_hash[i] = Σ_j token_hash[i+j]·P[j] mod 2^61-1 — combining
    # precomputed token hashes with one vectorized numpy pass instead of
    # allocating+encoding+crc32-ing a joined string per shingle
    # (measured ~2× on the signature stage at 5k docs).
    pos_mult = (
        np.arange(1, shingle_k + 1, dtype=np.uint64) * 2 + 1
    ) * np.uint64(0xD6E8FEB86659FD93) % np.uint64(_MERSENNE61)

    @F.pandas_udf("array<long>")
    def _sig(texts: pd.Series) -> pd.Series:
        # one flat token array per Arrow batch → one C-level hash pass
        flat: list[str] = []
        offsets = [0]
        for text in texts:
            flat.extend((text or "").split())
            offsets.append(len(flat))
        if flat:
            th_all = pd.util.hash_array(
                np.asarray(flat, dtype=object)
            ).astype(np.uint64)
        else:
            th_all = np.empty(0, dtype=np.uint64)
        sentinel = np.full(num_hashes, _MERSENNE61 - 1, dtype=np.int64)
        out = []
        for d in range(len(texts)):
            th = th_all[offsets[d] : offsets[d + 1]]
            if th.size == 0:
                # no tokens → sentinel max-signature; such docs are
                # excluded from banding anyway (empty∩empty is not a dup)
                out.append(sentinel)
                continue
            w = min(shingle_k, th.size)
            n_sh = th.size - w + 1
            acc = np.zeros(n_sh, dtype=np.uint64)
            for j in range(w):
                acc = (acc + th[j : j + n_sh] * pos_mult[j]) % np.uint64(
                    _MERSENNE61
                )
            h = np.unique(acc)
            # (n_shingles, num_hashes) universal hashes → min per column
            m = (h[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE61)
            out.append(m.min(axis=0).astype(np.int64))
        return pd.Series(out)

    return _sig


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    shingle_k: int = 3,
    impl: str = "arrow",
) -> DataFrame:
    """MinHash + LSH-banding near-duplicate pairs, verified by exact
    Jaccard over distinct shingle sets.

    Pipeline: shingle → k row-local minhashes (computed ONCE per row) →
    ``bands`` band keys → explode to (band_idx, band_hash) → groupBy
    band bucket, in-bucket ordered pairs (candidate generation — the
    only shuffle, single-sided) → exact Jaccard verify → filter ≥
    threshold. Probability a pair with Jaccard j collides in ≥1 band:
    1-(1-j^r)^b with r = num_hashes/bands.

    ``impl='arrow'`` (default) computes signatures in a vectorized
    pandas UDF (~5× faster than the interpreted higher-order-function
    expression); ``impl='sql'`` stays pure-JVM.
    """
    if bands > num_hashes or num_hashes % bands != 0:
        # bands > num_hashes → rows_per_band 0 → every row hashes the
        # same empty slice → one global bucket → O(n²) self-join; a
        # remainder silently drops trailing hashes and changes the
        # 1-(1-j^r)^b collision probability
        raise ValueError(
            f"num_hashes ({num_hashes}) must be a positive multiple of "
            f"bands ({bands})"
        )
    rows_per_band = num_hashes // bands
    sh = F.array_distinct(word_shingles(F.col(text_col), shingle_k))
    if impl == "arrow":
        sig_udf = _minhash_signature_udf(num_hashes, shingle_k)
        mh = sig_udf(F.col(text_col))
    else:
        mh = _minhash_signature(sh, num_hashes)
    # signatures only — shingle arrays are computed later, and ONLY for
    # ids that survive candidate generation (on a low-dup corpus this
    # skips the expensive shingle expression for almost every row).
    # Tokenless docs are excluded up front: they all share the sentinel
    # signature, which at scale is one giant bucket (a skew bomb whose
    # b² pairs the Jaccard verify would drop anyway — empty∩empty is
    # NULL, not a dup).
    sig = df.where(F.trim(F.col(text_col)) != "").select(
        F.col(id_col), mh.alias("mh")
    )
    # band bucket = hash of the band's slice of the signature; explode to
    # (id, band_idx, bucket) WITHOUT the shingle payload so the only
    # shuffle moves (id, two ints). Candidates come from a SINGLE-SIDED
    # groupBy per bucket (ids list → in-bucket ordered pairs), not a
    # band self-join — the round-1 self-join instantiated the signature
    # UDF on both sides and recomputed every signature twice.
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.hash(
                            F.slice(F.col("mh"), b * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.bucket")
    buckets = (
        banded.groupBy("band_idx", "bucket")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .where(F.size("ids") > 1)
    )

    def _pairs_from(ids: Column) -> Column:
        # ordered pairs (ids[i], ids[j]) for i<j via nested transform —
        # pure JVM expression, one row per candidate pair after explode
        return F.flatten(
            F.transform(
                ids,
                lambda x, i: F.transform(
                    F.slice(ids, i + 2, F.size(ids)),
                    lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                ),
            )
        )
    cand = (
        buckets.select(F.explode(_pairs_from(F.col("ids"))).alias("p"))
        .select("p.id_a", "p.id_b")
        .dropDuplicates(["id_a", "id_b"])
        # the candidate pair list feeds FIVE overlapping consumers
        # (both cand_ids union branches x the two shingle_sets join
        # sides + the final pair join) — without a barrier each one
        # re-evaluates the whole signature pipeline, re-running the
        # Arrow kernel over the corpus 5x (r7 plan audit). The lazy
        # checkpoint materializes the SMALL pair list once.
        .localCheckpoint(eager=False)
    )
    # verify: compute distinct shingle sets ONLY for candidate ids (semi
    # join first), then exact Jaccard per pair.
    cand_ids = (
        cand.select(F.col("id_a").alias("_cid"))
        .unionAll(cand.select(F.col("id_b").alias("_cid")))
        .distinct()
    )
    shingle_sets = (
        df.join(cand_ids, F.col(id_col) == F.col("_cid"), "left_semi")
        .select(F.col(id_col), sh.alias("shingles"))
        # consumed by both the id_a and id_b join sides: candidate-
        # bounded rows, one shingle evaluation instead of two
        .localCheckpoint(eager=False)
    )
    cand = cand.join(
        shingle_sets.withColumnRenamed(id_col, "id_a").withColumnRenamed(
            "shingles", "sh_a"
        ),
        "id_a",
    ).join(
        shingle_sets.withColumnRenamed(id_col, "id_b").withColumnRenamed(
            "shingles", "sh_b"
        ),
        "id_b",
    )
    isect = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    # try_divide: empty shingle sets give a 0 divisor (ANSI aborts);
    # NULL fails the threshold filter, matching "empty docs are not dups"
    jac = F.try_divide(isect.cast("double"), F.size("sh_a") + F.size("sh_b") - isect)
    return cand.where(jac >= threshold).select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        F.round(jac, 6).alias("jaccard"),
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    tokens: Column,
    block_on: dict[str, Column],
    threshold: float,
) -> DataFrame:
    """Exact distinct-token Jaccard over pairs sharing a blocking key —
    the oracle-expressible near-dup baseline (blocked self-join).
    ``block_on``: name → blocking-key expression (names become join
    columns).

    Two physical choices measured at sf0.1 (314k candidate pairs,
    local[32]): (1) tokens are xxhash64-hashed per doc BEFORE the
    self-join, so the per-pair intersection runs over long arrays
    instead of string arrays (no per-element string hashing/equality
    inside the join filter: 5.1s → 2.0s; a 64-bit collision inside one
    pair's union — probability ~1e-17 — is the only way this differs
    from string intersection). (2) both sides are hash-partitioned on
    the blocking key to the session's default parallelism before the
    join: the candidate-evaluation stage is the hot loop and would
    otherwise inherit the (low) shuffle-partition setting tuned for
    point queries (2.0s → 0.9s). Skewed blocks are the residual risk
    at 100 TB — cap block size upstream (finer bkt) or salt."""
    spark = df.sparkSession
    d = df.select(
        F.col(id_col),
        *[c.alias(n) for n, c in block_on.items()],
        F.array_distinct(tokens).alias("toks"),
    )

    def _h(t):
        return F.xxhash64(t)

    dh = d.select(
        F.col(id_col),
        *[F.col(n) for n in block_on],
        F.size("toks").alias("n_toks"),
        F.array_sort(F.transform("toks", _h)).alias("h"),
    ).repartition(spark.sparkContext.defaultParallelism, *block_on.keys())
    a, b = dh.alias("a"), dh.alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for n in block_on:
        cond = cond & (F.col(f"a.{n}") == F.col(f"b.{n}"))
    isect = F.size(F.array_intersect(F.col("a.h"), F.col("b.h")))
    jac = F.try_divide(
        isect.cast("double"),
        F.col("a.n_toks") + F.col("b.n_toks") - isect,
    )
    return (
        a.join(b, cond)
        .where(jac >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 20,
    fuse: int = 2,
    delta_after: int = 8,
    broadcast_frontier_below: int = 2_000_000,
) -> DataFrame:
    """Connected components over near-dup pair edges → (id, component)
    with component = smallest reachable id. Turns pairwise matches into
    transitive dedup groups (A~B, B~C ⇒ {A,B,C} share one keeper).

    Iterative min-label propagation: each round every node adopts the
    minimum label among its neighbors; converges in O(diameter) rounds.
    (The label-propagation join shape is the standard scalable CC
    formulation for Spark; GraphX/GraphFrames are not available in
    pure-PySpark deployments.) Two execution phases, both measured
    (PLANS.md round-3 section):

    **Phase 1 — fused full rounds** (first ``delta_after``
    materializations). Self-loop edges make min-over-neighbors include
    the node's own label, so a round is ONE join + ONE groupBy (round 1
    degenerates to ``edges.groupBy(dst).min(src)`` with no label table
    at all); ``fuse`` rounds share one localCheckpoint; convergence is
    the monotone label-sum check — Σ component (exact DECIMAL(38,0),
    order-insensitive, overflow-free) strictly decreases until the
    fixpoint, so equality between materializations ⇔ converged, read
    from just-checkpointed blocks with no exceptAll/limit-count plan.

    **Phase 2 — semi-naive delta rounds** (after ``delta_after``
    materializations without convergence). Full rounds shuffle the
    ENTIRE edge table every round even when almost all labels have
    stabilized. Semi-naive evaluation (the datalog/Pregel delta
    iteration; min is a monotone semilattice aggregate, so propagating
    only labels that CHANGED last round is exact) joins edges against
    the frontier instead: once the frontier count (known from the
    previous convergence scan) drops below
    ``broadcast_frontier_below``, the frontier side is broadcast and
    the per-round plan touches the edge table map-side only — no edge
    shuffle at all. The first delta frontier is the conservative
    superset {component != id} (every node that ever adopted a
    foreign label); thereafter the exact changed set rides the
    materialization. Convergence = empty frontier.

    Default ``delta_after=8`` keeps graphs that converge within 16
    rounds (every near-dup workload measured here; diameter ≲ 10) in
    phase 1 — honest accounting in PLANS.md: at 20×-density diameter
    10, forcing delta early wins only ~6% (the frontier stays large
    while the big clusters keep improving), and each delta block costs
    ~3 extra shuffle stages of fixed floor at bench scale. Phase 2 is
    the guard for mid-diameter giant graphs where rounds ≫
    materializations and the tail frontier is a sliver of the nodes;
    for EXTREME diameter (chains), :func:`connected_components_two_phase`
    with its O(log n) rounds is the right tool.
    """
    if max_iter < 1 or fuse < 1:
        raise ValueError("max_iter and fuse must be >= 1")
    if delta_after < 1:
        # phase 2 seeds its frontier from phase-1 labels; at least one
        # full materialization (which also globally delivers every
        # root's own-id label, the fact the semi-naive soundness
        # argument rests on) must precede the delta rounds
        raise ValueError("delta_after must be >= 1")
    # build the 4 symmetric/self-loop rows per pair via ONE explode
    # reference to the pair frame, so the whole pair-generation
    # pipeline (e.g. the blocked-Jaccard verify join) materializes
    # exactly ONCE — in the edge checkpoint below. The previous
    # 4-branch unionAll form needed a separate pairs.localCheckpoint()
    # first (each union branch re-executed the verify join otherwise:
    # 12.3 s vs 3.6 s e2e at sf0.1); the explode form removes that
    # extra full materialization outright (r11 A/B, labels asserted
    # identical: 3.25 -> 2.60 s median-of-5). Same post-distinct rows
    # and shuffle bytes — explode is a Generate over the join output,
    # a single subtree, so no CollapseProject duplication.
    a, b = F.col(id_a), F.col(id_b)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(a.alias("src"), b.alias("dst")),
                    F.struct(b.alias("src"), a.alias("dst")),
                    F.struct(a.alias("src"), a.alias("dst")),
                    F.struct(b.alias("src"), b.alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .repartition("src")
        .localCheckpoint()
    )
    labels: DataFrame | None = None
    prev_sum = None
    rounds = 0
    materializations = 0
    converged = False
    # ---------------- phase 1: fused full rounds, monotone-sum check
    while rounds < max_iter and materializations < delta_after:
        for _ in range(min(fuse, max_iter - rounds)):
            if labels is None:
                nxt = edges.groupBy(F.col("dst").alias("id")).agg(
                    F.min("src").alias("component")
                )
            else:
                nxt = (
                    edges.join(labels, edges.src == labels.id)
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.min("component").alias("component"))
                )
            labels = nxt
            rounds += 1
        labels = labels.localCheckpoint()
        materializations += 1
        s = labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    # ---------------- phase 2: semi-naive delta rounds
    if not converged and rounds < max_iter:
        # conservative first frontier: every node holding a foreign
        # label (superset of changed-last-round — re-delivering an
        # already-consumed label is wasted work, never wrong)
        frontier = labels.where(F.col("component") != F.col("id"))
        frontier_count: int | None = None

        def _nm(f: DataFrame) -> DataFrame:
            return (
                edges.join(
                    f.select(
                        F.col("id").alias("src"),
                        F.col("component").alias("_fcomp"),
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("_fcomp").alias("_nmin"))
            )

        def _apply(lbl: DataFrame, nm: DataFrame, carry_flag: bool) -> DataFrame:
            changed = F.coalesce(F.col("_nmin"), F.col("component")) < F.col(
                "component"
            )
            if carry_flag:
                changed = changed | F.col("_changed")
            return lbl.join(nm, "id", "left").select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("_nmin"), F.col("component")),
                ).alias("component"),
                changed.alias("_changed"),
            )

        while rounds < max_iter:
            small = (
                frontier_count is not None
                and frontier_count < broadcast_frontier_below
            )
            f0 = F.broadcast(frontier) if small else frontier
            cur = _apply(labels, _nm(f0), carry_flag=False)
            rounds += 1
            for _ in range(min(fuse - 1, max_iter - rounds)):
                # fused inner round: the lazy frontier's size is
                # unknown, so no explicit hint — AQE (the engine
                # default; bench turns it off only for latency) sizes
                # the exchange at runtime
                inner = cur.where(F.col("_changed")).select("id", "component")
                cur = _apply(cur, _nm(inner), carry_flag=True)
                rounds += 1
            cur = cur.localCheckpoint()
            n_changed = cur.agg(
                F.count_if(F.col("_changed")).alias("n")
            ).collect()[0]["n"]
            labels = cur.drop("_changed")
            if n_changed == 0:
                converged = True
                break
            frontier = cur.where(F.col("_changed")).drop("_changed")
            frontier_count = n_changed
    if not converged:
        # exiting by iteration count means labels are only partially
        # propagated — one true dup group would split into several
        # keepers and duplicates would silently survive the dedup pass
        import warnings

        warnings.warn(
            f"connected_components convergence UNCONFIRMED after {max_iter} "
            "rounds: either the component diameter exceeds max_iter (labels "
            "are partial — one dup group splits into several keepers) or "
            "the fixpoint landed exactly on the last round and the "
            "confirming check never ran; raise max_iter to distinguish",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def dedup_groups(pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b") -> DataFrame:
    """(id, component, keeper) — keeper = min id of the component; rows
    with id != keeper are the deletions a dedup pass would apply."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.select(
        "id", "component", F.col("component").alias("keeper"),
        (F.col("id") != F.col("component")).alias("is_duplicate"),
    )


def _simhash32(texts: pd.Series) -> pd.Series:
    """32-bit SimHash per text: stable FNV-1a token hashes, numpy bit
    voting. Deterministic across runs/executors (no PYTHONHASHSEED
    dependence)."""
    import numpy as np

    def fnv1a(token: str) -> int:
        h = 0x811C9DC5
        for ch in token.encode("utf-8"):
            h = ((h ^ ch) * 0x01000193) & 0xFFFFFFFF
        return h

    out = []
    for text in texts:
        votes = np.zeros(32, dtype=np.int64)
        for tok in (text or "").lower().split():
            h = fnv1a(tok)
            bits = (h >> np.arange(32)) & 1
            votes += np.where(bits == 1, 1, -1)
        sig = int(((votes > 0).astype(np.uint32) << np.arange(32, dtype=np.uint32)).sum())
        out.append(sig)
    return pd.Series(out, dtype="int64")


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash, 4×8-bit bands) — band equality is the candidate
    blocking key for hamming-distance near-dup search at scale."""
    simhash_udf = F.pandas_udf(_simhash32, LongType())
    sig = df.select(F.col(id_col), simhash_udf(F.col(text_col)).alias("simhash"))
    return sig.select(
        id_col,
        "simhash",
        *[
            F.shiftright(F.col("simhash"), 8 * b)
            .bitwiseAND(F.lit(0xFF))
            .cast("int")
            .alias(f"band{b}")
            for b in range(4)
        ],
    )


def minhash_index_build(
    df: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> None:
    """Materialize the MinHash-LSH band index for INCREMENTAL dedup.

    ``minhash_lsh_pairs`` answers "find all near-dup pairs inside one
    corpus"; a training pipeline's steady state is the other question —
    "is anything in today's batch a near-dup of the corpus?" — and must
    not re-shingle 100 TB per batch. This writes, once per corpus
    version:

    - ``{index_path}/bands``: (band_idx, bucket, id) sorted by
      (band_idx, bucket) so a probe's bucket lookups prune on parquet
      row-group min/max stats;
    - ``{index_path}/signatures``: (id, mh) for estimator-based verify
      without touching corpus text.

    The same (signature → band → bucket) kernel as minhash_lsh_pairs,
    so index and one-shot paths agree.
    """
    if bands > num_hashes or num_hashes % bands != 0:
        raise ValueError("num_hashes must be a positive multiple of bands")
    rows_per_band = num_hashes // bands
    from scout_spark.sources.writers import write_parquet_sorted

    sig_udf = _minhash_signature_udf(num_hashes, shingle_k)
    sig = (
        df.where(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col).alias("id"), sig_udf(F.col(text_col)).alias("mh"))
    )
    sig.write.mode("overwrite").parquet(os.path.join(index_path, "signatures"))
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.hash(
                            F.slice(F.col("mh"), b * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("band.band_idx", "band.bucket", "id")
    write_parquet_sorted(
        banded,
        os.path.join(index_path, "bands"),
        sort_cols=["band_idx", "bucket"],
    )


def minhash_probe(
    spark,
    index_path: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    shingle_k: int = 3,
    broadcast_batch: bool = True,
) -> DataFrame:
    """New-batch near-dup lookup against a prebuilt MinHash index →
    (batch_id, corpus_id, est_jaccard).

    The batch (small) is signed with the same kernel, its band buckets
    are joined against the index bands (broadcast of the batch side —
    the corpus-side scan stays pruned and shuffle-free), and surviving
    candidates are verified with the standard MinHash estimator
    (fraction of agreeing signature positions) against the stored
    corpus signatures — corpus TEXT is never read. Estimator, not exact
    Jaccard: E[est] = j with sd ≈ sqrt(j(1-j)/num_hashes); callers
    wanting exact verification join text for the returned candidate
    ids only.

    ``broadcast_batch=False`` switches both probe joins to shuffle
    joins for GIANT batches (a backfill replaying weeks of data) whose
    band table would not fit an executor broadcast — the steady-state
    micro-batch path keeps the broadcast default. Both paths produce
    identical rows (pinned in tests/test_operators.py).
    """
    rows_per_band = num_hashes // bands
    sig_udf = _minhash_signature_udf(num_hashes, shingle_k)
    bsig = (
        batch.where(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col).alias("batch_id"), sig_udf(F.col(text_col)).alias("bmh"))
    )
    bband = bsig.select(
        "batch_id",
        "bmh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.hash(
                            F.slice(F.col("bmh"), b * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("batch_id", "bmh", "band.band_idx", "band.bucket")
    index_bands = spark.read.parquet(os.path.join(index_path, "bands"))
    probe_side = F.broadcast(bband) if broadcast_batch else bband
    cands = (
        index_bands.join(probe_side, ["band_idx", "bucket"])
        .select("batch_id", "bmh", F.col("id").alias("corpus_id"))
        .distinct()
    )
    sigs = spark.read.parquet(os.path.join(index_path, "signatures"))
    est = F.try_divide(
        F.size(
            F.filter(
                F.zip_with(F.col("bmh"), F.col("mh"), lambda a, b: a == b),
                lambda x: x,
            )
        ).cast("double"),
        F.lit(num_hashes),
    )
    cand_side = F.broadcast(cands) if broadcast_batch else cands
    return (
        sigs.join(cand_side, cands.corpus_id == sigs.id)
        .select("batch_id", "corpus_id", F.round(est, 6).alias("est_jaccard"))
        .where(F.col("est_jaccard") >= threshold)
    )


def connected_components_two_phase(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) → (id, component), component = min id of the component.

    Min-label propagation (:func:`connected_components`) converges in
    O(diameter) rounds — fine for near-dup clusters (diameter ≲ 3),
    quadratic-ish wall for chain-shaped graphs. The star operations
    converge in O(log n) rounds regardless of diameter:

      large-star: every neighbor v > u links to m(u) = min(N(u) ∪ {u})
      small-star: every neighbor v ≤ u links to m(u)

    Each phase is one aggregate (m per node) + one join — two shuffles
    on node id, no neighbor-list materialization (no groupBy
    collect_list skew bomb on high-degree nodes).
    """
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .unionAll(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def star(e: DataFrame, large: bool) -> DataFrame:
        # neighborhoods are over the UNDIRECTED graph: symmetrize the
        # (child -> parent) edge list before computing m(u)
        es = e.unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
        m = es.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        keep = F.col("v") > F.col("u") if large else F.col("v") <= F.col("u")
        linked = (
            es.where(keep)
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # keep each node's own pointer too so roots don't vanish
        out = (
            linked.unionAll(m.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        return out

    for _ in range(max_iter):
        new_edges = star(star(edges, large=True), large=False).localCheckpoint()
        # fixed point = star graphs; the check must be SYMMETRIC
        # (shrinking edge sets are not yet converged)
        grew = new_edges.exceptAll(edges).limit(1).count()
        shrank = edges.exceptAll(new_edges).limit(1).count()
        edges = new_edges
        if grew == 0 and shrank == 0:
            break
    else:
        raise RuntimeError(
            "two-phase CC did not converge — raise max_iter "
            f"({max_iter}) for this graph"
        )
    nodes = pairs.select(F.col(id_a).alias("id")).unionAll(
        pairs.select(F.col(id_b).alias("id"))
    ).distinct()
    comp = edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
    return (
        nodes.join(comp, "id", "left")
        .select(
            "id",
            F.least(
                F.coalesce(F.col("component"), F.col("id")), F.col("id")
            ).alias("component"),
        )
    )
