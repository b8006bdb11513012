"""Distributed exact global ranking (no single-partition WindowExec).

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY forces every
row through ONE task — correct at test scale, a corpus-sized funnel at
100 TB. These helpers produce the IDENTICAL rank/ntile values with every
stage parallel:

1. ``repartitionByRange`` on the order keys — the same sampled range
   shuffle Spark's own distributed sort uses, so partition p holds a
   contiguous key range and p < q implies every key in p sorts before q.
2. per-partition ``row_number`` windowed on ``spark_partition_id()`` —
   parallel across partitions.
3. per-partition offsets: a P-row count frame (P = shuffle partitions,
   bounded by cluster size, never data size) gets a cumulative sum via
   an unpartitioned window over those P rows, then broadcast-joins back.

The ranged frame is persisted: the offset job and the main job must see
the same range boundaries (RangePartitioner samples at materialization),
and persistence also avoids recomputing the upstream pipeline twice.

Persisted-frame lifecycle (ADVICE r05): the consuming action happens
after these helpers return, so they cannot unpersist eagerly — instead
a bounded FIFO tracks every persisted ranged frame and evicts (lazily
unpersists) the oldest beyond ``_MAX_CACHED``. In the driver's
sequential entry-per-entry execution, frames older than the last few
calls belong to already-consumed queries, so eviction never invalidates
a frame still awaiting its action; cache footprint is bounded instead
of growing one frame per rank-toolkit call for the session's lifetime.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "__rank_pid"
_OFF = "__rank_off"
_TOT = "__rank_total"

# FIFO of persisted ranged frames; oldest beyond the cap are lazily
# unpersisted (see module docstring for why eager unpersist is unsafe).
# SAFETY INVARIANT (ADVICE r06): eviction only preserves correctness
# if no single query builds more than _MAX_CACHED toolkit frames
# before its consuming action runs — an evicted-then-recomputed ranged
# frame may sample DIFFERENT range boundaries, silently shifting
# ranks. tests/test_rank.py::test_rank_toolkit_call_budget
# statically enforces the budget over every inventory function
# (current max: 3 — RFM's triple global_ntile).
_MAX_CACHED = 8
_PERSISTED: deque[DataFrame] = deque()


def _persist_bounded(df: DataFrame) -> DataFrame:
    df = df.persist()
    _PERSISTED.append(df)
    while len(_PERSISTED) > _MAX_CACHED:
        old = _PERSISTED.popleft()
        try:
            old.unpersist(blocking=False)
        except Exception:  # session already stopped — nothing to free
            pass
    return df


def global_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    out: str = "rn",
    num_partitions: int | None = None,
    with_total: bool = False,
    known_count: int | None = None,
) -> DataFrame:
    """Exact global ``row_number`` by ``order_cols``, fully parallel.

    ``order_cols`` should end in a unique tie-break column so the total
    order (and therefore every rank) is deterministic cross-engine.
    With ``with_total`` the frame also carries the global row count in
    column ``__rank_total`` (useful for ntile math) at no extra job.

    ``known_count``: same measured small-frame gate as
    :func:`global_ntile` — when the caller already holds the row count
    and it is ≤ ``SMALL_NTILE_ROWS``, the distributed machinery's ~4
    jobs (range-sample pass, shuffle, offset agg, broadcast join) are
    pure scheduler floor, so one single-partition ``row_number`` window
    (the definition) runs instead; a no-op past the threshold, where
    the distributed path stays the production plan."""
    if known_count is not None and known_count <= SMALL_NTILE_ROWS:
        w = Window.orderBy(*order_cols)
        res = df.withColumn(out, F.row_number().over(w))
        if with_total:
            res = res.withColumn(
                _TOT, F.lit(known_count).cast("bigint")
            )
        return res
    spark = df.sparkSession
    parts = num_partitions or spark.sparkContext.defaultParallelism
    ranged = _persist_bounded(
        df.repartitionByRange(parts, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
    )
    counts = ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("_n"))
    # P rows only: the unpartitioned cumulative window is bounded by the
    # partition count, not the data
    offs = counts.select(
        _PID,
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy(_PID).rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias(_OFF),
        F.sum("_n").over(Window.partitionBy()).alias(_TOT),
    )
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    keep = [_OFF, _TOT] if with_total else [_OFF]
    res = (
        ranged.join(F.broadcast(offs.select(_PID, *keep)), _PID)
        .withColumn(out, F.row_number().over(w) + F.col(_OFF))
        .drop(_PID, _OFF)
    )
    return res


SMALL_NTILE_ROWS = 2_000_000


def global_ntile(
    df: DataFrame,
    order_cols: list[str | Column],
    n_tiles: int,
    out: str = "tile",
    known_count: int | None = None,
) -> DataFrame:
    """Exact global ``ntile(n)`` by ``order_cols`` — same bucket
    assignment as the single-window formulation (first ``total mod n``
    buckets get one extra row), computed row-locally from the
    distributed global rank. All-integer arithmetic.

    ``known_count``: pass the frame's row count (a bounded driver
    scalar the caller already has, e.g. from a persisted per-user
    rollup) to enable the measured small-frame fast path: at or below
    ``SMALL_NTILE_ROWS`` the distributed formulation's ~4 jobs per
    axis (range-sample pass, shuffle, offset agg, join) are pure
    scheduler floor, so a single-partition ``ntile`` window — the
    DEFINITION the distributed form mimics — is used instead (bound:
    one sort of ≤2M narrow rows in one task; FLOOR_r11
    events_rfm_segmentation, 3 axes: 3.09 → sub-second sp1). At real
    scale the count exceeds the threshold and the gate is a no-op —
    the distributed path stays the production plan (the _th /
    broadcast_ranks_below flip-condition discipline)."""
    if known_count is not None and known_count <= SMALL_NTILE_ROWS:
        w = Window.orderBy(*order_cols)
        return df.withColumn(
            out, F.ntile(n_tiles).over(w).cast("int")
        )
    def _idiv(a: Column, b: Column) -> Column:
        # exact integer floor-division on non-negative longs: the
        # numerator is made an exact multiple of b first, so the double
        # division is exact for any total < 2^53
        return ((a - a % b) / b).cast("bigint")

    r = global_row_number(df, order_cols, out="_grn", with_total=True)
    total = F.col(_TOT)
    base = _idiv(total, F.lit(n_tiles))  # floor bucket size
    rem = total % n_tiles  # first `rem` buckets hold base+1
    cut = rem * (base + 1)
    rank0 = F.col("_grn") - 1
    # base==0 (fewer rows than tiles): each row its own tile == rank;
    # greatest() keeps the untaken divide branch ANSI-safe
    base_safe = F.greatest(base, F.lit(1))
    tile = F.when(base == 0, F.col("_grn")).otherwise(
        F.when(F.col("_grn") <= cut, _idiv(rank0, base + 1) + 1).otherwise(
            rem + _idiv(rank0 - cut, base_safe) + 1
        )
    )
    return r.withColumn(out, tile.cast("int")).drop("_grn", _TOT)


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[str | Column],
    value_col: str,
    rn_out: str = "rn",
    cum_out: str = "cum",
    num_partitions: int | None = None,
    known_count: int | None = None,
) -> DataFrame:
    """Exact global ``row_number`` AND running ``sum(value_col)`` by
    ``order_cols``, fully parallel — the distributed prefix-sum
    companion to :func:`global_row_number` (one range shuffle serves
    both: the offset frame carries per-partition counts and value
    sums together).

    ``known_count``: measured (or upper-bound — e.g. the source
    table's parquet-footer row count via ``sources.tables.
    parquet_rows``; a per-key agg can never exceed its input rows)
    frame size. At or below ``SMALL_NTILE_ROWS`` the distributed
    machinery's ~4 jobs (range sampling, counts, broadcast offsets,
    main) are pure scheduler floor on a frame one partition sorts
    in milliseconds — the single-partition window definition is the
    identical computation (FLOOR_r11, same gate as global_ntile).
    A no-op at real scale."""
    spark = df.sparkSession
    if known_count is not None and known_count <= SMALL_NTILE_ROWS:
        w = Window.orderBy(*order_cols)
        return df.withColumn(rn_out, F.row_number().over(w)).withColumn(
            cum_out,
            F.sum(value_col).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    parts = num_partitions or spark.sparkContext.defaultParallelism
    ranged = _persist_bounded(
        df.repartitionByRange(parts, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
    )
    counts = ranged.groupBy(_PID).agg(
        F.count(F.lit(1)).alias("_n"), F.sum(value_col).alias("_v")
    )
    # P rows only (partition count, never data size)
    wprev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        _PID,
        F.coalesce(F.sum("_n").over(wprev), F.lit(0)).alias(_OFF),
        F.coalesce(F.sum("_v").over(wprev), F.lit(0)).alias("__rank_voff"),
    )
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(offs), _PID)
        .withColumn(rn_out, F.row_number().over(w) + F.col(_OFF))
        .withColumn(
            cum_out,
            F.sum(value_col).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            + F.col("__rank_voff"),
        )
        .drop(_PID, _OFF, "__rank_voff")
    )
