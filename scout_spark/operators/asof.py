"""As-of (backward temporal) join (SURVEY.md §2.3 J4 — absent in the
reference and in core Spark; this is the scalable union+window
formulation).

Instead of a range theta-join (O(n·m) within key) or a per-row correlated
subquery, interleave both sides into one stream per key, sort once by
(key, time), and carry the last-seen right-side payload forward. Cost:
one shuffle on the key + one sort — the same cost as a regular sort-merge
join, independent of time-range density, so it survives 100× scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    how: str = "inner",
    allow_exact_match: bool = True,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right[right_ts] <= left[left_ts]`` (backward as-of) and the same
    ``on`` key. Right payload columns are prefixed ``right_``.

    Equal timestamps match when ``allow_exact_match`` (right row sorts
    before the left probe at the same instant).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports how='inner'|'left', got {how!r}")
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0 if allow_exact_match else 2).alias("_side"),
        F.struct(
            F.col(right_ts).alias(f"right_{right_ts}"),
            *[F.col(c).alias(f"right_{c}") for c in right_payload],
        ).alias("_payload"),
    )
    lcols = left.columns
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.struct(*[F.col(c) for c in lcols]).alias("_row"),
    )
    r = r.withColumn("_row", F.lit(None).cast(l.schema["_row"].dataType))
    merged = l.unionByName(r.select(*l.columns))
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    ).where(F.col("_side") == 1)
    out = carried.select("_row.*", "_match.*")
    if how == "inner":
        out = out.where(F.col(f"right_{right_ts}").isNotNull())
    return out
