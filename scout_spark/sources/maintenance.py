"""Table maintenance utilities (scale concerns the reference never hits:
its whole gazetteer is one DuckDB file).

Small-files compaction: streaming sinks and incremental upserts shed
many small parquet files; scans then pay per-file open/footer costs and
lose row-group locality. ``compact_parquet`` rewrites a directory into
size-targeted files (atomic staging swap), optionally re-sorting so
min/max pruning stays effective after compaction.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def atomic_swap(target: str, staging: str) -> None:
    """Replace the directory at ``target`` with ``staging`` such that a
    crash at ANY point leaves a readable table: either ``target`` still
    holds the old data, or (for the one instant between the two renames)
    ``target + '.old'`` does — ``recover_swap`` heals that window on the
    next startup. Never a state where both old and new data are gone.
    """
    old = target + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(target):
        os.rename(target, old)
    os.rename(staging, target)
    shutil.rmtree(old, ignore_errors=True)


def recover_swap(target: str) -> str | None:
    """Heal a crash inside ``atomic_swap``: if ``target`` is missing but
    ``target + '.old'`` survives (crash between the two renames), restore
    it. Returns the action taken ('restored_old', 'cleaned_old', None).
    Callers run this before reading the table at startup."""
    old = target + ".old"
    if not os.path.exists(target):
        if os.path.exists(old):
            os.rename(old, target)
            return "restored_old"
        return None
    if os.path.exists(old):
        shutil.rmtree(old, ignore_errors=True)
        return "cleaned_old"
    return None


def parquet_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> tuple[int, int]:
    """Rewrite ``path`` into ~target-size files. Returns
    (files_before, files_after). Atomic via staging + directory swap."""
    # refuse hive-partitioned layouts: a flat rewrite would silently
    # destroy key=value directories (and partition pruning with them) —
    # compact those per-partition instead
    for entry in os.listdir(path):
        if "=" in entry and os.path.isdir(os.path.join(path, entry)):
            raise ValueError(
                f"{path} is hive-partitioned ({entry!r}); compact each "
                "partition directory individually"
            )
    n_before, total_bytes = parquet_file_stats(path)
    if n_before == 0:
        raise ValueError(f"no parquet data files under {path}")
    target_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    out = df.repartition(target_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    staging = path + ".compacting"
    out.write.mode("overwrite").parquet(staging)
    atomic_swap(path, staging)
    n_after, _ = parquet_file_stats(path)
    return n_before, n_after
