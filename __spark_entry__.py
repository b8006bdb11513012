"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's two-phase
filter-then-verify fuzzy search — SURVEY.md §3.1 — over the documents
table) at sf0.001. ``queries()`` / ``oracle_sql()`` expose the full
operator inventory registry (scout_spark/inventory/*) — one entry per
implemented operator from SURVEY.md §2 plus the training-data pipeline
extensions (dedup, ANN, text analysis, temporal).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from scout_spark.inventory import load_all  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: filter-then-verify fuzzy search, top-10 over documents."""
    registry = load_all()
    return registry["flagship_fuzzy_search"].spark(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Iteration order is driver-correctness-window priority (see
    scout_spark/inventory/rotation.py): entries without a prior-round
    driver record come first so the per-round ~50-query differential
    eventually covers the whole registry.
    """
    from scout_spark.inventory.rotation import ordered_names

    registry = load_all()
    return {name: registry[name].spark for name in ordered_names(registry)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for every SQL-expressible query.

    Rows-only ops (engine-specific hashing / approximate algorithms —
    see each item's doc) are omitted; their correctness is pinned by
    exact-ground-truth tests in tests/.
    """
    return {
        name: item.oracle for name, item in load_all().items() if item.oracle
    }
