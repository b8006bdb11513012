"""Local replica of the driver's DuckDB-oracle differential check
(SURVEY.md §5.1). Running this before every commit means the driver's
CORRECTNESS gate is known-green, not hoped-green.

Comparison = row count + sorted column names + order-insensitive values,
with exact equality after the per-query rounding (queries round double
aggregates identically on both sides, so engine ULP noise is absorbed).
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb
import pandas as pd

from scout_spark.sources.tables import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the same pre-registered views the driver
    harness provides (one view per parquet table)."""
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon_cell(v) -> str:
    # NULL and float NaN deliberately canonicalize to the same token:
    # both engines surface SQL NULL in float64 columns as NaN at the
    # pandas boundary (Spark toPandas and DuckDB .df() alike), so the
    # two are indistinguishable here by construction. A genuine
    # computed-NaN-vs-NULL divergence is instead guarded per-query by
    # using try_divide/round on both sides (CLAUDE.md invariants).
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<NULL>"
    if isinstance(v, float):
        # Floats are rendered with an explicit float tag so an integral
        # float64 (e.g. DuckDB HUGEINT sums, which .df() converts to
        # float64) does NOT collapse to the int rendering — the driver's
        # hash distinguishes int64 3 from float64 3.0, and the r02
        # hash-reds (tpch_q12, sessionize) were exactly this class
        # passing a looser local gate. Queries must cast dtypes to
        # match on both sides (::BIGINT on DuckDB integer sums).
        return f"f:{v:.10g}"
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, (list, tuple, dict, set)) or type(v).__name__ == "ndarray":
        # The DRIVER's canonicalizer sorts the frame with pandas before
        # hashing and dies on unhashable list cells (r03 reds:
        # embedding_mean_pool_by_label, dedup_minhash_md5_signatures,
        # text_fingerprint_winnowing). Mirror that: an oracle-backed
        # entry must serialize arrays/maps/structs to scalars
        # (array_join / to_json) in its final projection on BOTH sides.
        raise TypeError(
            "non-scalar cell in oracle-backed output (driver canon would "
            f"crash): {type(v).__name__}={v!r}. Serialize with array_join/"
            "to_json on both engine and oracle sides."
        )
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Sort columns by name, canonicalize every cell to a string, sort rows
    — mirrors the driver's order-insensitive value hash."""
    cols = sorted(df.columns)
    out = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    out.sort()
    return out


def compare_frames(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "query"
) -> tuple[bool, str]:
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return False, f"{name}: column mismatch spark={s_cols} oracle={o_cols}"
    if len(spark_pdf) != len(oracle_pdf):
        return (
            False,
            f"{name}: row count mismatch spark={len(spark_pdf)} "
            f"oracle={len(oracle_pdf)}",
        )
    s_rows, o_rows = canonical_rows(spark_pdf), canonical_rows(oracle_pdf)
    if s_rows == o_rows:
        return True, f"{name}: OK ({len(s_rows)} rows)"
    diffs = [
        (a, b) for a, b in zip(s_rows, o_rows) if a != b
    ][:3]
    return False, f"{name}: value mismatch, first diffs (spark vs oracle): {diffs}"


def check_item(spark, item, sf_dir: str = DEFAULT_SF_DIR) -> tuple[bool, str]:
    """Run one inventory item both ways and compare (driver replica)."""
    sdf = item.spark(spark, sf_dir).toPandas()
    if item.oracle is None:
        ok = len(sdf) >= 0
        return ok, f"{item.name}: rows-only ({len(sdf)} rows)"
    con = oracle_connection(sf_dir)
    odf = con.execute(item.oracle).df()
    con.close()
    return compare_frames(sdf, odf, item.name)
