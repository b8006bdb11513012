"""Schema-adaptive source binding (SURVEY.md §1.3, §2.9 X2).

The reference introspects the raw QuackOSM table with PRAGMA table_info and
rewrites SQL placeholders {ID_EXPR}/{NAME_ARG}/{GEOM_EXPR}
(reference scripts/build_gazetteer.py:25-61). In the DataFrame API the same
adaptivity is plain Python over ``df.schema``: each placeholder becomes a
function returning a Column, inlined at plan-construction time — the
faithful analogue of DuckDB macro inlining, with zero runtime cost.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass(frozen=True)
class SourceBinding:
    """Resolved column expressions for a raw OSM-like source."""

    id_col: Column
    name_col: Column  # nullable string; NULL when source has no name column
    has_synthetic_id: bool

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumn("_osm_id", self.id_col).withColumn(
            "_name_raw", self.name_col
        )


def bind_raw_source(df: DataFrame) -> SourceBinding:
    """Inspect ``df.schema`` and resolve id/name expressions.

    Mirrors reference build_gazetteer.py:26-42:
      - id column may be ``id`` or ``osm_id``; else synthesize a dense
        BIGINT via ROW_NUMBER() OVER () (single-partition window — build
        time only, exactly like the reference's one-shot ETL). Use
        ``monotonically_increasing_id`` instead when density isn't needed.
      - ``name`` column is optional; when absent the caller falls back to
        ``tags['name']`` (reference sql/migrations/000_init.sql:14-19).
    Geometry detection (build_gazetteer.py:30-39) is out of scope: per
    SURVEY.md §1.2 geometry is eliminated at the ETL edge — raw fixtures
    carry centroid lat/lon + bbox doubles already.
    """
    cols = set(df.schema.fieldNames())
    if "id" in cols:
        id_col, synthetic = F.col("id").cast("bigint"), False
    elif "osm_id" in cols:
        id_col, synthetic = F.col("osm_id").cast("bigint"), False
    else:
        id_col = F.row_number().over(Window.orderBy(F.lit(1))).cast("bigint")
        synthetic = True
    name_col = (
        F.col("name").cast("string") if "name" in cols else F.lit(None).cast("string")
    )
    return SourceBinding(id_col=id_col, name_col=name_col, has_synthetic_id=synthetic)
