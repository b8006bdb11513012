"""Second extension wave: UDTF-shaped explode (SURVEY.md §2.9 X6),
GROUPING SETS via the spark.sql text path (§2.2 P9 + §2.4 A4), the
string-function family (§2.8 F18), and the full gazetteer geocode
pipeline as a driver-visible rows-only item (SURVEY.md §3.1 — fixture
tables aren't registered in the oracle, so correctness is pinned by
tests/test_geocode_e2e.py instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t


@register(
    "explode_tokens_with_position",
    "UDTF-shaped row expansion (SURVEY.md §2.9 X6): posexplode of the "
    "token array — one row per (doc, position, token). The Spark "
    "generate operator is pipelined inside the scan stage, no shuffle.",
    oracle="""
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
             unnest(string_split(text, ' ')) AS token
      FROM documents
      WHERE doc_id < 20
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    )


@register(
    "agg_grouping_sets_sql_path",
    "GROUPING SETS through the spark.sql text path (SURVEY.md §2.2 P9 — "
    "the reference's only query interface is SQL text; this row proves "
    "the engine's SQL surface end-to-end, temp view + ANSI SQL).",
    oracle="""
      SELECT o_orderstatus AS status, o_orderpriority AS priority,
             count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "scalar_string_family",
    "String scalar family (SURVEY.md §2.8 F18): regexp_extract, lpad, "
    "instr, reverse, repeat, substring arithmetic — all codegen'd.",
    oracle="""
      SELECT p_partkey,
             regexp_extract(p_brand, '#(\\d+)', 1)      AS brand_digits,
             lpad(CAST(p_size AS VARCHAR), 4, '0')      AS size_padded,
             instr(p_name, 'a')                         AS first_a,
             reverse(p_type)                            AS type_rev,
             repeat(substr(p_type, 1, 2), 2)            AS type_rep,
             upper(substr(p_name, 1, 1)) || lower(substr(p_name, 2)) AS name_cap
      FROM part
      WHERE p_partkey < 100
    """,
)
def scalar_string_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_digits"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.instr(F.col("p_name"), "a").cast("bigint").alias("first_a"),
        F.reverse("p_type").alias("type_rev"),
        F.repeat(F.substring("p_type", 1, 2), 2).alias("type_rep"),
        F.concat(
            F.upper(F.substring("p_name", 1, 1)),
            F.lower(F.expr("substring(p_name, 2)")),
        ).alias("name_cap"),
    )


_GEO_ENGINE_CACHE: dict[int, object] = {}


@register(
    "geocode_forward_fixture",
    "The COMPLETE reference pipeline end-to-end (SURVEY.md §3.1): "
    "deterministic fixture gazetteer (ETL: schema-adaptive binding → "
    "pois/admin build) → ScoutEngine.forward(candidates=['Monograph "
    "Dining'], country='malaysia', limit=5) — tokenize, bbox resolve "
    "(top-1 by area on cached admin), token-contains + bbox candidate "
    "scan, fuzzy score, top-k. Rows-only: gazetteer fixture tables are "
    "not registered in the driver's oracle; golden-hit assertions live "
    "in tests/test_geocode_e2e.py.",
    tags=("rows-only",),
)
def geocode_forward_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.etl.fixtures import raw_osm_fixture
    from scout_spark.etl.gazetteer import build_admin, build_pois
    from scout_spark.plans.geocode import GeocodeSettings, ScoutEngine

    engine = _GEO_ENGINE_CACHE.get(id(spark))
    if engine is None:
        raw = raw_osm_fixture(spark, n_pois=300)
        engine = ScoutEngine(
            spark,
            build_pois(raw).cache(),
            build_admin(raw),
            GeocodeSettings(use_pandas_udf=False),
        )
        _GEO_ENGINE_CACHE[id(spark)] = engine
    return engine.forward(["Monograph Dining"], country="malaysia", limit=5)
