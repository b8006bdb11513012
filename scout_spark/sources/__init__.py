from scout_spark.sources.tables import TABLES, load_table, load_tables, register_views
from scout_spark.sources.binding import SourceBinding, bind_raw_source
from scout_spark.sources.writers import write_parquet_sorted

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "SourceBinding",
    "bind_raw_source",
    "write_parquet_sorted",
]
