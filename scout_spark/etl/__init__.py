from scout_spark.etl.gazetteer import build_pois, build_admin, build_gazetteer, POI_VIEW_COLUMNS

__all__ = ["build_pois", "build_admin", "build_gazetteer", "POI_VIEW_COLUMNS"]
