from scout_spark.plans.geocode import ScoutEngine, GeocodeSettings

__all__ = ["ScoutEngine", "GeocodeSettings"]
