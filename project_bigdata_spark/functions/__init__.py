from project_bigdata_spark.functions import aqi, arrays, timeparts

__all__ = ["aqi", "arrays", "timeparts"]
