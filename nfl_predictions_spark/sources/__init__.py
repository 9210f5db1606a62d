from nfl_predictions_spark.sources.tables import table, register_views  # noqa: F401
