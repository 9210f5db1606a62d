from nfl_predictions_spark.functions.scalars import (  # noqa: F401
    best_play,
    dsum,
    davg,
    month_day,
    na_to_null,
)
