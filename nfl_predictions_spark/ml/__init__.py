from nfl_predictions_spark.ml.features import build_features, split_by_playtype  # noqa: F401
from nfl_predictions_spark.ml.pipeline import build_pipeline, train_models  # noqa: F401
from nfl_predictions_spark.ml.score import score_best_play  # noqa: F401
