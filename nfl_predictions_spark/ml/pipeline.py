"""The two-model pipeline (SURVEY.md §2A#17-20), retrained natively.

Reference saved-model contract (decoded from
``assets/static/assets/nfl_model_pass/`` metadata):
  StringIndexer(PlayType_lag -> PlayType_lag_index,
                handleInvalid='error', labels frequency-desc)
  -> VectorAssembler([qtr, down, TimeSecs, yrdline100, ydstogo, ydsnet,
                      month_day, PlayType_lag_index] -> features)
  -> GBTRegressor(labelCol='Yards_Gained', maxIter=20, maxDepth=5,
                  maxBins=350, stepSize=0.1, lossType='squared',
                  impurity='variance', subsamplingRate=1.0, seed=12345)

The engine does NOT depend on the 2017 Spark-2.1 artifacts: it retrains
with the same params/seed on whatever plays table it is given (SURVEY §7
risk 2 — cross-version tree reproducibility is not guaranteed, so golden
tests pin *our* predictions, semantic tests guard regressions).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import StringIndexer, VectorAssembler
from pyspark.ml.regression import GBTRegressor
from pyspark.sql import DataFrame

from nfl_predictions_spark.ml.features import split_by_playtype
from nfl_predictions_spark.schemas import FEATURE_COLS

#: GBT params as decoded from the reference model metadata (§2A#19).
GBT_PARAMS = dict(
    maxIter=20,
    maxDepth=5,
    maxBins=350,
    stepSize=0.1,
    lossType="squared",
    impurity="variance",
    subsamplingRate=1.0,
    seed=12345,
)


def build_pipeline(label_col: str = "Yards_Gained") -> Pipeline:
    indexer = StringIndexer(
        inputCol="PlayType_lag",
        outputCol="PlayType_lag_index",
        handleInvalid="error",  # unseen label => error, reference contract
        stringOrderType="frequencyDesc",
    )
    assembler = VectorAssembler(inputCols=FEATURE_COLS, outputCol="features")
    gbt = GBTRegressor(featuresCol="features", labelCol=label_col, **GBT_PARAMS)
    return Pipeline(stages=[indexer, assembler, gbt])


def train_models(plays_with_features: DataFrame) -> tuple[PipelineModel, PipelineModel]:
    """Fit the pass and run pipelines on their PlayType subsets.

    The input should already have PlayType_lag/month_day (see
    ``features.build_features``). Both subsets are derived from one
    scan; Spark caches nothing implicitly here — callers training on big
    data should ``.persist()`` the featurized table first so the two
    fits don't re-read the source.
    """
    pass_df, run_df = split_by_playtype(plays_with_features)
    return build_pipeline().fit(pass_df), build_pipeline().fit(run_df)


def save_models(pass_model: PipelineModel, run_model: PipelineModel, root: str) -> None:
    """Persist with Spark's native PipelineModel format (JSON metadata +
    parquet stage data — the same on-disk contract the reference ships)."""
    pass_model.write().overwrite().save(f"{root}/nfl_model_pass")
    run_model.write().overwrite().save(f"{root}/nfl_model_run")


def load_models(root: str) -> tuple[PipelineModel, PipelineModel]:
    return (
        PipelineModel.load(f"{root}/nfl_model_pass"),
        PipelineModel.load(f"{root}/nfl_model_run"),
    )
