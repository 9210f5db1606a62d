"""Batch + single-record scoring (SURVEY.md §3 entry points 1-2).

The reference scores one request at a time: two sequential
``transform`` + ``collect`` calls on a one-row DataFrame, then a Python
comparison (``assets/app_nfl.py:151-160``). The engine's form is a
single vectorized pass over N rows: both model transforms chained on
the same DataFrame, best-play picked by a Catalyst ``when`` expression
(ties -> Running Play, the exact `:158` semantics). Scoring 1 row and
scoring 100 M rows is the same plan.
"""

from __future__ import annotations

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_predictions_spark.functions.scalars import best_play
from nfl_predictions_spark.schemas import SCORE_REQUEST_SCHEMA

#: Golden request fixture (reference assets/app_nfl.py:286).
GOLDEN_REQUEST = dict(
    qtr=3,
    down=3,
    TimeSecs=60,
    yrdline100=50,
    ydstogo=8,
    ydsnet=15,
    month_day=920,
    posteam="PIT",
    DefensiveTeam="NE",
    PlayType_lag="Run",
)

_MODEL_TEMP_COLS = ("PlayType_lag_index", "features", "prediction")


def score_best_play(
    pass_model: PipelineModel, run_model: PipelineModel, requests: DataFrame
) -> DataFrame:
    """Score a batch of request rows with both models and pick the best
    play. Output adds: passing_yards, running_yards, best_play."""
    scored = pass_model.transform(requests).withColumnRenamed(
        "prediction", "passing_yards"
    )
    scored = scored.drop("PlayType_lag_index", "features")
    scored = run_model.transform(scored).withColumnRenamed(
        "prediction", "running_yards"
    )
    scored = scored.drop("PlayType_lag_index", "features")
    return scored.withColumn(
        "best_play", best_play("passing_yards", "running_yards")
    )


def score_record(
    spark: SparkSession,
    pass_model: PipelineModel,
    run_model: PipelineModel,
    record: dict,
) -> dict:
    """Single-record scoring — the reference /api contract
    (10 typed fields in, {best_play, passing_yards, running_yards} out).
    Builds a LocalRelation; no shuffle, no file scan."""
    row = tuple(record[f.name] for f in SCORE_REQUEST_SCHEMA.fields)
    df = spark.createDataFrame([row], SCORE_REQUEST_SCHEMA)
    out = (
        score_best_play(pass_model, run_model, df)
        .select(
            "best_play",
            F.round("passing_yards", 2).alias("passing_yards"),
            F.round("running_yards", 2).alias("running_yards"),
        )
        .first()
    )
    return out.asDict()
