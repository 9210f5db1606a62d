"""Driver-facing ML queries (SURVEY.md §2B Q37).

GBT predictions are not SQL-expressible, so these entries have no
DuckDB oracle (the driver records the weaker rows-only check); the
semantic and golden tests live in tests/test_ml.py.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_predictions_spark.ml.features import build_features
from nfl_predictions_spark.ml.pipeline import load_models, save_models, train_models
from nfl_predictions_spark.ml.score import GOLDEN_REQUEST, score_best_play
from nfl_predictions_spark.ml.synthetic import synthetic_plays
from nfl_predictions_spark.schemas import SCORE_REQUEST_SCHEMA

QUERIES: dict = {}
ORACLE: dict[str, str] = {}

_TRAIN_GAMES = 24
_TRAIN_PLAYS = 120
_CACHE_ROOT = os.path.join(
    tempfile.gettempdir(),
    "nfl_predictions_spark",
    f"models_g{_TRAIN_GAMES}x{_TRAIN_PLAYS}_v1",
)


def trained_models(spark: SparkSession):
    """Train-or-load the two pipelines on the deterministic synthetic
    plays table. Models are persisted in Spark's native PipelineModel
    format (same on-disk contract as the reference's shipped artifacts)
    and reloaded on subsequent calls — the reference loads models once
    at boot (assets/app_nfl.py:337-338), never per query."""
    marker = os.path.join(_CACHE_ROOT, "_done")
    if os.path.exists(marker):
        try:
            return load_models(_CACHE_ROOT)
        except Exception:
            pass
    plays = build_features(synthetic_plays(spark, _TRAIN_GAMES, _TRAIN_PLAYS)).persist()
    # The 40 GBT fit iterations each run small jobs; a 200-partition
    # shuffle default (the driver session's) adds pure overhead at this
    # training size. Pin a small count for the fits, then restore.
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        pass_model, run_model = train_models(plays)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)
        plays.unpersist()
    save_models(pass_model, run_model, _CACHE_ROOT)
    with open(marker, "w") as f:
        f.write("ok")
    return pass_model, run_model


def _request_batch(spark: SparkSession, n: int = 25) -> DataFrame:
    """Golden fixture + n deterministic synthetic requests."""
    golden = tuple(GOLDEN_REQUEST[f.name] for f in SCORE_REQUEST_SCHEMA.fields)
    plays = build_features(synthetic_plays(spark, 2, 60)).limit(n)
    reqs = plays.select(*[f.name for f in SCORE_REQUEST_SCHEMA.fields])
    one = spark.createDataFrame([golden], SCORE_REQUEST_SCHEMA)
    return one.unionByName(reqs)


def q37_ml_best_play(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstructed reference pipeline end-to-end: StringIndexer
    (freq-desc, handleInvalid=error) -> VectorAssembler(8) -> GBT
    (seed 12345) x2, then the best-play rule as one vectorized pass."""
    pass_model, run_model = trained_models(spark)
    batch = _request_batch(spark)
    scored = score_best_play(pass_model, run_model, batch)
    return scored.select(
        "qtr",
        "down",
        "TimeSecs",
        "yrdline100",
        "ydstogo",
        "ydsnet",
        "month_day",
        "PlayType_lag",
        "best_play",
        F.round("passing_yards", 2).alias("passing_yards"),
        F.round("running_yards", 2).alias("running_yards"),
    ).orderBy("TimeSecs", "yrdline100", "ydstogo")


QUERIES["q37_ml_best_play"] = q37_ml_best_play


def q37b_ml_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out evaluation of both models: RMSE/MAE/R2 on a disjoint
    deterministic synthetic season, plus the constant-mean baseline RMSE
    the model must beat (SURVEY §7 risk 2: semantic guards instead of
    cross-version tree equality)."""
    from pyspark.ml.evaluation import RegressionEvaluator

    pass_model, run_model = trained_models(spark)
    # Different game count => disjoint id space from the training table.
    holdout = build_features(synthetic_plays(spark, 6, 90)).persist()
    rows = []
    for label, model, ptype in (
        ("pass", pass_model, "Pass"),
        ("run", run_model, "Run"),
    ):
        subset = holdout.filter(F.col("PlayType") == ptype)
        pred = model.transform(subset).persist()
        evals = {
            m: RegressionEvaluator(
                labelCol="Yards_Gained", predictionCol="prediction", metricName=m
            ).evaluate(pred)
            for m in ("rmse", "mae", "r2")
        }
        base = subset.agg(
            F.stddev_pop("Yards_Gained").alias("sd"), F.count("*").alias("n")
        ).first()
        rows.append(
            (
                label,
                int(base.n),
                round(evals["rmse"], 4),
                round(evals["mae"], 4),
                round(evals["r2"], 4),
                round(float(base.sd), 4),
            )
        )
        pred.unpersist()
    holdout.unpersist()
    return spark.createDataFrame(
        rows, "model string, n_rows int, rmse double, mae double, r2 double, baseline_rmse double"
    ).orderBy("model")


QUERIES["q37b_ml_eval"] = q37b_ml_eval


def q87_ml_feature_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-model GBT feature importances (normalized total gain) for the
    reference's 8-feature vector — the model-explanation query a user of
    the reference's two saved pipelines asks first. Importance vectors
    are training-artifact-specific (not SQL-expressible -> rows-only);
    determinism comes from the seeded pipeline, and invariants (all
    features present, weights sum to 1, non-negative) are pinned in
    tests/test_ml.py. Reference models: assets/static/assets/
    nfl_model_pass/stages/2_GBTRegressor_*/ (maxIter 20, seed 12345)."""
    import pandas as pd

    pass_model, run_model = trained_models(spark)
    rows = []
    for model_name, pipeline in (("pass", pass_model), ("run", run_model)):
        gbt = pipeline.stages[-1]
        assembler = pipeline.stages[-2]
        feats = list(assembler.getInputCols())
        imps = gbt.featureImportances
        for i, feat in enumerate(feats):
            rows.append((model_name, feat, round(float(imps[i]), 6)))
    pdf = pd.DataFrame(rows, columns=["model", "feature", "importance"])
    return (
        spark.createDataFrame(pdf)
        .select("model", "feature", F.col("importance").cast("double"))
        .orderBy("model", F.desc("importance"), "feature")
    )


QUERIES["q87_ml_feature_importance"] = q87_ml_feature_importance
