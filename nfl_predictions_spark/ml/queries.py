"""Driver-facing ML queries (SURVEY.md §2B Q37).

Raw GBT predictions are not SQL-expressible, so q37/q37b have no
DuckDB oracle (the driver records the weaker rows-only check); the
semantic and golden tests live in tests/test_ml.py. The pipeline's
deterministic prefix — StringIndexer label assignment and the
assembled feature vector — IS SQL-expressible, and q37c checks it
value-for-value against DuckDB on the driver's events table. q87's
feature importances are likewise fully oracle-backed since round 5:
the saved models' tree-node parquet is the shared input, and the
gain aggregation replays identically in DuckDB.
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


def q37c_ml_index_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ML pipeline's deterministic prefix, value-checked against SQL:
    a REAL ``StringIndexer`` (handleInvalid=error, frequencyDesc — the
    exact config of the reference's saved stage, assets/static/assets/
    nfl_model_pass/stages/0_StringIndexer_*/metadata/part-00000:1) fit
    on a lag-derived categorical (the PlayType_lag shape of §2A#27,
    built from events exactly like q16), then a REAL ``VectorAssembler``
    (§2A#18). The emitted columns pin everything SQL can express:

    - ``lag_idx``: the fitted label index. Spark's frequencyDesc orders
      labels by count desc then alphabetically for ties — reproduced in
      the oracle as ``row_number() OVER (ORDER BY c DESC, lbl) - 1``.
    - ``vec_checksum``: a position-weighted sum of the assembled vector
      (1*value + 2*lag_idx + 3*user_id). Identical IEEE doubles on
      identical inputs, so a wrong slot order or dropped feature shows
      as a value mismatch, not just a row-count blip.

    The GBT remainder stays rows-only by necessity (q37); this entry
    turns the rest of the Q37 pipeline from 'trust the tests' into a
    driver-checkable green row. Scale: indexer fit = one map-side-
    combined count of a low-cardinality column; transform = broadcast
    label map, shuffle-free."""
    from pyspark.ml.feature import StringIndexer, VectorAssembler
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import Window

    from nfl_predictions_spark.sources.tables import table

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", F.col("value").cast("double")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.withColumn(
        "lag_label", F.lag("event_type", 1, "FirstEvent").over(w)
    ).withColumn("user_d", F.col("user_id").cast("double"))
    indexer = StringIndexer(
        inputCol="lag_label",
        outputCol="lag_idx",
        handleInvalid="error",
        stringOrderType="frequencyDesc",
    ).fit(lagged)
    assembled = VectorAssembler(
        inputCols=["value", "lag_idx", "user_d"], outputCol="features"
    ).transform(indexer.transform(lagged))
    arr = vector_to_array("features")
    return assembled.select(
        "event_id",
        "lag_label",
        F.col("lag_idx").cast("double").alias("lag_idx"),
        F.round(
            arr[0] * 1 + arr[1] * 2 + arr[2] * 3, 6
        ).alias("vec_checksum"),
    ).orderBy("event_id")


QUERIES["q37c_ml_index_assemble"] = q37c_ml_index_assemble
ORACLE["q37c_ml_index_assemble"] = """
WITH lagd AS (
  SELECT event_id, user_id, value,
    COALESCE(lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id),
             'FirstEvent') AS lag_label
  FROM events
), freq AS (
  SELECT lag_label AS lbl, count(*) AS c FROM lagd GROUP BY lbl
), ranked AS (
  SELECT lbl,
    CAST(row_number() OVER (ORDER BY c DESC, lbl) - 1 AS DOUBLE) AS lag_idx
  FROM freq
)
SELECT l.event_id, l.lag_label, r.lag_idx,
       ROUND(l.value * 1 + r.lag_idx * 2 + l.user_id * 3, 6) AS vec_checksum
FROM lagd l JOIN ranked r ON l.lag_label = r.lbl
ORDER BY l.event_id
"""


_Q87_NODES = os.path.join(_CACHE_ROOT, "q87_nodes.parquet")


def dump_tree_nodes(spark: SparkSession) -> str:
    """Normalize both pipelines' saved GBT tree tables (the reference's
    own on-disk model schema: stages/2_GBTRegressor_*/data with treeID +
    nodeData(gain, split.featureIndex, impurityStats)) into ONE parquet
    at a deterministic path: (model, treeID, fidx, feature, gain, cnt)
    for internal nodes, plus treeID=-1 dimension rows carrying the full
    8-feature list. Written once per model-cache generation (atomic
    tempdir rename, the q164 idiom); both the Spark query and the DuckDB
    oracle then read the SAME bytes."""
    import glob as _glob
    import shutil

    pass_model, run_model = trained_models(spark)
    if os.path.exists(os.path.join(_Q87_NODES, "_SUCCESS")):
        return _Q87_NODES
    feats = list(pass_model.stages[-2].getInputCols())
    parts = []
    for model_name, pipeline in (("pass", pass_model), ("run", run_model)):
        (data_dir,) = _glob.glob(
            os.path.join(_CACHE_ROOT, f"nfl_model_{model_name}", "stages",
                         "*GBTRegressor*", "data")
        )
        nodes = (
            spark.read.parquet(data_dir)
            .select(
                F.lit(model_name).alias("model"),
                F.col("treeID"),
                F.col("nodeData.split.featureIndex").alias("fidx"),
                F.col("nodeData.gain").alias("gain"),
                F.element_at("nodeData.impurityStats", 1).alias("cnt"),
            )
            .filter(F.col("fidx") >= 0)  # internal nodes only
        )
        dim = spark.createDataFrame(
            [(model_name, -1, i, 0.0, 0.0) for i in range(len(feats))],
            "model: string, treeID: int, fidx: int, gain: double, cnt: double",
        )
        parts.append(nodes.unionByName(dim))
    fmap = spark.createDataFrame(
        list(enumerate(feats)), "fidx: int, feature: string"
    )
    out = parts[0].unionByName(parts[1]).join(F.broadcast(fmap), "fidx")
    build = tempfile.mkdtemp(prefix=".q87_nodes_", dir=_CACHE_ROOT)
    tgt = os.path.join(build, "data")
    out.coalesce(1).write.mode("overwrite").parquet(tgt)
    try:
        os.rename(tgt, _Q87_NODES)
    except OSError:
        pass  # lost the race: reuse winner
    shutil.rmtree(build, ignore_errors=True)
    return _Q87_NODES


def q87_ml_feature_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-model GBT feature importances — MLlib's exact algorithm
    (per internal node: gain * instance count; per tree: normalize to
    sum 1; sum across trees; global normalize) re-expressed as a
    relational gain-walk over the dumped tree-node table, so a DuckDB
    oracle can replay it value-for-value (VERDICT r04 next-round #7 —
    formerly rows-only via gbt.featureImportances; parity with the MLlib
    scalar is pinned in tests/test_ml.py). Every order-dependent double
    sum is quantized to decimal at the source (the q246 rule), making
    the result hash-exact across engines. Reference models:
    assets/static/assets/nfl_model_pass/stages/2_GBTRegressor_*/
    (maxIter 20, seed 12345)."""
    path = dump_tree_nodes(spark)
    nodes = spark.read.parquet(path)
    # GBTs accumulate gain x count RAW across the whole ensemble and
    # normalize ONCE (perTreeNormalization=false in treeModels.scala —
    # pinned by tests/test_ml.py's independent py4j node walk; the
    # per-tree-normalized RandomForest variant differs by ~1e-2).
    term = F.round(F.col("gain") * F.col("cnt"), 9).cast("decimal(30,9)")
    tot = (
        nodes.filter(F.col("treeID") >= 0)
        .select("model", "fidx", term.alias("term"))
        .groupBy("model", "fidx")
        .agg(F.sum("term").alias("s"))
    )
    grand = tot.groupBy("model").agg(F.sum("s").alias("g"))
    dim = nodes.filter(F.col("treeID") == -1).select("model", "fidx", "feature")
    return (
        dim.join(tot, ["model", "fidx"], "left")
        .join(grand, "model")
        .select(
            "model",
            "feature",
            F.round(
                F.coalesce(
                    F.col("s").cast("double") / F.col("g").cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("importance"),
        )
        .orderBy("model", F.desc("importance"), "feature")
    )


QUERIES["q87_ml_feature_importance"] = q87_ml_feature_importance
ORACLE["q87_ml_feature_importance"] = f"""
WITH nodes AS (
  -- GBT importances: RAW gain x count across the ensemble, ONE final
  -- normalization (perTreeNormalization=false for GBTs in MLlib)
  SELECT model, fidx,
         CAST(round(gain * cnt, 9) AS DECIMAL(30,9)) AS term
  FROM read_parquet('{_Q87_NODES}/*.parquet') WHERE treeID >= 0
), tot AS (
  SELECT model, fidx, sum(term) AS s FROM nodes GROUP BY model, fidx
), grand AS (
  SELECT model, sum(s) AS g FROM tot GROUP BY model
), dim AS (
  SELECT DISTINCT model, fidx, feature
  FROM read_parquet('{_Q87_NODES}/*.parquet') WHERE treeID = -1
)
SELECT d.model, d.feature,
       round(COALESCE(CAST(t.s AS DOUBLE) / CAST(gr.g AS DOUBLE), 0.0), 6)
         AS importance
FROM dim d
LEFT JOIN tot t ON t.model = d.model AND t.fidx = d.fidx
JOIN grand gr ON gr.model = d.model
ORDER BY d.model, importance DESC, d.feature
"""
