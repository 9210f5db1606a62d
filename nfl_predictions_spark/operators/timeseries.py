"""Time-series resample / gap-fill — the hypertable-style rollup.

The reference replays plays as a continuous stream on a fixed schedule
(NiFi ``GenerateFlowFile`` 1 event/5 s, reference
``NFL_Spark_Model_Scoring.xml:633``) — a regular time grid its downstream
consumers assume. Batch analytics over irregular events needs the same
regularization: bucket to a fixed grain, materialize EMPTY buckets, and
forward-fill carried values.

Strategy: aggregate to the grain first (shrinks data to one row per
(key, bucket) BEFORE the grid join), build each key's dense bucket grid
with ``sequence`` + ``explode`` (generated distributed, never collected),
left-join sparse onto dense on (key, bucket) — co-partitioned equi-join —
then forward-fill with ``last(ignoreNulls)`` over the per-key sort. At
100 TB the cost is one shuffle on the key; grid size is bounded by
span/grain per key, independent of raw event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nfl_predictions_spark.sources.tables import table

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def gap_fill(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    grain: str,
    aggs: list,
    ffill_cols: list[str] | None = None,
) -> DataFrame:
    """Resample ``df`` to a dense ``grain`` grid per key: one row per
    (keys, bucket) from each key's min to max bucket, with ``aggs``
    computed on present buckets, absent buckets materialized, and
    ``ffill_cols`` forward-filled from the last present bucket."""
    bucketed = df.withColumn("__bucket", F.date_trunc(grain, F.col(ts_col)))
    sparse = bucketed.groupBy(*keys, "__bucket").agg(*aggs)
    span = sparse.groupBy(*keys).agg(
        F.min("__bucket").alias("__b0"), F.max("__bucket").alias("__b1")
    )
    grid = span.select(
        *keys,
        F.explode(
            F.sequence("__b0", "__b1", F.expr(f"INTERVAL 1 {grain.upper()}"))
        ).alias("__bucket"),
    )
    dense = grid.join(sparse, [*keys, "__bucket"], "left")
    if ffill_cols:
        w = (
            Window.partitionBy(*keys)
            .orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        dense = dense.select(
            *[c for c in dense.columns if c not in ffill_cols],
            *[F.last(c, ignorenulls=True).over(w).alias(c) for c in ffill_cols],
        )
    return dense.withColumnRenamed("__bucket", f"{ts_col}_bucket")


@_q(
    "q64_gap_fill",
    "WITH sparse AS ("
    "  SELECT user_id, date_trunc('hour', ts) AS b, count(*) AS cnt, "
    "         ROUND(sum(value), 6) AS val "
    "  FROM events GROUP BY 1, 2), "
    "span AS (SELECT user_id, min(b) AS b0, max(b) AS b1 FROM sparse GROUP BY 1), "
    "grid AS (SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS b "
    "         FROM span) "
    "SELECT g.user_id, g.b AS ts_bucket, COALESCE(s.cnt, 0) AS cnt, "
    "       last_value(s.val IGNORE NULLS) OVER "
    "         (PARTITION BY g.user_id ORDER BY g.b "
    "          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val_ffill "
    "FROM grid g LEFT JOIN sparse s ON s.user_id = g.user_id AND s.b = g.b "
    "ORDER BY g.user_id, ts_bucket",
)
def q64_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user resample of events with empty buckets materialized
    (cnt=0) and the bucket's summed value forward-filled across gaps."""
    dense = gap_fill(
        table(spark, sf_dir, "events"),
        ts_col="ts",
        keys=["user_id"],
        grain="hour",
        aggs=[
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 6).alias("val"),
        ],
        ffill_cols=["val"],
    )
    return dense.select(
        "user_id",
        "ts_bucket",
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
        F.col("val").alias("val_ffill"),
    ).orderBy("user_id", "ts_bucket")


_WMA_WEIGHTS = [5, 4, 3, 2, 1]  # most-recent-first, 5-row window


@_q(
    "q92_weighted_moving_avg",
    """
    WITH w AS (
      SELECT user_id, ts, event_id, value,
        lag(value, 1) OVER win AS v1, lag(value, 2) OVER win AS v2,
        lag(value, 3) OVER win AS v3, lag(value, 4) OVER win AS v4
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
      ROUND((5*value + 4*COALESCE(v1,0) + 3*COALESCE(v2,0)
           + 2*COALESCE(v3,0) + 1*COALESCE(v4,0))
        / (5 + CASE WHEN v1 IS NULL THEN 0 ELSE 4 END
             + CASE WHEN v2 IS NULL THEN 0 ELSE 3 END
             + CASE WHEN v3 IS NULL THEN 0 ELSE 2 END
             + CASE WHEN v4 IS NULL THEN 0 ELSE 1 END), 6) AS wma
    FROM w ORDER BY user_id, event_id
    """,
)
def q92_weighted_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-weighted moving average (WMA-5) per user over event
    time — the smoothing pass a feature pipeline runs before modeling.
    Expressed as lag() arithmetic rather than a UDAF: one window shuffle
    on user_id, whole-stage codegen for the weighted sum, and BOTH
    engines evaluate the identical fixed-order expression tree, so the
    floats agree bit-for-bit before the presentation rounding. Warm-up
    rows renormalize over the weights actually present instead of
    zero-padding the average down."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.col("value")] + [
        F.lag("value", k).over(w) for k in range(1, len(_WMA_WEIGHTS))
    ]
    num = sum(
        (F.coalesce(c, F.lit(0.0)) * float(wt) for c, wt in zip(lags, _WMA_WEIGHTS)),
        start=F.lit(0.0),
    )
    den = sum(
        (F.when(c.isNull(), 0.0).otherwise(float(wt)) for c, wt in zip(lags, _WMA_WEIGHTS)),
        start=F.lit(0.0),
    )
    return (
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .withColumn("wma", F.round(num / den, 6))
        .select("user_id", "event_id", "wma")
        .orderBy("user_id", "event_id")
    )
