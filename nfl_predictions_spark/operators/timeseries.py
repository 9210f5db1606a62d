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
