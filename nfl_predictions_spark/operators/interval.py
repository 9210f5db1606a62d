"""Range (interval) join — match points to [lo, hi) intervals.

The reference buckets plays into scoring bands driver-side (best-play
selection over score ranges, reference ``assets/app_nfl.py:296-316``
renders ranked score intervals); generalized, that is a point-in-interval
join, which Spark's planner only knows how to execute as a theta
BroadcastNestedLoop / cartesian — O(n·m) and un-shuffleable.

Strategy: **bucketed equi-join**. Chop every interval into fixed-width
buckets (``sequence`` + ``explode`` — an interval spanning k buckets
yields k rows), tag each point with its bucket (``floor(p / width)``),
equi-join on the bucket id, then re-check the exact predicate. Catalyst
gets a plain hash join: broadcastable when the interval side is small,
shuffle-partitionable on the bucket id when both sides are huge. Bucket
width tunes replication vs. join fan-in; skewy buckets fall to AQE.
Overlapping and non-uniform intervals are fine — overlap just means a
point matches several intervals, exactly as the predicate says.
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


def range_join(
    points: DataFrame,
    point_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi``, via bucket-id equi-join instead of a nested
    loop. ``bucket_width`` should be on the order of the typical
    interval span: smaller wastes replication, larger widens the
    re-check fan-in."""
    w = F.lit(bucket_width)
    exploded = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                # hi is exclusive: ceil(hi/w)-1 stops at the last bucket
                # the half-open interval actually reaches
                (F.ceil(F.col(hi_col) / w) - 1).cast("long"),
            )
        ),
    )
    tagged = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / w).cast("long")
    )
    return (
        tagged.join(exploded, on="__bucket")
        .where((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("__bucket")
    )


_BANDS = [
    ("budget", 0.0, 100_000.0),
    ("mid", 80_000.0, 250_000.0),  # overlaps budget
    ("high", 250_000.0, 450_000.0),
    ("luxe", 400_000.0, 600_000.0),  # overlaps high
]

_BANDS_SQL = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)


@_q(
    "q65_range_join",
    "SELECT o.o_orderkey, b.band, ROUND(o.o_totalprice, 3) AS price "
    f"FROM orders o JOIN (VALUES {_BANDS_SQL}) b(band, lo, hi) "
    "ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi "
    "ORDER BY o.o_orderkey, b.band",
)
def q65_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders matched to overlapping price bands through the bucketed
    range join (oracle: the equivalent theta BETWEEN join — same rows,
    nested-loop plan)."""
    bands = spark.createDataFrame(_BANDS, "band string, lo double, hi double")
    joined = range_join(
        table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        "o_totalprice",
        bands,
        "lo",
        "hi",
        bucket_width=50_000.0,
    )
    return joined.select(
        "o_orderkey", "band", F.round("o_totalprice", 3).alias("price")
    ).orderBy("o_orderkey", "band")


# ---------------------------------------------------------------------------
# q129 — interval-overlap concurrency (sweep line)
# ---------------------------------------------------------------------------


@_q(
    "q129_max_concurrency",
    """
    WITH iv AS (
      SELECT CAST(l_shipdate AS DATE) AS ship_d,
             CAST(l_shipdate AS DATE) + CAST((1 + l_orderkey % 14) AS INTEGER)
               AS end_d
      FROM lineitem
    ), deltas AS (
      SELECT ship_d AS d, 1 AS delta FROM iv
      UNION ALL
      SELECT end_d + 1, -1 FROM iv
    ), daily AS (
      SELECT d, sum(delta) AS net FROM deltas GROUP BY 1
    ), running AS (
      SELECT d, CAST(sum(net) OVER (
        ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS BIGINT) AS concurrent
      FROM daily
    )
    SELECT d, concurrent FROM running
    ORDER BY concurrent DESC, d LIMIT 20
    """,
)
def q129_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval overlap via a sweep line: every shipment is in
    flight from its ship date for a deterministic 1-14 day transit
    (derived from the order key); each interval contributes +1 at its
    start and -1 the day after its end, and the running sum of per-day
    net deltas IS the number of shipments in flight that day. Top-20
    peak days returned.

    Scale shape: the raw table collapses to one row per distinct date
    (bounded domain — a few thousand days regardless of row count) in a
    map-side-combined aggregate, and only that tiny series flows into
    the ordered prefix sum — the classic trick that turns an O(n^2)
    overlap count into one aggregation plus one window over a
    date-sized series. No interval self-join anywhere."""
    li = table(spark, sf_dir, "lineitem").select(
        F.to_date("l_shipdate").alias("ship_d"),
        F.date_add(
            F.to_date("l_shipdate"),
            (F.lit(1) + F.col("l_orderkey") % 14).cast("int"),
        ).alias("end_d"),
    )
    deltas = li.select(
        F.col("ship_d").alias("d"), F.lit(1).alias("delta")
    ).unionByName(
        li.select(F.date_add("end_d", 1).alias("d"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.withColumn("concurrent", F.sum("net").over(w).cast("long"))
        .select("d", "concurrent")
        .orderBy(F.desc("concurrent"), F.asc("d"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q242 — interval-union length (deduplicated active time per user)
# ---------------------------------------------------------------------------

_IU_SESSION_MIN = 5  # each event opens a 5-minute activity interval


@_q(
    "q242_interval_union_length",
    f"""
    WITH iv AS (
      SELECT user_id, ts AS lo,
             ts + INTERVAL {_IU_SESSION_MIN} MINUTES AS hi
      FROM events
    ), o AS (
      SELECT user_id, lo, hi,
             max(hi) OVER (PARTITION BY user_id ORDER BY lo, hi
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM iv
    ), grp AS (
      SELECT user_id, lo, hi,
             sum(CASE WHEN prev_max IS NULL OR lo > prev_max
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY lo, hi) AS g
      FROM o
    ), merged AS (
      SELECT user_id, g, min(lo) AS lo, max(hi) AS hi
      FROM grp GROUP BY user_id, g
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(epoch_us(hi) - epoch_us(lo)) / 60000000.0 AS DOUBLE)
             AS active_minutes
    FROM merged GROUP BY user_id
    ORDER BY user_id LIMIT 50
    """,
)
def q242_interval_union_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduplicated active time per user: every event opens a
    {_IU_SESSION_MIN}-minute activity interval; overlapping intervals
    must be UNIONED before summing or busy users double-count (the
    billing/engagement bug naive sum-of-sessions has). The union is the
    classic gaps-and-islands sweep — running max of interval ends over
    the per-user sort; a new island starts exactly when lo exceeds
    every previous end — so the whole merge is ONE window pass keyed on
    user_id, no self-join, no explode of minute grains.

    Complements q129 (max concurrency = how DEEP overlaps stack) with
    total coverage = how WIDE they reach. Durations are exact BIGINT
    microsecond arithmetic; the minutes conversion is one division of
    identical integers.
    """
    iv = table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr(f"INTERVAL {_IU_SESSION_MIN} MINUTES")).alias("hi"),
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("lo", "hi")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ws = Window.partitionBy("user_id").orderBy("lo", "hi")
    grp = iv.withColumn("prev_max", F.max("hi").over(wp)).withColumn(
        "g",
        F.sum(
            F.when(
                F.col("prev_max").isNull() | (F.col("lo") > F.col("prev_max")), 1
            ).otherwise(0)
        ).over(ws),
    )
    merged = grp.groupBy("user_id", "g").agg(
        F.min("lo").alias("lo"), F.max("hi").alias("hi")
    )
    # events.ts is TIMESTAMP_NTZ; unix_micros wants TIMESTAMP — the cast
    # is UTC-for-UTC under the session timezone, so values are unchanged
    dur_us = F.unix_micros(F.col("hi").cast("timestamp")) - F.unix_micros(
        F.col("lo").cast("timestamp")
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            (F.sum(dur_us) / 60000000.0).cast("double").alias("active_minutes"),
        )
        .select("user_id", F.col("n_intervals").cast("long"), "active_minutes")
        .orderBy("user_id")
        .limit(50)
    )
