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
