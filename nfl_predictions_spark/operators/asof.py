"""As-of (temporal) join — match each left row to the latest right row at
or before its timestamp, per key.

The reference joins its stream of plays to the most recent model state by
re-scoring every request against the loaded pipeline (reference
``assets/app_nfl.py:153-156`` — effectively "latest state as of now");
this module generalizes that to a real as-of join over event time.

Spark has no ASOF JOIN operator, so this is the composition strategy the
task calls for: a **union + sorted window forward-fill**. Tag right rows,
union with left rows, and within each key take
``last(right_value, ignoreNulls=True)`` over ``ORDER BY ts, side ROWS
UNBOUNDED PRECEDING``. Cost model at scale: ONE hash shuffle on the key
plus a per-partition sort — the same shuffle a plain equi-join would pay,
with no range-explosion (a naive ``l.ts >= r.ts`` theta join is O(n·m)
per key and un-broadcastable at 100 TB). AQE handles skewed keys; the
window never materializes more than one partition's run.

DuckDB has native ``ASOF JOIN``, which is the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    tolerance: Column | None = None,
) -> DataFrame:
    """Left as-of join: for every ``left`` row, attach ``value_cols`` from
    the latest ``right`` row with ``right[on] <= left[on]`` and equal
    ``by`` keys; null when none exists (or when the match is older than
    ``tolerance``, an interval/numeric delta on ``on``).

    ``right`` must be unique per (*by, on) — pre-aggregate it otherwise
    (ties would make "the" as-of row ill-defined in any engine).

    Implementation: union-tag-window. Right rows sort BEFORE left rows at
    equal ``on`` (side 0 < 1) so an exact-timestamp right row is visible
    to the left row, matching ``ASOF JOIN ... ON l.on >= r.on``.
    """
    side = F.lit(0)
    l_cols = [c for c in left.columns]
    tagged_r = right.select(
        *by,
        F.col(on).alias(on),
        side.alias("__side"),
        F.col(on).alias("__r_on"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c not in by and c != on],
    )
    tagged_l = left.select(
        *by,
        F.col(on).alias(on),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[on].dataType).alias("__r_on"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        *[F.col(c) for c in l_cols if c not in by and c != on],
    )
    unioned = tagged_r.unionByName(tagged_l)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *unioned.columns,
        F.last("__r_on", ignorenulls=True).over(w).alias("__m_on"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in value_cols
        ],
    ).where(F.col("__side") == 1)
    if tolerance is not None:
        in_tol = F.col("__m_on") >= (F.col(on) - tolerance)
        matched = [
            F.when(in_tol, F.col(f"__m_{c}")).alias(f"{c}_asof") for c in value_cols
        ]
        m_on = F.when(in_tol, F.col("__m_on")).alias(f"{on}_asof")
    else:
        matched = [F.col(f"__m_{c}").alias(f"{c}_asof") for c in value_cols]
        m_on = F.col("__m_on").alias(f"{on}_asof")
    return filled.select(
        *by,
        on,
        *[c for c in l_cols if c not in by and c != on],
        m_on,
        *matched,
    )


_ASOF_CTE = (
    "WITH v AS (SELECT user_id, ts, max(event_id) AS view_event, "
    "arg_max(value, event_id) AS view_value "
    "FROM events WHERE event_type = 'view' GROUP BY user_id, ts), "
    "p AS (SELECT event_id, user_id, ts, value FROM events "
    "WHERE event_type = 'purchase') "
)


@_q(
    "q63_asof_join",
    _ASOF_CTE
    + "SELECT p.event_id, p.user_id, p.ts, ROUND(p.value, 6) AS purchase_value, "
    "v.ts AS ts_asof, v.view_event AS view_event_asof, "
    "ROUND(v.view_value, 6) AS view_value_asof "
    "FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts "
    "ORDER BY p.event_id",
)
def q63_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase event joined to the user's latest view event at or
    before it (oracle: DuckDB native ASOF LEFT JOIN)."""
    ev = table(spark, sf_dir, "events")
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("view_event"),
            F.max_by("value", "event_id").alias("view_value"),
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases, views, on="ts", by=["user_id"], value_cols=["view_event", "view_value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 6).alias("purchase_value"),
        "ts_asof",
        F.col("view_event_asof"),
        F.round("view_value_asof", 6).alias("view_value_asof"),
    ).orderBy("event_id")


@_q(
    "q63b_asof_tolerance",
    _ASOF_CTE
    + "SELECT p.event_id, p.user_id, "
    "CASE WHEN v.ts >= p.ts - INTERVAL 1 HOUR THEN v.view_event END AS view_event_asof, "
    "CASE WHEN v.ts >= p.ts - INTERVAL 1 HOUR THEN v.ts END AS ts_asof "
    "FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts "
    "ORDER BY p.event_id",
)
def q63b_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a 1-hour tolerance: matches older than the window
    are nulled (oracle: ASOF LEFT JOIN + CASE on the matched timestamp —
    identical semantics, since the as-of row is the latest <= ts and
    tolerance only invalidates it)."""
    ev = table(spark, sf_dir, "events")
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        views,
        on="ts",
        by=["user_id"],
        value_cols=["view_event"],
        tolerance=F.expr("INTERVAL 1 HOUR"),
    )
    return joined.select("event_id", "user_id", "view_event_asof", "ts_asof").orderBy(
        "event_id"
    )


# ---------------------------------------------------------------------------
# q243 — nearest-in-time join (bidirectional as-of)
# ---------------------------------------------------------------------------


@_q(
    "q243_nearest_asof_join",
    """
    WITH v AS (
      SELECT user_id, ts, max(event_id) AS view_event
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ), p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), pairs AS (
      SELECT p.event_id, p.user_id, p.ts, v.view_event, v.ts AS vts,
             abs(epoch_us(p.ts) - epoch_us(v.ts)) AS gap,
             row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY abs(epoch_us(p.ts) - epoch_us(v.ts)), v.ts, v.view_event
             ) AS rn
      FROM p JOIN v ON v.user_id = p.user_id
    )
    SELECT p.event_id, p.user_id, p.ts,
           b.view_event AS nearest_view_event,
           b.vts AS nearest_view_ts,
           CAST(b.gap AS BIGINT) AS gap_us,
           CASE WHEN b.gap = 0 THEN 'same'
                WHEN b.vts < p.ts THEN 'backward'
                WHEN b.vts IS NULL THEN NULL
                ELSE 'forward' END AS direction
    FROM p LEFT JOIN (SELECT * FROM pairs WHERE rn = 1) b
      ON b.event_id = p.event_id
    ORDER BY p.event_id
    """,
)
def q243_nearest_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time join: each purchase matched to the user's view
    with the SMALLEST absolute time gap, in either direction (ties go
    to the earlier view) — the bidirectional sibling of q63's
    backward-only as-of, the semantics sensor-fusion and attribution
    pipelines actually want when "latest before" is wrong half the
    time.

    Spark side is the efficient sorted-union formulation: views and
    purchases interleave on ONE per-user sort, a last(ignoreNulls)
    window finds the backward candidate and a first(ignoreNulls) over
    the following frame finds the forward one — O(n log n) per user
    partition, no pairwise join. The oracle is the literal brute force
    (all purchase x view pairs per user, global argmin) — obviously
    correct, quadratic, and exactly what the window formulation must
    reproduce bit-for-bit: gaps are exact BIGINT microseconds.
    """
    ev = table(spark, sf_dir, "events")
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event"))
        .select(
            "user_id",
            "ts",
            "view_event",
            F.lit(0).alias("kind"),
            F.lit(None).cast("long").alias("event_id"),
        )
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("view_event"),
        F.lit(1).alias("kind"),
        "event_id",
    )
    u = views.unionByName(purch)
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    vts = F.when(F.col("kind") == 0, F.col("ts"))
    vev = F.when(F.col("kind") == 0, F.col("view_event"))
    c = (
        u.withColumn("b_ts", F.last(vts, ignorenulls=True).over(wb))
        .withColumn("b_ev", F.last(vev, ignorenulls=True).over(wb))
        .withColumn("f_ts", F.first(vts, ignorenulls=True).over(wf))
        .withColumn("f_ev", F.first(vev, ignorenulls=True).over(wf))
        .filter(F.col("kind") == 1)
    )
    us = lambda col: F.unix_micros(F.col(col).cast("timestamp"))  # noqa: E731
    gap_b = us("ts") - us("b_ts")
    gap_f = us("f_ts") - us("ts")
    take_backward = F.col("b_ts").isNotNull() & (
        F.col("f_ts").isNull() | (gap_b <= gap_f)
    )
    nearest_ts = F.when(take_backward, F.col("b_ts")).otherwise(F.col("f_ts"))
    nearest_ev = F.when(take_backward, F.col("b_ev")).otherwise(F.col("f_ev"))
    gap = F.when(take_backward, gap_b).otherwise(gap_f)
    direction = (
        F.when(nearest_ts.isNull(), None)
        .when(gap == 0, "same")
        .when(nearest_ts < F.col("ts"), "backward")
        .otherwise("forward")
    )
    return (
        c.select(
            "event_id",
            "user_id",
            "ts",
            nearest_ev.alias("nearest_view_event"),
            nearest_ts.alias("nearest_view_ts"),
            gap.cast("long").alias("gap_us"),
            direction.alias("direction"),
        )
        .orderBy("event_id")
    )
