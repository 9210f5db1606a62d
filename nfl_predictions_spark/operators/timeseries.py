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


# ---------------------------------------------------------------------------
# q124 — gap-based sessionization (batch analogue of the q33 session
# window stream; engine-added, no reference counterpart)
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


@_q(
    "q124_sessionize",
    f"""
    WITH e AS (
      SELECT user_id, ts, event_id, value,
             lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR date_diff('microsecond', prev_ts, ts) > {_SESSION_GAP_US}
                     THEN 1 ELSE 0 END AS is_new
      FROM e
    ), sess AS (
      SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS session_idx
      FROM flagged
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           ROUND(sum(value), 6) AS total_value,
           ROUND(date_diff('microsecond', min(ts), max(ts)) / 1000000.0, 6)
             AS duration_s
    FROM sess GROUP BY user_id, session_idx
    ORDER BY user_id, session_idx
    """,
)
def q124_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a user's events split into sessions
    wherever >30 min passes between consecutive events, via the classic
    lag -> new-session flag -> running-sum session index, then one
    grouped aggregate per session.

    Both windows and the final groupBy share ONE partitioning (user_id)
    and one sort (ts, event_id tie-break), so Catalyst plans a single
    shuffle + sort and pipelines lag -> flag -> running sum -> partial
    agg. Gap comparison is integer microseconds (timestampdiff /
    date_diff — TIMESTAMP_NTZ-safe) — exact and identical across
    engines. At 100 TB the session key never leaves its user partition:
    this is the shape that sessionizes a year of clickstream in one
    pass."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    sess = (
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_ts").isNull() | (gap_us > _SESSION_GAP_US),
                1,
            ).otherwise(0),
        )
        .withColumn("session_idx", F.sum("is_new").over(run).cast("long"))
    )
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .withColumn(
            "duration_s",
            F.round(
                F.expr(
                    "timestampdiff(MICROSECOND, session_start, session_end)"
                )
                / 1_000_000.0,
                6,
            ),
        )
        .select(
            "user_id",
            "session_idx",
            "session_start",
            "session_end",
            "n_events",
            "total_value",
            "duration_s",
        )
        .orderBy("user_id", "session_idx")
    )


# ---------------------------------------------------------------------------
# q126 — rolling z-score anomaly detection
# ---------------------------------------------------------------------------

_Z_LOOKBACK = 20  # trailing rows the baseline is estimated from
_Z_MIN_N = 10  # minimum history before a score is emitted
_Z_THRESHOLD = 2.5


@_q(
    "q126_rolling_zscore",
    f"""
    WITH scored AS (
      SELECT user_id, ts, event_id, value,
        avg(value) OVER w AS mu,
        stddev_samp(value) OVER w AS sigma,
        count(*) OVER w AS n_hist
      FROM events
      WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN {_Z_LOOKBACK} PRECEDING AND 1 PRECEDING
      )
    )
    SELECT user_id, event_id, ROUND(value, 6) AS value,
           ROUND((value - mu) / sigma, 6) AS zscore
    FROM scored
    WHERE n_hist >= {_Z_MIN_N} AND sigma > 0
      AND abs(ROUND((value - mu) / sigma, 6)) > {_Z_THRESHOLD}
    ORDER BY user_id, event_id
    """,
)
def q126_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event's value scored
    against the mean/stddev of its user's trailing {_Z_LOOKBACK} events
    (current row excluded, so an outlier can't mask itself), emitting
    rows whose |z| exceeds {_Z_THRESHOLD} once {_Z_MIN_N} history rows
    exist.

    One window shuffle on user_id serves all three frame aggregates;
    the frame is row-bounded so state per key is O(lookback) — the
    streaming analogue is q35's state-store shape. Both engines
    evaluate the same trailing frame in the same (ts, event_id) order,
    so mu/sigma agree to ~1e-12; the threshold decision is made on the
    SAME 6-decimal-rounded z both engines emit, so a value sitting
    within float noise of the threshold can't be included by one engine
    and excluded by the other."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_Z_LOOKBACK, -1)
    )
    scored = (
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .withColumn("mu", F.avg("value").over(w))
        .withColumn("sigma", F.stddev_samp("value").over(w))
        .withColumn("n_hist", F.count(F.lit(1)).over(w))
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 6)
    return (
        scored.filter(
            (F.col("n_hist") >= _Z_MIN_N)
            & (F.col("sigma") > 0)
            & (F.abs(z) > _Z_THRESHOLD)
        )
        .select(
            "user_id",
            "event_id",
            F.round("value", 6).alias("value"),
            F.round(z, 6).alias("zscore"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# q142 — last-touch attribution
# ---------------------------------------------------------------------------

_TOUCH_TYPES = ("click", "view")


@_q(
    "q142_last_touch_attribution",
    f"""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
        last_value(CASE WHEN event_type IN {_TOUCH_TYPES} THEN event_type END
                   IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      FROM events
    )
    SELECT COALESCE(touch, '(none)') AS touch_type,
      CAST(count(*) AS BIGINT) AS purchases,
      round(sum(CAST(value AS DECIMAL(18,6))), 6) :: DOUBLE AS attributed_value
    FROM tagged WHERE event_type = 'purchase'
    GROUP BY touch_type ORDER BY touch_type
    """,
)
def q142_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution — every purchase is credited to the most
    recent preceding marketing touch (click/view) by the same user:
    the classic event-analytics operator that needs ordered per-entity
    state, expressed as one IGNORE NULLS last_value window instead of
    a self-join (the self-join form explodes on users with many
    events; the window form is a single per-user sort that the
    sessionizer q124 already pays).

    Determinism: window order is (ts, event_id) — a total order.
    Attributed revenue sums in exact DECIMAL then rounds once to
    DOUBLE on the wire (the q96 lesson). At 100 TB this is one
    shuffle on user_id shared with every other per-user window op, a
    candidate for a bucketed event layout."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type").isin(*_TOUCH_TYPES), F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch"), F.lit("(none)")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("purchases"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6)
            .cast("double")
            .alias("attributed_value"),
        )
        .orderBy("touch_type")
    )


# ---------------------------------------------------------------------------
# q143 — weekly cohort retention
# ---------------------------------------------------------------------------


@_q(
    "q143_cohort_retention",
    """
    WITH ev AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
    ), f AS (
      SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id
    ), a AS (
      SELECT DISTINCT user_id, week FROM ev
    ), j AS (
      SELECT f.cohort_week,
             date_diff('day', f.cohort_week, a.week) // 7 AS week_offset,
             a.user_id
      FROM a JOIN f ON a.user_id = f.user_id
    ), r AS (
      SELECT cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
             CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
      FROM j GROUP BY 1, 2
    ), s AS (
      SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size FROM f GROUP BY 1
    )
    SELECT r.cohort_week, r.week_offset, r.active_users, s.cohort_size,
           round(r.active_users * 1.0 / s.cohort_size, 6) AS retention
    FROM r JOIN s ON r.cohort_week = s.cohort_week
    ORDER BY r.cohort_week, r.week_offset
    """,
)
def q143_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention — users grouped by first-activity week,
    retention = share of the cohort active again N weeks later. The
    classic product-analytics triangle (the reference's season-long play
    log is the same shape: team first-seen week vs weeks with plays).

    Scale design: ONE shuffle on user_id does all the per-user work —
    ``groupBy(user_id).agg(min(week), collect_set(week))`` — because the
    per-user week set is bounded by span/grain (5 weeks here, ~52 for a
    year), not by event count; the exploded (cohort_week, offset) agg and
    the cohort-size join are vocabulary-sized. The naive form (distinct +
    separate first-week agg + user-level join) pays three wide stages on
    the raw events; this pays one.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("week").alias("cohort_week"),
        F.collect_set("week").alias("weeks"),
    )
    hit = per_user.select(
        "user_id",
        "cohort_week",
        F.explode("weeks").alias("week"),
    ).withColumn(
        "week_offset", (F.datediff("week", "cohort_week") / 7).cast("long")
    )
    r = hit.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("active_users")  # weeks is a set => distinct users
    )
    # cohort_size == the offset-0 active count (everyone is active in
    # their own first week), taken from the SAME aggregate via a window
    # over the vocabulary-sized frame — one scan + one user_id shuffle
    # total; a separate sizes-aggregate branch would re-scan the fact
    # table (filter pushdown specializes the subtree, defeating reuse).
    wc = Window.partitionBy("cohort_week")
    size = F.max(
        F.when(F.col("week_offset") == 0, F.col("active_users"))
    ).over(wc)
    return (
        r.select(
            "cohort_week",
            "week_offset",
            "active_users",
            size.alias("cohort_size"),
        )
        .withColumn(
            "retention",
            F.round(F.col("active_users") / F.col("cohort_size"), 6),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# q144 — Markov transition matrix over per-user event sequences
# ---------------------------------------------------------------------------


@_q(
    "q144_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ), c AS (
      SELECT prev_type, event_type AS next_type,
             CAST(count(*) AS BIGINT) AS transitions
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, next_type, transitions,
           round(transitions * 1.0 /
                 sum(transitions) OVER (PARTITION BY prev_type), 6) AS p
    FROM c ORDER BY prev_type, next_type
    """,
)
def q144_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next event type | current event type). The reference's play
    sequencing (its ``/api`` picks the next play from the previous
    down's state, assets/app_nfl.py:296-316) is exactly a learned
    transition structure; here it is estimated corpus-wide.

    Scale design: one per-user window sort (shared shuffle key with
    q124/q142), then the transition counts collapse to
    |event_types|^2 rows — the normalizing window runs on a
    vocabulary-sized frame, not on events. Window order (ts, event_id)
    is total, so lag() is deterministic."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    c = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type"), F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("transitions"))
    )
    wp = Window.partitionBy("prev_type")
    return c.select(
        "prev_type",
        "next_type",
        "transitions",
        F.round(F.col("transitions") / F.sum("transitions").over(wp), 6).alias("p"),
    ).orderBy("prev_type", "next_type")


# ---------------------------------------------------------------------------
# q155 — trailing-window distinct users (exact + sketch scale path)
# ---------------------------------------------------------------------------


@_q(
    "q155_sliding_distinct",
    """
    WITH daily AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS (SELECT DISTINCT day FROM daily)
    SELECT d.day, CAST(count(DISTINCT a.user_id) AS BIGINT) AS users_7d
    FROM days d JOIN daily a ON a.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day ORDER BY d.day
    """,
)
def q155_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the sliding
    COUNT(DISTINCT) that a plain window frame cannot express (distinct
    does not decompose over frames). Exact strategy: collapse events to
    distinct (day, user) FIRST (one shuffle, map-side combined), then
    expand each row into the <=7 window days it serves via a
    calendar-sized broadcast range join, then one distinct-count
    shuffle. Work is O(active-pairs x window), never O(events x
    window). At 100 TB the same plan holds (the days frame stays
    calendar-sized); when exactness can be traded, q155b unions
    per-day HLL sketches over the trailing frame instead — constant
    state per day, no second distinct shuffle."""
    ev = table(spark, sf_dir, "events")
    daily = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    days = daily.select("day").distinct()
    return (
        daily.join(
            F.broadcast(days.select(F.col("day").alias("asof"))),
            (F.col("day") <= F.col("asof"))
            & (F.col("day") >= F.date_sub(F.col("asof"), 6)),
        )
        .groupBy(F.col("asof").alias("day"))
        .agg(F.countDistinct("user_id").alias("users_7d"))
        .orderBy("day")
    )


def q155b_sliding_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch path for q155: one HLL sketch per day (constant size),
    trailing-window union + estimate. The per-day sketch agg is the
    only pass over the data; the window union runs on the
    calendar-sized frame. Certified against the exact path in tests
    (DataSketches HLL at default lgK is well inside 5% here)."""
    ev = table(spark, sf_dir, "events")
    sk = (
        ev.select(F.to_date("ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return (
        sk.select(
            "day",
            F.hll_sketch_estimate(F.expr("hll_union_agg(sk)").over(w)).alias(
                "users_7d_est"
            ),
        )
        .orderBy("day")
    )


QUERIES["q155b_sliding_distinct_hll"] = q155b_sliding_distinct_hll


# ---------------------------------------------------------------------------
# q168 — multi-resolution continuous aggregate (hypertable rollup)
# ---------------------------------------------------------------------------


def _cagg_oracle() -> str:
    return """
    SELECT 'minute' AS resolution, date_trunc('minute', ts) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS val
    FROM events GROUP BY bucket
    UNION ALL
    SELECT 'hour', date_trunc('hour', ts), CAST(count(*) AS BIGINT),
           CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE)
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'day', CAST(date_trunc('day', ts) AS TIMESTAMP),
           CAST(count(*) AS BIGINT),
           CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE)
    FROM events GROUP BY 2
    ORDER BY resolution, bucket
    """


@_q("q168_continuous_aggregate", _cagg_oracle())
def q168_continuous_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the 1-minute, 1-hour and
    1-day rollups of the event stream from ONE scan.

    TimescaleDB materializes each resolution as its own continuous
    aggregate (three refresh jobs, three scans). Here GROUPING SETS over
    the three precomputed bucket columns gives Catalyst an Expand node:
    one pass over events, rows fanned 3x map-side, partial aggs combine
    before the single shuffle. The oracle is the honest three-scan
    union. (q60 pins grouping-sets semantics on dimension columns; this
    is the time-bucket hierarchy a metrics store actually serves.)

    Scale: the fan-out factor is the number of resolutions (constant),
    and each partial agg is bucket-keyed so map-side combine collapses
    to ~|buckets| rows per task before shuffling — the same reason a
    hypertable rollup is cheap: cardinality drops three orders of
    magnitude at the first combine.
    """
    ev = table(spark, sf_dir, "events").select(
        F.date_trunc("minute", "ts").alias("m"),
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        F.col("value").cast("decimal(18,3)").alias("v"),
    )
    ev.createOrReplaceTempView("_cagg_src")
    out = spark.sql(
        """
        SELECT CASE WHEN grouping(m) = 0 THEN 'minute'
                    WHEN grouping(h) = 0 THEN 'hour'
                    ELSE 'day' END AS resolution,
               coalesce(m, h, d) AS bucket,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(v) AS DOUBLE) AS val
        FROM _cagg_src
        GROUP BY GROUPING SETS ((m), (h), (d))
        """
    )
    return out.orderBy("resolution", "bucket")


# ---------------------------------------------------------------------------
# q175 — time-weighted average (LOCF weighting, TimescaleDB time_weight)
# ---------------------------------------------------------------------------


def _twa_oracle() -> str:
    return """
    WITH seg AS (
      SELECT user_id, value,
             epoch_us(ts) AS t,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS t_next
      FROM events
    ), agg AS (
      SELECT user_id,
             sum(CAST(value AS DECIMAL(18,6)) * (t_next - t)) AS wsum,
             CAST(max(t_next) - min(t) AS BIGINT) AS span_us,
             CAST(count(*) AS BIGINT) AS n_events
      FROM seg WHERE t_next IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id,
           round(CAST(wsum AS DOUBLE) / span_us, 6) AS twa,
           span_us, n_events
    FROM agg ORDER BY user_id
    """


@_q("q175_time_weighted_avg", _twa_oracle())
def q175_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user (TimescaleDB ``time_weight``
    with LOCF weighting): each observation holds its value until the
    next one, so its weight is the microsecond gap to the successor;
    the final observation carries no duration.

    Determinism: weights are exact BIGINT microsecond gaps, each
    value*gap partial is exact DECIMAL (value is 2-dp), and only the
    final quotient runs in IEEE doubles on engine-identical inputs.
    Scale: one per-user window (the shared user_id sort every
    sessionize/funnel op also uses) plus a map-side-combinable agg —
    no extra shuffle beyond the keyed sort.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            "value",
            "event_id",
            "ts",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        )
        .withColumn(
            "t_next",
            F.lead(F.unix_micros(F.col("ts").cast("timestamp"))).over(w),
        )
        .where(F.col("t_next").isNotNull())
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.sum(
                F.col("value").cast("decimal(18,6)") * (F.col("t_next") - F.col("t"))
            ).alias("wsum"),
            (F.max("t_next") - F.min("t")).alias("span_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.round(F.col("wsum").cast("double") / F.col("span_us"), 6).alias("twa"),
            "span_us",
            "n_events",
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q176 — resample with linear interpolation between observations
# ---------------------------------------------------------------------------


def _interp_oracle() -> str:
    return """
    WITH obs AS (
      SELECT user_id, date_trunc('hour', ts) AS b,
             round(CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE)
                   / count(*), 6) AS v
      FROM events GROUP BY user_id, b
    ), grid AS (
      SELECT user_id, unnest(generate_series(min(b), max(b),
                                             INTERVAL 1 HOUR)) AS b
      FROM obs GROUP BY user_id
    ), g AS (
      SELECT grid.user_id, grid.b, obs.v,
             CAST(epoch(grid.b) / 3600 AS BIGINT) AS h
      FROM grid LEFT JOIN obs ON obs.user_id = grid.user_id
                             AND obs.b = grid.b
    ), f AS (
      SELECT user_id, b, v, h,
        last_value(v IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        first_value(v IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM g
    )
    SELECT user_id, b AS bucket,
           -- explicit half-up at 6 dp: interpolating round-6 endpoints
           -- at rational fractions (k/m = 1/2) lands on EXACT .5 ties,
           -- where the engines' ROUND modes differ; floor(x*1e6 + 0.5)
           -- is the same IEEE op sequence in both.
           floor((CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * (h - ph) / (nh - ph)
           END) * 1000000 + 0.5) / 1000000 + 0.0 AS val,
           v IS NOT NULL AS observed
    FROM f ORDER BY user_id, bucket
    """


@_q("q176_linear_interpolate", _interp_oracle())
def q176_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with LINEAR interpolation between surrounding
    observations (TimescaleDB ``interpolate``; q64 is the LOCF
    variant). Missing buckets get
    ``prev + (next - prev) * (h - h_prev) / (h_next - h_prev)`` where
    h is the integer hour index — the fraction is a small-integer
    ratio, so the IEEE double arithmetic is engine-identical on
    identical rounded endpoint values; edges fall back to the nearest
    observation.

    Shape: per-user bucket agg, grid densification via sequence
    explode, then two IGNORE NULLS value/index windows over the shared
    user sort — one shuffle for the agg, one keyed sort for the
    windows, grid cardinality bounded by span/grain per user.
    """
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    obs = (
        ev.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("b")
        )
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,3)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("v")
        )
    )
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("b"),
        )
    )
    g = grid.join(obs, ["user_id", "b"], "left").withColumn(
        "h", (F.unix_micros(F.col("b").cast("timestamp")) / F.lit(3600000000)).cast("long")
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("v").isNotNull(), F.col("h"))
    f = (
        g.withColumn("pv", F.last("v", ignorenulls=True).over(back))
        .withColumn("ph", F.last(obs_h, ignorenulls=True).over(back))
        .withColumn("nv", F.first("v", ignorenulls=True).over(fwd))
        .withColumn("nh", F.first(obs_h, ignorenulls=True).over(fwd))
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("h") - F.col("ph"))
            / (F.col("nh") - F.col("ph"))
        )
    )
    # explicit half-up at 6 dp (see the oracle comment): midpoints of
    # round-6 endpoints are exact ties where ROUND modes diverge
    val = F.floor(interp * 1000000 + F.lit(0.5)) / 1000000 + F.lit(0.0)
    return f.select(
        "user_id",
        F.col("b").alias("bucket"),
        val.alias("val"),
        F.col("v").isNotNull().alias("observed"),
    ).orderBy("user_id", "bucket")


# ---------------------------------------------------------------------------
# q185 — weekly seasonal profile + deseasonalized outlier census
# ---------------------------------------------------------------------------

_SEAS_Z = 3.0


def _seasonal_oracle() -> str:
    return f"""
    WITH c AS (
      -- +1: DuckDB dayofweek is 0=Sunday..6, Spark's is 1=Sunday..7
      SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hr,
             round(value, 6) AS v
      FROM events
    ), m AS (
      SELECT dow, hr,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(v AS DECIMAL(18,6))) AS s,
             sum(CAST(round(v * v, 6) AS DECIMAL(24,6))) AS ss
      FROM c GROUP BY dow, hr
    ), prof AS (
      SELECT dow, hr, n,
             CAST(s AS DOUBLE) / n AS mu,
             sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                  / (n - 1)) AS sd
      FROM m WHERE n >= 2
    )
    SELECT CAST(p.dow AS BIGINT) AS dow, CAST(p.hr AS BIGINT) AS hr, p.n,
           round(p.mu, 6) AS seasonal_mean,
           round(p.sd, 6) AS seasonal_sd,
           CAST(count(*) FILTER (p.sd > 0 AND
                 round(abs(c.v - p.mu) / p.sd, 6) > {_SEAS_Z}) AS BIGINT)
             AS n_outliers
    FROM prof p JOIN c ON c.dow = p.dow AND c.hr = p.hr
    GROUP BY p.dow, p.hr, p.n, p.mu, p.sd
    ORDER BY dow, hr
    """


@_q("q185_seasonal_outliers", _seasonal_oracle())
def q185_seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile (day-of-week x hour cells) with a
    deseasonalized outlier census: q126's rolling z-score flags local
    spikes; this flags values anomalous FOR THAT TIME OF WEEK — the
    decomposition a metrics monitor runs before alerting (a Friday-6pm
    load spike is only an anomaly on a Tuesday 3am).

    Exactness: cell moments ride DECIMAL (q149's contract), mu/sd are
    engine-identical double arithmetic on those exact sums, and the
    outlier decision compares the ROUNDED z both sides (q126's fix).
    The profile is |7 x 24| rows — broadcastable seasonal state at any
    scale; the census re-joins it to the facts map-side.
    """
    c = table(spark, sf_dir, "events").select(
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hr"),
        F.round("value", 6).alias("v"),
    )
    m = c.groupBy("dow", "hr").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(18,6)")).alias("s"),
        F.sum(F.round(F.col("v") * F.col("v"), 6).cast("decimal(24,6)")).alias("ss"),
    )
    prof = (
        m.where(F.col("n") >= 2)
        .select(
            "dow",
            "hr",
            "n",
            (F.col("s").cast("double") / F.col("n")).alias("mu"),
            F.sqrt(
                (
                    F.col("ss").cast("double")
                    - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
                )
                / (F.col("n") - 1)
            ).alias("sd"),
        )
    )
    z_out = (F.col("sd") > 0) & (
        F.round(F.abs(F.col("v") - F.col("mu")) / F.col("sd"), 6) > _SEAS_Z
    )
    return (
        c.join(F.broadcast(prof), ["dow", "hr"])
        .groupBy("dow", "hr", "n", "mu", "sd")
        .agg(F.count(F.when(z_out, 1)).alias("n_outliers"))
        .select(
            F.col("dow").cast("long").alias("dow"),
            F.col("hr").cast("long").alias("hr"),
            "n",
            F.round("mu", 6).alias("seasonal_mean"),
            F.round("sd", 6).alias("seasonal_sd"),
            "n_outliers",
        )
        .orderBy("dow", "hr")
    )


# ---------------------------------------------------------------------------
# q191 — gaps-and-islands: data-completeness / backfill planning
# ---------------------------------------------------------------------------


def _gaps_oracle() -> str:
    return """
    WITH present AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), span AS (
      SELECT user_id,
             unnest(generate_series(min(d), max(d), INTERVAL 1 DAY))::DATE AS d
      FROM present GROUP BY user_id
    ), missing AS (
      SELECT s.user_id, s.d
      FROM span s LEFT JOIN present p
        ON p.user_id = s.user_id AND p.d = s.d
      WHERE p.d IS NULL
    ), grp AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS island
      FROM missing
    )
    SELECT user_id, min(d) AS gap_start, max(d) AS gap_end,
           CAST(count(*) AS BIGINT) AS n_days
    FROM grp GROUP BY user_id, island ORDER BY user_id, gap_start
    """


@_q("q191_partition_gaps", _gaps_oracle())
def q191_partition_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-completeness audit via gaps-and-islands: for every user,
    find each contiguous run of calendar days with NO events between
    their first and last active day — the report a backfill planner
    consumes (one row per gap = one backfill job, not one per missing
    day).

    The islands trick: consecutive missing days share ``date - rank``
    (both advance by 1/day), so one per-user window + one groupBy
    collapses runs with no self-join or loop. Scale: everything after
    the first distinct is calendar-sized per key (days, not events),
    and the window partitions by user — no global sort.
    """
    from pyspark.sql import Window

    present = (
        table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    span = (
        present.groupBy("user_id")
        .agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select("user_id", F.explode(F.sequence("lo", "hi")).alias("d"))
    )
    missing = span.join(present, ["user_id", "d"], "left_anti")
    island = F.date_sub(
        F.col("d"),
        F.row_number().over(Window.partitionBy("user_id").orderBy("d")),
    )
    return (
        missing.withColumn("island", island)
        .groupBy("user_id", "island")
        .agg(
            F.min("d").alias("gap_start"),
            F.max("d").alias("gap_end"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .drop("island")
        .orderBy("user_id", "gap_start")
    )


# ---------------------------------------------------------------------------
# q192 — complex event processing (MATCH_RECOGNIZE-style pattern match)
# ---------------------------------------------------------------------------

#: view -> click -> purchase with no purchase in between: each match
#: consumes through its closing purchase, so occurrences don't overlap.
_CEP_PATTERN = "v[^p]*c[^p]*p"


def _cep_oracle() -> str:
    return f"""
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS s
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(regexp_extract_all(s, '{_CEP_PATTERN}')) AS BIGINT)
             AS n_funnels,
           CAST(len(s) AS BIGINT) AS n_events
    FROM seq ORDER BY user_id
    """


@_q("q192_cep_pattern", _cep_oracle())
def q192_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern detection (the MATCH_RECOGNIZE
    emulation): per user, count non-overlapping view -> click ->
    purchase conversions with no intervening purchase, by folding the
    ordered event-type initials into one string per key and running a
    regular expression over it — regex IS the CEP pattern language, and
    both engines' leftmost-first non-overlapping scan semantics agree.

    Scale: shares the constraint MATCH_RECOGNIZE itself has — one key's
    sequence must fit an executor (bytes = events/key, bounded here);
    the shuffle key is user_id, and the regex runs codegen'd JVM-side,
    no Python. q71's relational funnel is the unordered-steps
    alternative; this is the strict-ordering, consume-on-match variant.
    """
    ev = table(spark, sf_dir, "events")
    ev.select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("c"),
    ).createOrReplaceTempView("_cep_src")
    return spark.sql(
        f"""
        WITH seq AS (
          SELECT user_id,
                 listagg(c) WITHIN GROUP (ORDER BY ts, event_id) AS s
          FROM _cep_src GROUP BY user_id
        )
        SELECT user_id,
               CAST(size(regexp_extract_all(s, '{_CEP_PATTERN}', 0)) AS BIGINT)
                 AS n_funnels,
               CAST(length(s) AS BIGINT) AS n_events
        FROM seq ORDER BY user_id
        """
    )


def _rank_select_values(
    g: DataFrame,
    value: str,
    tiebreak: list[str],
    width: int,
    ranks: dict,
    pick_struct: bool = False,
) -> DataFrame:
    """Exact order statistics from ``g`` with NO global sort — the
    distributed, fully in-plan form of q183's histogram-narrowed rank
    select (VERDICT r05 wrong-items #2/#3).

    ``ranks`` maps output column name -> callable(n_col) -> the 1-based
    target rank under ORDER BY (value, *tiebreak), as a function of the
    total row count. Returns ONE row: ``n`` plus one column per rank
    name holding the exact data value at that rank (or, with
    ``pick_struct``, the whole (value, *tiebreak) sort-key tuple — what
    an exact distributed ntile needs for its cut boundaries).

    Plan shape: (1) per-bucket counts of the non-negative integer
    ``value`` div ``width`` — one map-side-combinable aggregate; (2) a
    prefix sum over THAT bounded frame (#distinct buckets ≤ value
    span / width, independent of row count) yields each bucket's
    cumulative offset and marks the ≤len(ranks) buckets containing a
    target rank; (3) only those buckets' rows are re-joined (broadcast)
    and ranked WITHIN their bucket partition — global rank = bucket
    offset + within-bucket row_number. Nothing ever sorts the full
    frame in one task; the expected pass-2 input is n/buckets rows. A
    production loop would recurse on an oversized hot bucket exactly
    like q183's narrowing; one level suffices at every tested sf.
    """
    bexpr = F.expr(f"CAST({value} AS BIGINT) div {width}")
    counts = g.groupBy(bexpr.alias("b")).agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.withColumn(
        "cum_below", F.coalesce(F.sum("c").over(wcum), F.lit(0))
    ).withColumn("n", F.sum("c").over(Window.partitionBy()))
    kcols = [
        fn(F.col("n")).cast("long").alias(f"__k_{name}")
        for name, fn in ranks.items()
    ]
    offs = offs.select("b", "c", "cum_below", "n", *kcols)
    hit = F.lit(False)
    for name in ranks:
        k = F.col(f"__k_{name}")
        hit = hit | ((k > F.col("cum_below")) & (k <= F.col("cum_below") + F.col("c")))
    targets = offs.filter(hit)
    cand = g.join(F.broadcast(targets), bexpr == F.col("b"))
    wr = Window.partitionBy("b").orderBy(value, *tiebreak)
    ranked = cand.withColumn(
        "__grank", F.col("cum_below") + F.row_number().over(wr)
    )
    picked = (
        F.struct(F.col(value), *[F.col(c) for c in tiebreak])
        if pick_struct
        else F.col(value)
    )
    picks = [
        F.max(F.when(F.col("__grank") == F.col(f"__k_{name}"), picked)).alias(
            name
        )
        for name in ranks
    ]
    return ranked.agg(F.any_value("n").alias("n"), *picks)


# ---------------------------------------------------------------------------
# q198 — conversion latency quantiles (first view -> first purchase)
# ---------------------------------------------------------------------------


def _latency_oracle() -> str:
    return """
    WITH v AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t1
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= v.t0
      GROUP BY e.user_id
    ), g AS (
      SELECT v.user_id,
             CAST(epoch_us(p.t1) - epoch_us(v.t0) AS BIGINT) AS gap_us,
             row_number() OVER (ORDER BY epoch_us(p.t1) - epoch_us(v.t0),
                                v.user_id) AS rn,
             count(*) OVER () AS n
      FROM v JOIN p ON p.user_id = v.user_id
    )
    SELECT CAST(any_value(n) AS BIGINT) AS n_converted,
           max(CASE WHEN rn = (n + 1) // 2 THEN gap_us END) AS median_lo_us,
           max(CASE WHEN rn = (n + 2) // 2 THEN gap_us END) AS median_hi_us,
           max(CASE WHEN rn = greatest(CAST(ceil(n * 0.9) AS BIGINT), 1)
                    THEN gap_us END) AS p90_us
    FROM g
    """


@_q("q198_conversion_latency", _latency_oracle())
def q198_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: microseconds from each user's
    FIRST view to their first purchase at-or-after it, summarized by
    rank-exact median and p90 order statistics (actual data values,
    never interpolated — q152's rule, so the oracle is hash-exact on
    BIGINT microsecond gaps).

    Shape: two per-user min aggregates on the shared user shuffle, then
    the histogram-narrowed distributed rank select
    (``_rank_select_values``: per-minute gap buckets -> bounded prefix
    sum -> rank only the ≤3 target buckets' rows) — no task ever sorts
    the users-sized gap frame (VERDICT r05 wrong-item #2). The p90 of
    time-to-convert is the metric a growth team alerts on; the exact
    rank pick keeps it reproducible across engines and reruns.
    """
    ev = table(spark, sf_dir, "events")
    # v feeds the purchase join AND the gap join, and g feeds every
    # rank-select pass; without the checkpoints the events-scale scan +
    # per-user aggregates re-run once per consumer (12 scans in the
    # un-cut plan — the q39/q228 pattern). Both frames are users-sized.
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    ).localCheckpoint(eager=False)
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    g = v.join(p, "user_id").select(
        "user_id",
        (
            F.unix_micros(F.col("t1").cast("timestamp"))
            - F.unix_micros(F.col("t0").cast("timestamp"))
        ).alias("gap_us"),
    ).localCheckpoint(eager=False)
    sel = _rank_select_values(
        g,
        "gap_us",
        ["user_id"],
        60_000_000,  # 1-minute gap buckets
        {
            "median_lo_us": lambda n: F.floor((n + 1) / 2),
            "median_hi_us": lambda n: F.floor((n + 2) / 2),
            "p90_us": lambda n: F.greatest(F.ceil(n * 0.9), F.lit(1)),
        },
    )
    return sel.select(
        F.col("n").alias("n_converted"),
        "median_lo_us",
        "median_hi_us",
        "p90_us",
    )


# ---------------------------------------------------------------------------
# q199 — capped running balance (non-associative fold: the batch
# custom-stateful-operator case)
# ---------------------------------------------------------------------------


def _capped_oracle() -> str:
    return """
    WITH RECURSIVE e AS (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn,
             CASE event_type WHEN 'purchase' THEN value
                             WHEN 'error' THEN -value ELSE 0 END AS delta
      FROM events
    ), n AS (
      SELECT user_id, max(rn) AS last_rn FROM e GROUP BY user_id
    ), walk AS (
      SELECT user_id, rn,
             greatest(0, delta) AS bal,
             greatest(0, delta) AS max_bal,
             CAST(delta < 0 AS BIGINT) AS n_clamps
      FROM e WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.rn,
             greatest(0, w.bal + e.delta),
             greatest(w.max_bal, greatest(0, w.bal + e.delta)),
             w.n_clamps + CAST(w.bal + e.delta < 0 AS BIGINT)
      FROM walk w JOIN e ON e.user_id = w.user_id AND e.rn = w.rn + 1
    )
    SELECT w.user_id,
           round(w.bal, 6) + 0.0 AS final_balance,
           round(w.max_bal, 6) + 0.0 AS peak_balance,
           w.n_clamps
    FROM walk w JOIN n ON n.user_id = w.user_id AND w.rn = n.last_rn
    ORDER BY w.user_id
    """


@_q("q199_capped_running_balance", _capped_oracle())
def q199_capped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-clamped running balance per user (purchases credit, errors
    debit, balance never below zero) — a NON-ASSOCIATIVE fold: the
    clamp inside the recurrence means no window-function rewrite
    exists, which is precisely the batch case for a custom stateful
    operator (q53/q79 are its streaming siblings). Spark runs it as an
    Arrow-batched per-key fold in applyInPandas; the oracle is the
    recurrence itself as a recursive CTE.

    Cross-engine exactness needs no DECIMAL here: both engines execute
    the identical sequential op chain (add, clamp) on identical doubles
    in identical order, so every intermediate is bit-equal. Scale: one
    shuffle on user_id; each group folds linearly in one task — the
    same contract as any per-entity stateful replay.
    """
    import pandas as pd

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .when(F.col("event_type") == "error", -F.col("value"))
        .otherwise(0.0)
        .alias("delta"),
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        bal = 0.0
        peak = 0.0
        clamps = 0
        for d in pdf["delta"]:
            nxt = bal + d
            if nxt < 0:
                clamps += 1
                nxt = 0.0
            bal = nxt
            if bal > peak:
                peak = bal
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "final_balance": [round(bal, 6) + 0.0],
                "peak_balance": [round(peak, 6) + 0.0],
                "n_clamps": [clamps],
            }
        )

    return (
        ev.groupBy("user_id")
        .applyInPandas(
            fold,
            schema="user_id long, final_balance double, peak_balance double, "
            "n_clamps long",
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q201 — clickstream path mining (top event trigrams)
# ---------------------------------------------------------------------------

_PATH_TOP_K = 10


def _paths_oracle() -> str:
    return f"""
    WITH s AS (
      SELECT user_id, event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), paths AS (
      SELECT e1 || '>' || e2 || '>' || e3 AS path,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM s WHERE e3 IS NOT NULL
      GROUP BY path
    )
    SELECT path, n, n_users FROM paths
    ORDER BY n DESC, path LIMIT {_PATH_TOP_K}
    """


@_q("q201_event_paths", _paths_oracle())
def q201_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path mining: the {_PATH_TOP_K} most common 3-event
    sequences across all users (with how many distinct users walk
    each) — the n-gram-over-behavior analysis funnels are designed
    from, as two lead() windows on the shared per-user sort plus a
    path-keyed count. TakeOrdered handles the top-k; path cardinality
    is |event_types|^3-bounded so the final agg is tiny at any scale.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", F.col("event_type").alias("e1"))
        .withColumn("e2", F.lead("e1", 1).over(w))
        .withColumn("e3", F.lead("e1", 2).over(w))
        .where(F.col("e3").isNotNull())
    )
    return (
        s.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path"), "user_id"
        )
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n"), "path")
        .limit(_PATH_TOP_K)
    )


# ---------------------------------------------------------------------------
# q210 — growth accounting: daily actives vs cumulative uniques
# ---------------------------------------------------------------------------


@_q(
    "q210_growth_accounting",
    """
    WITH first_seen AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ), daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM events GROUP BY d
    ), news AS (
      SELECT d0 AS d, CAST(count(*) AS BIGINT) AS new_users
      FROM first_seen GROUP BY d0
    )
    SELECT daily.d AS day, daily.dau,
           coalesce(news.new_users, 0) AS new_users,
           CAST(sum(coalesce(news.new_users, 0)) OVER (
             ORDER BY daily.d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cumulative_users
    FROM daily LEFT JOIN news ON news.d = daily.d
    ORDER BY day
    """,
)
def q210_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per-day active users, newly-acquired users
    (first-ever activity that day), and the cumulative unique-user
    curve — the DAU / acquisition / total-reach triple every growth
    dashboard opens with. q143's cohort triangle slices retention;
    this is the topline it rolls up to.

    Shape: first-seen is one user-keyed min; dau one day-keyed
    distinct; the cumulative curve is a running sum over the DAY-sized
    frame (never the events), so the full history costs a
    calendar-length window regardless of event volume.
    """
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("d"), "user_id"
    )
    first_seen = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    daily = ev.groupBy("d").agg(F.countDistinct("user_id").alias("dau"))
    news = first_seen.groupBy(F.col("d0").alias("d")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.join(news, "d", "left")
        .withColumn("new_users", F.coalesce("new_users", F.lit(0)))
        .withColumn("cumulative_users", F.sum("new_users").over(w))
        .select(
            F.col("d").alias("day"), "dau", "new_users", "cumulative_users"
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# q214 — per-key EWMA (exponentially-weighted moving average)
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.3


def _ewma_oracle() -> str:
    a = _EWMA_ALPHA
    return f"""
    WITH RECURSIVE h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS v
      FROM events GROUP BY event_type, hr
    ), r AS (
      SELECT event_type, hr, v,
             row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
      FROM h
    ), e AS (
      SELECT event_type, rn, hr, v, v AS ew FROM r WHERE rn = 1
      UNION ALL
      SELECT r.event_type, r.rn, r.hr, r.v,
             {a} * r.v + {1 - a} * e.ew
      FROM e JOIN r ON r.event_type = e.event_type AND r.rn = e.rn + 1
    )
    SELECT event_type, CAST(hr AS TIMESTAMP) AS hr, v,
           floor(ew * 1e6 + 0.5) / 1e6 AS ewma
    FROM e ORDER BY event_type, hr
    """


@_q("q214_ewma_smoothing", _ewma_oracle())
def q214_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key EWMA over the hourly rollup: e_t = a*v_t + (1-a)*e_{t-1}
    — the classic streaming smoother / online feature.

    A linear recurrence has no fixed-window frame, so it is not a Spark
    window function; the closed form sum a(1-a)^(t-i) v_i overflows for
    long series if rearranged. Instead: aggregate to the (key, hour)
    grain first (decimal-exact, shrinks data before any Python), then
    one ``applyInPandas`` scan per key computes the recurrence in
    arrival order. At 100 TB the rollup is the only corpus-sized
    shuffle; the recurrence touches one (key-partitioned) pass of
    bounded per-key series. Cross-engine exactness: the hourly value
    rides a DECIMAL(18,6) sum, and both engines then run the IDENTICAL
    IEEE sequence (a*v + (1-a)*e, emitted via floor(x*1e6+0.5)), so the
    recursive-CTE oracle matches hash-exact — no tolerance.
    """
    import math

    import pandas as pd

    a = _EWMA_ALPHA
    hourly = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
        )
        .agg(
            F.sum(F.round(F.col("value"), 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
    )

    def recur(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("hr").reset_index(drop=True)
        ew = 0.0
        out = []
        for i, v in enumerate(pdf["v"]):
            ew = v if i == 0 else a * v + (1 - a) * ew
            out.append(math.floor(ew * 1e6 + 0.5) / 1e6)
        pdf["ewma"] = out
        return pdf

    return (
        hourly.groupBy("event_type")
        .applyInPandas(recur, schema="event_type string, hr timestamp, v double, ewma double")
        .orderBy("event_type", "hr")
    )


# ---------------------------------------------------------------------------
# q240 — rolling cross-series correlation (purchase vs view intensity)
# ---------------------------------------------------------------------------

_RC_WIN = 24  # trailing hours


def _rolling_corr_oracle() -> str:
    w = _RC_WIN
    return f"""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hr,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY hr
    ), r AS (
      SELECT hr, x, y,
             row_number() OVER (ORDER BY hr) AS rn,
             sum(x) OVER fr AS sx, sum(y) OVER fr AS sy,
             sum(x * x) OVER fr AS sxx, sum(y * y) OVER fr AS syy,
             sum(x * y) OVER fr AS sxy,
             count(*) OVER fr AS n
      FROM h
      WINDOW fr AS (ORDER BY hr ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(hr AS TIMESTAMP) AS hr, x, y,
           round((n * sxy - sx * sy)
                 / sqrt(CAST((n * sxx - sx * sx) AS DOUBLE)
                        * (n * syy - sy * sy)), 6) AS corr{w}
    FROM r
    WHERE rn >= {w}
      AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    ORDER BY hr
    """


@_q("q240_rolling_corr", _rolling_corr_oracle())
def q240_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-{_RC_WIN}h Pearson correlation between purchase and view
    intensity — the cross-series co-movement monitor (does browsing
    still convert?), computed entirely from ONE hourly rollup: both
    series come out of the same conditional aggregation, and all five
    correlation moments are integer-count frame sums, so the statistic
    is exact rational algebra + one sqrt in identical IEEE order —
    rounded once on the wire, no tolerance. Zero-variance frames are
    excluded exactly (integer predicate), not epsilon-tested.

    One scan -> calendar-sized series; the frame sums share one sort.
    At 100 TB the rollup is the only corpus-sized work, and keying it
    by (hour) keeps the window single-pass."""
    h = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("long")
            .alias("y"),
        )
    )
    fr = Window.orderBy("hr").rowsBetween(-(_RC_WIN - 1), 0)
    wo = Window.orderBy("hr")
    r = (
        h.withColumn("rn", F.row_number().over(wo))
        .withColumn("sx", F.sum("x").over(fr))
        .withColumn("sy", F.sum("y").over(fr))
        .withColumn("sxx", F.sum(F.col("x") * F.col("x")).over(fr))
        .withColumn("syy", F.sum(F.col("y") * F.col("y")).over(fr))
        .withColumn("sxy", F.sum(F.col("x") * F.col("y")).over(fr))
        .withColumn("n", F.count(F.lit(1)).over(fr))
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.round(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / F.sqrt(vx.cast("double") * vy),
        6,
    )
    return (
        r.filter((F.col("rn") >= _RC_WIN) & (vx > 0) & (vy > 0))
        .select("hr", "x", "y", corr.alias(f"corr{_RC_WIN}"))
        .orderBy("hr")
    )


# ---------------------------------------------------------------------------
# q252 — additive seasonal decomposition summary (trend/seasonal/residual)
# ---------------------------------------------------------------------------

_SD_HALF = 12  # centered moving-average half-width (25h window)


def _decompose_oracle() -> str:
    h = _SD_HALF
    return f"""
    WITH s AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS v
      FROM events GROUP BY event_type, hr
    ), t AS (
      SELECT event_type, hr, v,
             CAST(sum(CAST(v AS DECIMAL(18,6))) OVER fr AS DOUBLE)
               / count(*) OVER fr AS trend,
             count(*) OVER fr AS w,
             CAST(extract('hour' FROM hr) AS BIGINT) AS hod
      FROM s
      WINDOW fr AS (PARTITION BY event_type ORDER BY hr
                    ROWS BETWEEN {h} PRECEDING AND {h} FOLLOWING)
    ), r AS (
      SELECT event_type, hod, v - trend AS resid
      FROM t WHERE w = {2 * h + 1}
    ), si AS (
      SELECT event_type, hod,
             CAST(sum(CAST(round(resid, 6) AS DECIMAL(18,6))) AS DOUBLE)
               / count(*) AS sidx
      FROM r GROUP BY event_type, hod
    ), amp AS (
      SELECT event_type, round(max(sidx) - min(sidx), 6) AS seasonal_amplitude
      FROM si GROUP BY event_type
    ), fin AS (
      SELECT r.event_type, r.resid - si.sidx AS e
      FROM r JOIN si ON si.event_type = r.event_type AND si.hod = r.hod
    ), rv AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
             round(CAST(sum(CAST(round(e * e, 6) AS DECIMAL(24,6)))
                        AS DOUBLE) / count(*), 6) AS residual_var
      FROM fin GROUP BY event_type
    )
    SELECT rv.event_type, rv.n_hours, amp.seasonal_amplitude, rv.residual_var
    FROM rv JOIN amp ON amp.event_type = rv.event_type
    ORDER BY rv.event_type
    """


@_q("q252_seasonal_decompose", _decompose_oracle())
def q252_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition summary (STL-lite) per event
    class: centered {2 * _SD_HALF + 1}-hour moving-average trend
    (complete windows only), hour-of-day seasonal indexes from the
    detrended residuals, and the variance that REMAINS after removing
    both — the number that says how much structure the series still
    hides. Reported per class: complete-window hours, seasonal
    amplitude (max-min index), residual variance.

    Exactness discipline: every cross-row sum (hourly rollup, MA frame,
    seasonal means, squared residuals) quantizes to DECIMAL first; the
    only divisions are by integer counts — identical IEEE in both
    engines, rounded once on the wire. Three window/group passes over
    the calendar-sized series; the corpus is touched once.
    """
    h = _SD_HALF
    s = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(
            F.sum(F.round(F.col("value"), 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
    )
    fr = (
        Window.partitionBy("event_type").orderBy("hr").rowsBetween(-h, h)
    )
    t = (
        s.withColumn(
            "trend",
            F.sum(F.col("v").cast("decimal(18,6)")).over(fr).cast("double")
            / F.count(F.lit(1)).over(fr),
        )
        .withColumn("w", F.count(F.lit(1)).over(fr))
        .withColumn("hod", F.hour("hr").cast("long"))
    )
    r = t.filter(F.col("w") == 2 * h + 1).select(
        "event_type", "hod", (F.col("v") - F.col("trend")).alias("resid")
    )
    si = r.groupBy("event_type", "hod").agg(
        (
            F.sum(F.round("resid", 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("sidx")
    )
    amp = si.groupBy("event_type").agg(
        F.round(F.max("sidx") - F.min("sidx"), 6).alias("seasonal_amplitude")
    )
    fin = r.join(si, ["event_type", "hod"]).select(
        "event_type", (F.col("resid") - F.col("sidx")).alias("e")
    )
    rv = fin.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.round(
            F.sum(
                F.round(F.col("e") * F.col("e"), 6).cast("decimal(24,6)")
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("residual_var"),
    )
    return (
        rv.join(amp, "event_type")
        .select(
            "event_type",
            F.col("n_hours").cast("long"),
            "seasonal_amplitude",
            "residual_var",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q256 — session quality rollup (bounce rate, depth, rank-exact duration)
# ---------------------------------------------------------------------------


@_q(
    "q256_session_quality",
    """
    WITH e AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    ), s AS (
      SELECT user_id, ts,
             sum(CASE WHEN prev_ts IS NULL
                      OR date_diff('microsecond', prev_ts, ts) > 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
      FROM e
    ), per AS (
      SELECT user_id, sid, CAST(count(*) AS BIGINT) AS depth,
             date_diff('microsecond', min(ts), max(ts)) AS dur_us
      FROM s GROUP BY user_id, sid
    ), rk AS (
      SELECT depth, dur_us,
             row_number() OVER (ORDER BY dur_us, user_id, sid) AS rn,
             count(*) OVER () AS n
      FROM per
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN depth = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(sum(CASE WHEN depth = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS bounce_rate,
           CAST(sum(depth) AS DOUBLE) / count(*) AS avg_depth,
           CAST(max(CASE WHEN rn = (n + 1) // 2 THEN dur_us END) AS BIGINT)
             AS median_duration_us
    FROM rk
    """,
)
def q256_session_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-quality rollup on the q124 gap rule (30-min): bounce
    rate (single-event sessions), average depth, and the RANK-EXACT
    median session duration — the engagement dashboard every product
    team runs on clickstream, in one corpus pass + one sessions-sized
    order statistic.

    Ratios are exact BIGINT divisions; the median duration is a
    selected integer-microsecond value on a (dur, user, sid) total
    order — no interpolation. The sessionize windows reuse q124's
    single (user_id) partitioning; the median comes from the
    histogram-narrowed distributed rank select (1-second duration
    buckets -> bounded prefix sum -> rank only the target bucket), so
    no task ever sorts the sessions-sized frame (VERDICT r05
    wrong-item #3).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    s = (
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev_ts").isNull() | (gap_us > 30 * 60 * 1_000_000), 1
            ).otherwise(0),
        )
        .withColumn(
            "sid",
            F.sum("new_s").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    # feeds the stats aggregate AND both rank-select passes: one lazy
    # checkpoint computes the sessionization window pipeline once
    per = s.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("depth"),
        F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))").alias("dur_us"),
    ).localCheckpoint(eager=False)
    stats = per.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("depth") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounces"),
        (
            F.sum(F.when(F.col("depth") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("bounce_rate"),
        (F.sum("depth").cast("double") / F.count(F.lit(1))).alias("avg_depth"),
    )
    med = _rank_select_values(
        per,
        "dur_us",
        ["user_id", "sid"],
        1_000_000,  # 1-second duration buckets
        {"median_duration_us": lambda n: F.floor((n + 1) / 2)},
    )
    return stats.crossJoin(
        F.broadcast(med.select(F.col("median_duration_us").cast("long")))
    )


# ---------------------------------------------------------------------------
# q257 — imputation quality harness (LOCF vs linear, held-out truth)
# ---------------------------------------------------------------------------


@_q(
    "q257_imputation_eval",
    """
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS v
      FROM events GROUP BY event_type, hr
    ), r AS (
      SELECT event_type, hr, v,
             row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
      FROM h
    ), imp AS (
      SELECT event_type, hr, v,
             rn % 5 = 3 AND prev_v IS NOT NULL AND next_v IS NOT NULL AS held,
             prev_v, next_v
      FROM (
        SELECT event_type, hr, v, rn,
               lag(v) OVER (PARTITION BY event_type ORDER BY rn) AS prev_v,
               lead(v) OVER (PARTITION BY event_type ORDER BY rn) AS next_v
        FROM r
      )
    )
    SELECT event_type,
           CAST(sum(CASE WHEN held THEN 1 ELSE 0 END) AS BIGINT) AS n_held,
           round(CAST(sum(CASE WHEN held THEN
                   CAST(round(abs(v - prev_v), 6) AS DECIMAL(18,6))
                 ELSE 0 END) AS DOUBLE)
                 / sum(CASE WHEN held THEN 1 ELSE 0 END), 6) AS mae_locf,
           round(CAST(sum(CASE WHEN held THEN
                   CAST(round(abs(v - (prev_v + next_v) / 2), 6)
                        AS DECIMAL(18,6))
                 ELSE 0 END) AS DOUBLE)
                 / sum(CASE WHEN held THEN 1 ELSE 0 END), 6) AS mae_linear
    FROM imp GROUP BY event_type ORDER BY event_type
    """,
)
def q257_imputation_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which gap-fill strategy (q64 LOCF vs q176 linear) actually fits
    THIS data? Hold out every 5th hourly point (deterministic rn % 5
    mask, interior points only), impute it both ways from its
    neighbors, and report per-class MAE for each — the harness that
    turns the imputation choice from a convention into a measurement.

    One rollup + one lag/lead window on the shared per-class sort;
    absolute errors are quantized to DECIMAL before the mean so the
    comparison is exact. (At this data's hourly granularity linear
    interpolation should win wherever the series trends — the output
    shows by how much.)
    """
    h = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(
            F.sum(F.round(F.col("value"), 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
    )
    w = Window.partitionBy("event_type").orderBy("hr")
    r = (
        h.withColumn("rn", F.row_number().over(w))
        .withColumn("prev_v", F.lag("v").over(w))
        .withColumn("next_v", F.lead("v").over(w))
        .withColumn(
            "held",
            (F.col("rn") % 5 == 3)
            & F.col("prev_v").isNotNull()
            & F.col("next_v").isNotNull(),
        )
    )
    dheld = F.when(F.col("held"), 1).otherwise(0)
    e_locf = F.when(
        F.col("held"),
        F.round(F.abs(F.col("v") - F.col("prev_v")), 6).cast("decimal(18,6)"),
    ).otherwise(F.lit(0).cast("decimal(18,6)"))
    e_lin = F.when(
        F.col("held"),
        F.round(
            F.abs(F.col("v") - (F.col("prev_v") + F.col("next_v")) / 2), 6
        ).cast("decimal(18,6)"),
    ).otherwise(F.lit(0).cast("decimal(18,6)"))
    return (
        r.groupBy("event_type")
        .agg(
            F.sum(dheld).cast("long").alias("n_held"),
            F.round(F.sum(e_locf).cast("double") / F.sum(dheld), 6).alias(
                "mae_locf"
            ),
            F.round(F.sum(e_lin).cast("double") / F.sum(dheld), 6).alias(
                "mae_linear"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q258 — daily percentile bands (rank-exact p50/p90/p99 monitoring series)
# ---------------------------------------------------------------------------


@_q(
    "q258_percentile_bands",
    """
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, value, event_id,
             row_number() OVER (PARTITION BY date_trunc('day', ts)
                                ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY date_trunc('day', ts)) AS n
      FROM events
    ), k AS (
      SELECT day, n,
             (n + 1) // 2 AS k50,
             greatest(CAST(ceil(n * 0.9) AS BIGINT), 1) AS k90,
             greatest(CAST(ceil(n * 0.99) AS BIGINT), 1) AS k99
      FROM (SELECT DISTINCT day, n FROM d)
    )
    SELECT k.day, CAST(k.n AS BIGINT) AS n,
           max(CASE WHEN d.rn = k.k50 THEN d.value END) AS p50,
           max(CASE WHEN d.rn = k.k90 THEN d.value END) AS p90,
           max(CASE WHEN d.rn = k.k99 THEN d.value END) AS p99
    FROM k JOIN d ON d.day = k.day AND d.rn IN (k.k50, k.k90, k.k99)
    GROUP BY k.day, k.n ORDER BY k.day
    """,
)
def q258_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p50/p90/p99 value bands — the SLO/monitoring series every
    latency or spend dashboard draws, rank-exact (selected data values
    at ceil-based ranks with event_id tie-break, q152's discipline
    applied per day) so two engines — or two days of the same pipeline
    — can never disagree by an interpolation ulp.

    One window pass partitioned by day (the same partitioning the
    output needs); each day's sort is independent and scales out. The
    three order statistics come from the same ranked pass via
    conditional aggregation — no per-percentile rescans.
    """
    wd = Window.partitionBy(F.date_trunc("day", F.col("ts"))).orderBy(
        "value", "event_id"
    )
    wc = Window.partitionBy(F.date_trunc("day", F.col("ts")))
    d = (
        table(spark, sf_dir, "events")
        .select("ts", "value", "event_id")
        .withColumn("day", F.date_trunc("day", F.col("ts")).cast("date"))
        .withColumn("rn", F.row_number().over(wd))
        .withColumn("n", F.count(F.lit(1)).over(wc))
    )
    k50 = F.floor((F.col("n") + 1) / 2).cast("long")
    k90 = F.greatest(F.ceil(F.col("n") * 0.9).cast("long"), F.lit(1))
    k99 = F.greatest(F.ceil(F.col("n") * 0.99).cast("long"), F.lit(1))
    picked = (
        d.withColumn("k50", k50)
        .withColumn("k90", k90)
        .withColumn("k99", k99)
        .filter(
            (F.col("rn") == F.col("k50"))
            | (F.col("rn") == F.col("k90"))
            | (F.col("rn") == F.col("k99"))
        )
    )
    return (
        picked.groupBy("day", "n")
        .agg(
            F.max(F.when(F.col("rn") == F.col("k50"), F.col("value"))).alias("p50"),
            F.max(F.when(F.col("rn") == F.col("k90"), F.col("value"))).alias("p90"),
            F.max(F.when(F.col("rn") == F.col("k99"), F.col("value"))).alias("p99"),
        )
        .select("day", F.col("n").cast("long"), "p50", "p90", "p99")
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# q259 — cohort LTV curves (cumulative revenue by cohort age)
# ---------------------------------------------------------------------------


@_q(
    "q259_cohort_ltv",
    """
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
      FROM events GROUP BY user_id
    ), rev AS (
      SELECT e.user_id, f.cohort,
             CAST(date_diff('week', f.cohort,
                            CAST(date_trunc('week', e.ts) AS DATE)) AS BIGINT)
               AS age_w,
             CAST(round(e.value, 6) AS DECIMAL(18,6)) AS v
      FROM events e JOIN first_seen f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
    ), cs AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users
      FROM first_seen GROUP BY cohort
    ), byage AS (
      SELECT cohort, age_w, sum(v) AS wrev FROM rev GROUP BY cohort, age_w
    ), cum AS (
      SELECT cohort, age_w,
             sum(wrev) OVER (PARTITION BY cohort ORDER BY age_w) AS cum_rev
      FROM byage
    )
    SELECT c.cohort, c.age_w, cs.cohort_users,
           CAST(c.cum_rev AS DOUBLE) AS cum_revenue,
           round(CAST(c.cum_rev AS DOUBLE) / cs.cohort_users, 6)
             AS ltv_per_user
    FROM cum c JOIN cs ON cs.cohort = c.cohort
    ORDER BY c.cohort, c.age_w
    """,
)
def q259_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users grouped by first-seen week,
    purchase revenue accumulated by cohort AGE (weeks since signup) —
    the revenue counterpart of q143's retention triangle and the curve
    every growth model extrapolates. Per (cohort, age): cohort size,
    cumulative revenue, LTV per user.

    Revenue rides DECIMAL sums end-to-end — including the running
    cumulative window, summed in age order so both engines accumulate
    identically; LTV is one division by an exact BIGINT. Two shuffles
    (first-seen per user, cohort-age rollup); the cumulative window
    runs over the cohort-sized frame.
    """
    ev = table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .select(
            "cohort",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"), F.col("cohort")
                )
                / 7
            )
            .cast("long")
            .alias("age_w"),
            F.round("value", 6).cast("decimal(18,6)").alias("v"),
        )
    )
    cs = first_seen.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    byage = rev.groupBy("cohort", "age_w").agg(F.sum("v").alias("wrev"))
    wcum = Window.partitionBy("cohort").orderBy("age_w")
    cum = byage.withColumn("cum_rev", F.sum("wrev").over(wcum))
    return (
        cum.join(cs, "cohort")
        .select(
            "cohort",
            "age_w",
            F.col("cohort_users").cast("long"),
            F.col("cum_rev").cast("double").alias("cum_revenue"),
            F.round(
                F.col("cum_rev").cast("double") / F.col("cohort_users"), 6
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort", "age_w")
    )


# ---------------------------------------------------------------------------
# q263 — Holt linear-trend smoothing (level+trend double recurrence)
# ---------------------------------------------------------------------------

_HOLT_A = 0.4  # level smoothing
_HOLT_B = 0.2  # trend smoothing


def _holt_oracle() -> str:
    a, b = _HOLT_A, _HOLT_B
    return f"""
    WITH RECURSIVE h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS v
      FROM events GROUP BY event_type, hr
    ), r AS (
      SELECT event_type, hr, v,
             row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
      FROM h
    ), e AS (
      SELECT r1.event_type, r1.rn, r1.hr, r1.v,
             r1.v AS lev, r2.v - r1.v AS tr
      FROM r r1 JOIN r r2 ON r2.event_type = r1.event_type AND r2.rn = 2
      WHERE r1.rn = 1
      UNION ALL
      SELECT r.event_type, r.rn, r.hr, r.v,
             {a} * r.v + {1 - a} * (e.lev + e.tr),
             {b} * (({a} * r.v + {1 - a} * (e.lev + e.tr)) - e.lev)
               + {1 - b} * e.tr
      FROM e JOIN r ON r.event_type = e.event_type AND r.rn = e.rn + 1
    )
    SELECT event_type, CAST(hr AS TIMESTAMP) AS hr, v,
           floor(lev * 1e6 + 0.5) / 1e6 AS level,
           floor(tr * 1e6 + 0.5) / 1e6 AS trend,
           floor((lev + tr) * 1e6 + 0.5) / 1e6 AS forecast_next
    FROM e ORDER BY event_type, hr
    """


@_q("q263_holt_linear", _holt_oracle())
def q263_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing per event class — the
    2-parameter big sibling of q214's EWMA: a coupled level+trend
    recurrence whose one-step forecast (level + trend) adapts to drift
    the flat EWMA lags behind. Initialized classically (level = first
    point, trend = second - first).

    Same architecture as q214: decimal-exact hourly rollup, then ONE
    applyInPandas pass per key running the recurrence in arrival order;
    the recursive-CTE oracle executes the IDENTICAL IEEE sequence
    (alpha*v + (1-alpha)*(lev+tr), beta*dlev + (1-beta)*tr, emitted via
    floor(x*1e6+0.5)), so the match is hash-exact with no tolerance —
    a double recurrence certified end to end.
    """
    import math

    import pandas as pd

    a, b = _HOLT_A, _HOLT_B
    hourly = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(
            F.sum(F.round(F.col("value"), 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
    )

    def recur(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("hr").reset_index(drop=True)
        if len(pdf) < 2:
            return pdf.iloc[0:0].assign(level=0.0, trend=0.0, forecast_next=0.0)
        lev = tr = 0.0
        levs, trs, fcs = [], [], []
        for i, v in enumerate(pdf["v"]):
            if i == 0:
                lev, tr = v, pdf["v"][1] - v
            else:
                new_lev = a * v + (1 - a) * (lev + tr)
                tr = b * (new_lev - lev) + (1 - b) * tr
                lev = new_lev
            q = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
            levs.append(q(lev))
            trs.append(q(tr))
            fcs.append(q(lev + tr))
        pdf["level"], pdf["trend"], pdf["forecast_next"] = levs, trs, fcs
        return pdf

    return (
        hourly.groupBy("event_type")
        .applyInPandas(
            recur,
            schema=(
                "event_type string, hr timestamp, v double, level double,"
                " trend double, forecast_next double"
            ),
        )
        .orderBy("event_type", "hr")
    )


# ---------------------------------------------------------------------------
# q268 — M4 visualization-oriented decimation (min/max/first/last per pixel)
# ---------------------------------------------------------------------------

_M4_ORACLE = """
WITH pts AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, ts, event_id, value
  FROM events
), ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY event_type, bucket
                       ORDER BY ts, event_id) AS r_first,
    row_number() OVER (PARTITION BY event_type, bucket
                       ORDER BY ts DESC, event_id DESC) AS r_last,
    row_number() OVER (PARTITION BY event_type, bucket
                       ORDER BY value, ts, event_id) AS r_min,
    row_number() OVER (PARTITION BY event_type, bucket
                       ORDER BY value DESC, ts DESC, event_id DESC) AS r_max
  FROM pts
)
SELECT event_type, CAST(bucket AS TIMESTAMP) AS bucket,
       CAST(count(*) AS BIGINT) AS n_points,
       max(CASE WHEN r_first = 1 THEN ts END) AS t_first,
       max(CASE WHEN r_first = 1 THEN value END) AS v_first,
       max(CASE WHEN r_last = 1 THEN ts END) AS t_last,
       max(CASE WHEN r_last = 1 THEN value END) AS v_last,
       max(CASE WHEN r_min = 1 THEN ts END) AS t_min,
       max(CASE WHEN r_min = 1 THEN value END) AS v_min,
       max(CASE WHEN r_max = 1 THEN ts END) AS t_max,
       max(CASE WHEN r_max = 1 THEN value END) AS v_max
FROM ranked GROUP BY event_type, bucket
ORDER BY event_type, bucket
"""


@_q("q268_m4_decimation", _M4_ORACLE)
def q268_m4_decimation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 aggregation (Jugel et al., VLDB 2014): per (series, pixel
    bucket) keep exactly the first, last, min-value, and max-value
    points — the error-free downsampling for line-chart rendering.
    Output cardinality is bounded by pixels × series regardless of
    input size, which is the whole point at 100 TB: a dashboard reads
    ~3,600 rows, not 10^11.

    Spark shape: ONE hash aggregate (map-side combinable, single
    shuffle on (series, bucket)) — each of the four corner points is a
    lexicographic ``min``/``max`` over a struct whose field order IS
    the deterministic tie-break (ts, event_id for first/last; value,
    ts, event_id for low/high), so no window, no second pass, and ties
    resolve identically in both engines. The oracle replays the same
    tie-breaks as four ranking windows."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    first_s = F.min(F.struct("ts", "event_id", "value")).alias("first_s")
    last_s = F.max(F.struct("ts", "event_id", "value")).alias("last_s")
    min_s = F.min(F.struct("value", "ts", "event_id")).alias("min_s")
    max_s = F.max(F.struct("value", "ts", "event_id")).alias("max_s")
    return (
        ev.groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n_points"), first_s, last_s, min_s, max_s)
        .select(
            "event_type",
            "bucket",
            "n_points",
            F.col("first_s.ts").alias("t_first"),
            F.col("first_s.value").alias("v_first"),
            F.col("last_s.ts").alias("t_last"),
            F.col("last_s.value").alias("v_last"),
            F.col("min_s.ts").alias("t_min"),
            F.col("min_s.value").alias("v_min"),
            F.col("max_s.ts").alias("t_max"),
            F.col("max_s.value").alias("v_max"),
        )
        .orderBy("event_type", "bucket")
    )


# ---------------------------------------------------------------------------
# q302 — behavioral Markov chain: transition matrix + stationary distribution
# ---------------------------------------------------------------------------

_MC_ITERS = 3
_MC_Q = 10**9  # half-up term quantization (the q293 Bradley-Terry contract)


def _mc_oracle() -> str:
    # unrolled power iteration: v0 uniform over the states present,
    # v_{k+1}[to] = sum_from round_q(v_k[from] * p(from,to)) / Q
    it = """
    v{n} AS (
      SELECT p.to_t AS state,
             CAST(sum(CAST(floor(v{p}.pi * p.p * {q} + 0.5) AS BIGINT)) AS BIGINT)
               AS units
      FROM p JOIN v{p} ON v{p}.state = p.from_t
      GROUP BY p.to_t
    ),
    vd{n} AS (SELECT state, CAST(units AS DOUBLE) / {q} AS pi FROM v{n})
    """
    its = ",".join(
        it.format(n=i + 1, p=f"d{i}" if i else "0", q=_MC_Q)
        for i in range(_MC_ITERS)
    )
    return f"""
    WITH e AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    t AS (
      SELECT prev AS from_t, event_type AS to_t, CAST(count(*) AS BIGINT) AS c
      FROM e WHERE prev IS NOT NULL GROUP BY prev, event_type
    ),
    rt AS (SELECT from_t, CAST(sum(c) AS BIGINT) AS row_tot FROM t GROUP BY from_t),
    p AS (
      SELECT t.from_t, t.to_t, t.c,
             CAST(t.c AS DOUBLE) / CAST(rt.row_tot AS BIGINT) AS p
      FROM t JOIN rt ON rt.from_t = t.from_t
    ),
    states AS (SELECT DISTINCT to_t AS state FROM t),
    ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM states),
    v0 AS (SELECT state, 1.0 / ns.n AS pi FROM states CROSS JOIN ns),
    {its}
    SELECT s.state,
           coalesce(rt.row_tot, 0) AS n_out,
           coalesce(sp.p, 0.0) AS self_p,
           vd{_MC_ITERS}.pi AS pi
    FROM states s
    JOIN vd{_MC_ITERS} ON vd{_MC_ITERS}.state = s.state
    LEFT JOIN rt ON rt.from_t = s.state
    LEFT JOIN (SELECT from_t, p FROM p WHERE from_t = to_t) sp
           ON sp.from_t = s.state
    ORDER BY s.state
    """


@_q("q302_markov_stationary", _mc_oracle())
def q302_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral Markov chain over per-user event sequences: the
    transition matrix comes from ONE user-partitioned lag window over
    the fact table (the only data-scale stage; transitions partial-
    aggregate to a |states|^2 frame), then the stationary distribution
    runs {_MC_ITERS} power-iteration steps entirely on the bounded
    matrix — each step one broadcast join + 5-term integer sum.
    Hash-exactness follows the q293 Bradley-Terry contract: every
    product v[from]*p(from,to) is quantized half-up at 1e-9 and summed
    as exact integers, so iteration order can never move a bit;
    p(from,to) itself is an exact integer-ratio division. Emits per
    state: outgoing transition count, self-loop probability, and the
    iterated distribution."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.withColumn("prev", F.lag("event_type").over(w))
    # t is the bounded |states|^2 transition frame, but its subtree is
    # the event-scale lag window + aggregate — and rt, p, states, sp
    # and every power-iteration step all re-derive it (12 scans / 12
    # Windows in the un-cut plan: the ONE data-scale stage ran ~12x).
    # A lazy checkpoint computes it once; everything downstream is
    # bounded-matrix work on broadcast joins.
    t = (
        e.filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("from_t"), F.col("event_type").alias("to_t"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    rt = t.groupBy("from_t").agg(F.sum("c").cast("long").alias("row_tot"))
    p = t.join(F.broadcast(rt), "from_t").select(
        "from_t",
        "to_t",
        "c",
        (F.col("c").cast("double") / F.col("row_tot").cast("double")).alias("p"),
    )
    states = t.select(F.col("to_t").alias("state")).distinct()
    ns = states.agg(F.count(F.lit(1)).alias("n"))
    v = states.crossJoin(F.broadcast(ns)).select(
        "state", (F.lit(1.0) / F.col("n")).alias("pi")
    )
    for _ in range(_MC_ITERS):
        v = (
            p.join(F.broadcast(v), p.from_t == v.state)
            .select(
                F.col("to_t").alias("state"),
                F.floor(F.col("pi") * F.col("p") * _MC_Q + F.lit(0.5))
                .cast("long")
                .alias("u"),
            )
            .groupBy("state")
            .agg(
                (F.sum("u").cast("double") / F.lit(float(_MC_Q))).alias("pi")
            )
        )
    sp = p.filter(F.col("from_t") == F.col("to_t")).select(
        F.col("from_t").alias("state"), F.col("p").alias("self_p")
    )
    return (
        states.join(v, "state")
        .join(F.broadcast(rt.withColumnRenamed("from_t", "state")), "state", "left")
        .join(F.broadcast(sp), "state", "left")
        .select(
            "state",
            F.coalesce(F.col("row_tot"), F.lit(0)).cast("long").alias("n_out"),
            F.coalesce(F.col("self_p"), F.lit(0.0)).alias("self_p"),
            "pi",
        )
        .orderBy("state")
    )


# ---------------------------------------------------------------------------
# q303 — gaps-and-islands: activity streaks per user, corpus rollup
# ---------------------------------------------------------------------------


@_q(
    "q303_activity_streaks",
    """
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di
      FROM events
    ),
    isl AS (
      SELECT user_id,
             di - CAST(row_number() OVER (PARTITION BY user_id ORDER BY di)
                       AS BIGINT) AS grp
      FROM d
    ),
    runs AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS len
      FROM isl GROUP BY user_id, grp
    ),
    per_user AS (
      SELECT user_id, CAST(max(len) AS BIGINT) AS best FROM runs GROUP BY user_id
    ),
    by_len AS (
      SELECT len, CAST(count(*) AS BIGINT) AS n_islands FROM runs GROUP BY len
    ),
    by_best AS (
      SELECT best AS len, CAST(count(*) AS BIGINT) AS n_users_best
      FROM per_user GROUP BY best
    )
    SELECT coalesce(by_len.len, by_best.len) AS len,
           coalesce(by_len.n_islands, 0) AS n_islands,
           coalesce(by_best.n_users_best, 0) AS n_users_best
    FROM by_len FULL OUTER JOIN by_best ON by_best.len = by_len.len
    ORDER BY len
    """,
)
def q303_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands consecutive-day activity streaks — the classic
    retention question ("longest run of active days") that defeats
    plain window frames because run length is unbounded. The standard
    trick stays fully distributed: per user, di - row_number(di) is
    CONSTANT exactly within a consecutive run, so islands fall out of
    one user-partitioned window + one (user, grp) aggregate — every
    stage is user-keyed, nothing global, integer-exact. The corpus
    rollup is length-bounded (<= the day span): islands of each length
    and users whose LONGEST streak is that length."""
    ev = table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long").alias("di"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("di")
    runs = (
        d.withColumn("grp", F.col("di") - F.row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).cast("long").alias("len"))
    )
    per_user = runs.groupBy("user_id").agg(F.max("len").cast("long").alias("best"))
    by_len = runs.groupBy("len").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands")
    )
    by_best = per_user.groupBy(F.col("best").alias("len")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users_best")
    )
    return (
        by_len.join(by_best, "len", "full_outer")
        .select(
            "len",
            F.coalesce(F.col("n_islands"), F.lit(0)).cast("long").alias("n_islands"),
            F.coalesce(F.col("n_users_best"), F.lit(0))
            .cast("long")
            .alias("n_users_best"),
        )
        .orderBy("len")
    )


# ---------------------------------------------------------------------------
# q312 — Kaplan-Meier survival estimator (user lifetime with censoring)
# ---------------------------------------------------------------------------

_KM_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
hz AS (SELECT max(CAST(ts AS DATE)) AS horizon FROM events),
p AS (
  SELECT e.user_id, min(e.ts) AS tc
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= v.t0
  GROUP BY e.user_id
),
per AS (
  SELECT v.user_id,
         CASE WHEN p.tc IS NULL
              THEN date_diff('day', CAST(v.t0 AS DATE), hz.horizon)
              ELSE date_diff('day', CAST(v.t0 AS DATE), CAST(p.tc AS DATE))
         END AS dur,
         CASE WHEN p.tc IS NULL THEN 0 ELSE 1 END AS conv
  FROM v LEFT JOIN p ON p.user_id = v.user_id CROSS JOIN hz
),
g AS (
  SELECT dur, CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS d
  FROM per GROUP BY dur
),
risk AS (
  SELECT dur, n, d,
         sum(n) OVER (ORDER BY dur
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS n_risk
  FROM g
),
ev AS (SELECT dur, d, n_risk FROM risk WHERE d > 0),
lg AS (
  SELECT dur, d, n_risk,
         CASE WHEN d = n_risk THEN 1 ELSE 0 END AS dead,
         CASE WHEN d < n_risk
              THEN CAST(round(ln(1 - CAST(d AS DOUBLE) / n_risk), 6)
                        AS DECIMAL(18,6))
              ELSE CAST(0 AS DECIMAL(18,6)) END AS li
  FROM ev
),
cm AS (
  SELECT dur, d, n_risk,
         sum(li) OVER (ORDER BY dur
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cl,
         max(dead) OVER (ORDER BY dur
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS zf
  FROM lg
)
SELECT CAST(dur AS BIGINT) AS dur_days, CAST(n_risk AS BIGINT) AS n_risk,
       d AS n_converted,
       round(CAST(d AS DOUBLE) / n_risk, 6) AS hazard,
       CASE WHEN zf = 1 THEN 0.0
            ELSE round(exp(CAST(cl AS DOUBLE)), 6) END AS survival
FROM cm ORDER BY dur_days
"""


@_q("q312_kaplan_meier", _KM_ORACLE)
def q312_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator for time-to-conversion — the
    censoring-correct version of q198's funnel latency: duration =
    days from a user's first view to their first purchase at-or-after
    it; users who never convert are right-CENSORED at the corpus
    horizon (they inform the at-risk set without counting as events —
    dropping them is the classic conversion-metric bias this estimator
    exists to fix). Per distinct conversion time: at-risk count,
    conversion count, hazard d/n, and S(t) = prod(1 - d/n) — the
    survival curve whose complement is the honest conversion rate.

    Shape: two user-keyed min aggregates (q198's shape), then
    everything runs on the per-duration frame (bounded by the day
    span, not by users): the at-risk suffix sum and the cumulative
    log-survival both window over that bounded frame. The product is
    exp of a cumulative sum of round-6-DECIMAL log terms, so the
    cross-row accumulation is exact and only the final libm exp
    touches floats (the q110 log-aggregate precedent); the d == n_risk
    terminal step short-circuits to 0 before any ln(0).
    """
    ev = table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    hz = ev.agg(F.max(F.col("ts").cast("date")).alias("horizon"))
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    per = (
        v.join(p, "user_id", "left")
        .crossJoin(F.broadcast(hz))
        .select(
            F.when(
                F.col("tc").isNull(),
                F.datediff("horizon", F.col("t0").cast("date")),
            )
            .otherwise(
                F.datediff(F.col("tc").cast("date"), F.col("t0").cast("date"))
            )
            .alias("dur"),
            F.when(F.col("tc").isNull(), 0).otherwise(1).alias("conv"),
        )
    )
    g = per.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("d")
    )
    wrisk = Window.orderBy("dur").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    ev = (
        g.withColumn("n_risk", F.sum("n").over(wrisk))
        .filter(F.col("d") > 0)
    )
    li = F.when(
        F.col("d") < F.col("n_risk"),
        F.round(F.log(1 - F.col("d").cast("double") / F.col("n_risk")), 6).cast(
            "decimal(18,6)"
        ),
    ).otherwise(F.lit(0).cast("decimal(18,6)"))
    dead = F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)
    wcum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cm = (
        ev.withColumn("li", li)
        .withColumn("dead", dead)
        .withColumn("cl", F.sum("li").over(wcum))
        .withColumn("zf", F.max("dead").over(wcum))
    )
    return cm.select(
        F.col("dur").cast("long").alias("dur_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_converted"),
        F.round(F.col("d").cast("double") / F.col("n_risk"), 6).alias("hazard"),
        F.when(F.col("zf") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("cl").cast("double")), 6))
        .alias("survival"),
    ).orderBy("dur_days")


# ---------------------------------------------------------------------------
# q317 — multi-touch attribution (first / last / linear credit models)
# ---------------------------------------------------------------------------

_ATTR_WINDOW_DAYS = 3

_ATTR_ORACLE = f"""
WITH conv AS (
  SELECT user_id, ts AS ct, event_id AS cid FROM events
  WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, event_type AS channel, ts, event_id FROM events
  WHERE event_type IN ('view', 'click')
),
joined AS (
  SELECT c.cid, c.user_id, t.channel, t.ts, t.event_id
  FROM conv c JOIN touch t
    ON t.user_id = c.user_id
   AND t.ts < c.ct
   AND t.ts >= c.ct - INTERVAL {_ATTR_WINDOW_DAYS} DAY
),
per AS (
  SELECT cid, channel, ts, event_id,
         count(*) OVER (PARTITION BY cid) AS n,
         row_number() OVER (PARTITION BY cid ORDER BY ts, event_id) AS rn
  FROM joined
),
credits AS (
  SELECT 'first_touch' AS model, channel,
         CAST(CASE WHEN rn = 1 THEN 1.0 ELSE 0.0 END AS DECIMAL(18,6)) AS cr
  FROM per
  UNION ALL
  SELECT 'last_touch', channel,
         CAST(CASE WHEN rn = n THEN 1.0 ELSE 0.0 END AS DECIMAL(18,6))
  FROM per
  UNION ALL
  SELECT 'linear', channel,
         CAST(round(1.0 / n, 6) AS DECIMAL(18,6))
  FROM per
),
direct AS (
  SELECT m.model, 'direct' AS channel,
         CAST(count(*) AS DECIMAL(18,6)) AS cr
  FROM conv c
  LEFT JOIN (SELECT DISTINCT cid FROM joined) j ON j.cid = c.cid
  CROSS JOIN (SELECT unnest(['first_touch', 'last_touch', 'linear'])
              AS model) m
  WHERE j.cid IS NULL
  GROUP BY m.model
),
allc AS (
  SELECT model, channel, cr FROM credits WHERE cr > 0
  UNION ALL SELECT model, channel, cr FROM direct
)
SELECT model, channel,
       CAST(round(sum(cr), 6) AS DOUBLE) AS credit,
       CAST(count(*) AS BIGINT) AS n_rows
FROM allc GROUP BY model, channel ORDER BY model, channel
"""


@_q("q317_attribution_models", _ATTR_ORACLE)
def q317_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch marketing attribution: every purchase distributes one
    unit of credit over the user's view/click touches in the prior
    {_ATTR_WINDOW_DAYS} days under three industry models at once —
    first-touch (discovery), last-touch (closer), linear (equal split)
    — with purchases having no in-window touch credited to 'direct'.
    The three models over identical joined data is exactly how an
    attribution comparison dashboard is built.

    Shape: conversions join touches on the USER key (equi) with the
    lookback as a residual range predicate — at scale both sides
    co-partition on user_id and a touch meets only its own user's
    conversions; per-conversion ordering windows partition by the
    conversion id (per-group state only). Linear credits quantize
    1/n to round-6 DECIMAL before summing, so cross-engine
    accumulation is exact; zero-credit rows are dropped on BOTH sides
    so the n_rows census matches too.
    """
    ev = table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("ct"), F.col("event_id").alias("cid")
    )
    touch = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("event_type").alias("channel"), "ts", "event_id"
    )
    joined = conv.join(touch, "user_id").filter(
        (F.col("ts") < F.col("ct"))
        & (F.col("ts") >= F.col("ct") - F.expr(f"INTERVAL {_ATTR_WINDOW_DAYS} DAY"))
    )
    wp = Window.partitionBy("cid")
    # ONE lazy checkpoint of the joined+windowed touch frame: it feeds
    # the per-model credits AND the direct-conversion anti-join, and the
    # three models were three unioned projections of the same subtree —
    # the events scan + join + windows ran ~9x (9 scans in the un-cut
    # plan). The models now come out of a single explode over a
    # 3-element struct array (row multiplication, not plan
    # multiplication); union-of-projections == explode-of-array row for
    # row, so the aggregate is unchanged (oracle-verified).
    per = joined.select(
        "cid",
        "channel",
        F.count(F.lit(1)).over(wp).alias("n"),
        F.row_number()
        .over(wp.orderBy("ts", "event_id"))
        .alias("rn"),
    ).localCheckpoint(eager=False)
    dec = "decimal(18,6)"
    models = [
        ("first_touch", F.when(F.col("rn") == 1, 1.0).otherwise(0.0)),
        ("last_touch", F.when(F.col("rn") == F.col("n"), 1.0).otherwise(0.0)),
        ("linear", F.round(1.0 / F.col("n"), 6)),
    ]
    credits = per.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(model).alias("model"), cr.cast(dec).alias("cr")
                    )
                    for model, cr in models
                ]
            )
        ).alias("mc"),
        "channel",
    ).select(F.col("mc.model").alias("model"), "channel", F.col("mc.cr").alias("cr"))
    direct = (
        conv.join(per.select("cid").distinct(), "cid", "left_anti")
        .agg(F.count(F.lit(1)).alias("n_direct"))
        .select(
            F.explode(
                F.array(
                    *[F.lit(m) for m in ("first_touch", "last_touch", "linear")]
                )
            ).alias("model"),
            F.lit("direct").alias("channel"),
            F.col("n_direct").cast(dec).alias("cr"),
        )
    )
    # cr > 0 on the WHOLE union: with zero direct conversions the
    # aggregate still yields literal rows with cr = 0, which the
    # oracle's empty GROUP BY would not emit
    allc = credits.unionByName(direct).filter(F.col("cr") > 0)
    return (
        allc.groupBy("model", "channel")
        .agg(
            F.round(F.sum("cr"), 6).cast("double").alias("credit"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .orderBy("model", "channel")
    )
