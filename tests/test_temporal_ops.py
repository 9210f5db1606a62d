"""Edge-case tests for the bucketed range join (operators/interval.py)
and the gap-fill resampler (operators/timeseries.py)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from nfl_predictions_spark.operators.interval import range_join
from nfl_predictions_spark.operators.timeseries import gap_fill


def test_range_join_edges_and_overlap(spark):
    points = spark.createDataFrame(
        [(1, 0.0), (2, 9.999), (3, 10.0), (4, 25.0), (5, 100.0)],
        "id long, p double",
    )
    intervals = spark.createDataFrame(
        # hi exactly on a bucket edge (10.0 with width 10), an interval
        # spanning several buckets, and two overlapping intervals
        [("a", 0.0, 10.0), ("b", 5.0, 30.0), ("c", 20.0, 30.0)],
        "name string, lo double, hi double",
    )
    out = sorted(
        (r["id"], r["name"])
        for r in range_join(points, "p", intervals, "lo", "hi", 10.0).collect()
    )
    # hi is exclusive: p=10.0 misses [0,10) but hits [5,30)
    assert out == [(1, "a"), (2, "a"), (2, "b"), (3, "b"), (4, "b"), (4, "c")]


def test_range_join_matches_theta_join(spark):
    """Bucketed strategy must be row-identical to the naive theta join
    for random-ish data, including multi-bucket-wide intervals."""
    points = spark.range(200).select(
        F.col("id"), ((F.col("id") * 37) % 199).cast("double").alias("p")
    )
    intervals = spark.range(20).select(
        F.concat(F.lit("b"), F.col("id")).alias("name"),
        (F.col("id") * 9.5).alias("lo"),
        (F.col("id") * 9.5 + 33.0).alias("hi"),
    )
    fast = sorted(
        (r["id"], r["name"])
        for r in range_join(points, "p", intervals, "lo", "hi", 8.0).collect()
    )
    slow = sorted(
        (r["id"], r["name"])
        for r in points.join(
            intervals, (F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi"))
        ).collect()
    )
    assert fast == slow and len(fast) > 0


def test_gap_fill_materializes_and_ffills(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 30)
    rows = [
        ("u", t0, 1.0),
        ("u", t0 + datetime.timedelta(hours=3), 7.0),  # 2-hour gap before this
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = (
        gap_fill(
            df,
            ts_col="ts",
            keys=["k"],
            grain="hour",
            aggs=[F.count("*").alias("cnt"), F.sum("v").alias("v")],
            ffill_cols=["v"],
        )
        .orderBy("ts_bucket")
        .collect()
    )
    assert len(out) == 4  # 00:00 .. 03:00 inclusive, gaps materialized
    assert [r["cnt"] for r in out] == [1, None, None, 1]
    assert [r["v"] for r in out] == [1.0, 1.0, 1.0, 7.0]  # carried across gap


def test_cohort_retention_invariants(spark):
    """Offset-0 retention is exactly 1.0 for every cohort (everyone is
    active in their own first week), actives never exceed cohort size,
    and the cohort sizes sum to the distinct-user count."""
    from nfl_predictions_spark.operators.timeseries import q143_cohort_retention
    from tests.conftest import SF_SMOKE

    rows = q143_cohort_retention(spark, SF_SMOKE).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert 0 <= r.week_offset <= 10
        assert r.active_users <= r.cohort_size
        if r.week_offset == 0:
            assert r.retention == 1.0
        by_cohort[r.cohort_week] = r.cohort_size
    n_users = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(by_cohort.values()) == n_users


def test_event_transitions_rows_sum_to_one(spark):
    """Each prev_type's outgoing probabilities sum to ~1 and transition
    counts total (events - first event per user)."""
    from nfl_predictions_spark.operators.timeseries import q144_event_transitions
    from tests.conftest import SF_SMOKE

    rows = q144_event_transitions(spark, SF_SMOKE).collect()
    assert rows
    out = {}
    total = 0
    for r in rows:
        out.setdefault(r.prev_type, 0.0)
        out[r.prev_type] += r.p
        total += r.transitions
    for s in out.values():
        assert abs(s - 1.0) < 1e-4
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total == n_events - n_users


def test_sliding_distinct_exact_and_sketch_agree(spark):
    """Exact trailing-7d distinct matches brute-force Python; the HLL
    window-union path lands within 5% of exact on every day."""
    from nfl_predictions_spark.operators.timeseries import (
        q155_sliding_distinct,
        q155b_sliding_distinct_hll,
    )
    from tests.conftest import SF_SMOKE
    import datetime

    exact = {r.day: r.users_7d for r in q155_sliding_distinct(spark, SF_SMOKE).collect()}
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    daily = {(e.ts.date(), e.user_id) for e in ev}
    for day, got in exact.items():
        want = len(
            {u for (d, u) in daily if day - datetime.timedelta(days=6) <= d <= day}
        )
        assert got == want
    est = {
        r.day: r.users_7d_est
        for r in q155b_sliding_distinct_hll(spark, SF_SMOKE).collect()
    }
    assert set(est) == set(exact)
    for day in exact:
        assert abs(est[day] - exact[day]) <= max(1, 0.05 * exact[day])


def test_continuous_aggregate_single_scan_matches_direct(spark):
    """q168 serves all three resolutions from one Expand-fanned scan and
    each resolution equals its direct groupBy."""
    from tests.conftest import SF_SMOKE

    from nfl_predictions_spark.operators.timeseries import q168_continuous_aggregate

    df = q168_continuous_aggregate(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan
    assert plan.count("events.parquet") == 1

    rows = df.collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    for res, trunc in (("minute", "minute"), ("hour", "hour"), ("day", "day")):
        direct = {
            r.bucket: (r.cnt, float(r.val))
            for r in ev.groupBy(F.date_trunc(trunc, "ts").alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col("value").cast("decimal(18,3)")).cast("double").alias("val"),
            )
            .collect()
        }
        got = {r.bucket: (r.cnt, r.val) for r in rows if r.resolution == res}
        assert got == direct, res


def test_m4_decimation_invariants(spark):
    """M4 corners must bracket each other (low <= first/last <= high),
    bucket point counts must sum to the table's row count (decimation
    loses points, never buckets), and the plan must be a single hash
    aggregate — no window exchange."""
    from tests.conftest import SF_SMOKE

    from nfl_predictions_spark.operators.timeseries import q268_m4_decimation

    df = q268_m4_decimation(spark, SF_SMOKE)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.v_min <= r.v_first <= r.v_max
        assert r.v_min <= r.v_last <= r.v_max
        assert r.t_first <= r.t_last
    total = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert sum(r.n_points for r in rows) == total
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_markov_stationary_invariants(spark):
    """q302: the iterated distribution stays a (quantization-tolerance)
    probability vector, self-loop probs are valid, and outgoing
    transition counts reconcile: sum(n_out) == total transitions ==
    events - users (each user's first event has no predecessor)."""
    from nfl_predictions_spark.operators.timeseries import (
        _MC_ITERS,
        q302_markov_stationary,
    )
    from tests.conftest import SF_SMOKE

    rows = q302_markov_stationary(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    total = sum(r.pi for r in rows)
    assert abs(total - 1.0) < len(rows) * _MC_ITERS * 1e-9
    for r in rows:
        assert 0.0 <= r.self_p <= 1.0
        assert 0.0 <= r.pi <= 1.0
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_out for r in rows) == n_events - n_users


def test_activity_streaks_reconcile(spark):
    """q303: island counts weighted by length must sum to the distinct
    (user, day) count, users-with-best must sum to the user count, and
    no streak exceeds the observed day span."""
    from nfl_predictions_spark.operators.timeseries import q303_activity_streaks
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    rows = q303_activity_streaks(spark, SF_SMOKE).collect()
    assert rows
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    assert sum(r.len * r.n_islands for r in rows) == ud.count()
    assert sum(r.n_users_best for r in rows) == ud.select("user_id").distinct().count()
    span = ud.select(F.datediff(F.max("d"), F.min("d"))).first()[0] + 1
    assert max(r.len for r in rows) <= span
