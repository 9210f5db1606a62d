"""Semantics tests for the as-of join operator (operators/asof.py):
exact-timestamp matches, no-match nulls, latest-wins, and tolerance."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from nfl_predictions_spark.operators.asof import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01T10:00:00"), 100.0),
            (2, "a", _ts("2024-01-01T12:00:00"), 200.0),
            (3, "b", _ts("2024-01-01T09:00:00"), 300.0),  # before any right row
            (4, "c", _ts("2024-01-01T10:00:00"), 400.0),  # key absent on right
        ],
        "id long, k string, ts timestamp, lv double",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T10:00:00"), 1.0),  # equal ts -> matches id=1
            ("a", _ts("2024-01-01T11:30:00"), 2.0),  # latest before id=2
            ("a", _ts("2024-01-01T11:00:00"), 9.0),  # older, must lose to 11:30
            ("b", _ts("2024-01-01T09:30:00"), 3.0),  # after id=3 -> no match
        ],
        "k string, ts timestamp, rv double",
    )
    return left, right


def test_asof_basic_semantics(spark):
    left, right = _frames(spark)
    out = {
        r["id"]: r
        for r in asof_join(left, right, on="ts", by=["k"], value_cols=["rv"]).collect()
    }
    assert len(out) == 4  # every left row survives (left join)
    assert out[1]["rv_asof"] == 1.0  # right row at the exact same ts matches
    assert out[2]["rv_asof"] == 2.0  # latest prior wins, not just any prior
    assert out[3]["rv_asof"] is None and out[3]["ts_asof"] is None
    assert out[4]["rv_asof"] is None  # key with no right rows at all
    assert out[2]["lv"] == 200.0  # left payload columns pass through


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = {
        r["id"]: r
        for r in asof_join(
            left,
            right,
            on="ts",
            by=["k"],
            value_cols=["rv"],
            tolerance=F.expr("INTERVAL 15 MINUTES"),
        ).collect()
    }
    assert out[1]["rv_asof"] == 1.0  # zero age: inside any tolerance
    assert out[2]["rv_asof"] is None  # 30 min old > 15 min tolerance
    assert out[2]["ts_asof"] is None


def test_asof_plan_single_shuffle(spark):
    """The union-window strategy must cost exactly one exchange on the
    key — the property that makes it viable at scale."""
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, on="ts", by=["k"], value_cols=["rv"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
