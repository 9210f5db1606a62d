"""Every declared relational query must match its DuckDB oracle at
sf0.001 (the driver's gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from oracle_check import (  # tools/oracle_check.py, on sys.path via conftest
    compare,
    type_problems,
)

from tests.conftest import SF_SMOKE


def _registry():
    import __spark_entry__ as entrymod

    return entrymod.queries(), entrymod.oracle_sql()


QUERIES, ORACLES = _registry()
ORACLED = sorted(k for k in QUERIES if k in ORACLES)
ROWS_ONLY = sorted(k for k in QUERIES if k not in ORACLES)


@pytest.mark.parametrize("name", ORACLED)
def test_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_SMOKE)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    arrow_schema = duck.execute(ORACLES[name]).arrow().schema
    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
    # Output-type contract: the driver hashes column representations, so
    # both engines must emit the same whitelisted type per column — no
    # DECIMAL, no DuckDB HUGEINT widening (the q96/q105 failure class).
    problems += type_problems(df.schema, arrow_schema)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert len(df.collect()) > 0


def test_json_roundtrip(spark):
    """to_json(from_json(payload)) round-trip (SURVEY §2B Q27's encode
    half — string formatting is engine-specific, so checked here rather
    than against DuckDB)."""
    from pyspark.sql import functions as F

    from nfl_predictions_spark.sources.tables import table

    df = (
        table(spark, SF_SMOKE, "events")
        .select(
            "props",
            F.to_json(F.from_json("props", "k INT")).alias("rt"),
        )
        .limit(50)
    )
    for r in df.collect():
        assert r.rt == r.props.replace(" ", "").replace('{"k":null}', "{}")


def test_pushdown_and_pruning(spark):
    """The Q6-shaped filter must reach the parquet scan and the scan
    must read only the referenced columns (scale posture: a scan that
    reads all columns for a 2-column projection is wrong)."""
    from nfl_predictions_spark.operators.relational import q04_filter_conjunctive

    plan = q04_filter_conjunctive(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan
    read_schema = [line for line in plan.splitlines() if "ReadSchema" in line]
    assert read_schema and "l_partkey" not in read_schema[0]


def test_broadcast_join_plan(spark):
    from nfl_predictions_spark.operators.relational import q06_join_broadcast

    plan = q06_join_broadcast(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_topk_plan_no_global_sort(spark):
    from nfl_predictions_spark.operators.relational import q20_topk

    plan = q20_topk(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_q269_dpp_plan(spark):
    """The dim-side week filter must reach the fact scan as a RUNTIME
    partition filter (dynamic partition pruning) — the static optimizer
    cannot see it, so its presence proves the DPP rewrite fired. Result
    must cover exactly the 7 ISO-week-2 directories."""
    from nfl_predictions_spark.operators.extended import (
        q269_dynamic_partition_pruning,
    )

    from tests.conftest import SF_SMOKE

    df = q269_dynamic_partition_pruning(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    rows = df.collect()
    assert len(rows) == 7
    assert all(r.event_date.isocalendar()[1] == 2 for r in rows)


def test_q270_reconciliation_detects_drift(spark):
    """All buckets must reconcile on the healthy store, counts must sum
    to the table size — and the fingerprint must actually be sensitive:
    perturbing one row's value changes its bucket's fingerprint sum."""
    from pyspark.sql import functions as F

    from nfl_predictions_spark.operators.extended import (
        _recon_cols,
        q270_replica_reconciliation,
    )
    from nfl_predictions_spark.sources.tables import table

    rows = q270_replica_reconciliation(spark, SF_SMOKE).collect()
    assert rows and all(r.consistent for r in rows)
    total = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert sum(r.n_base for r in rows) == total

    ev = table(spark, SF_SMOKE, "events")
    good = ev.select(*_recon_cols("x")).groupBy("bucket").agg(F.sum("fp_x").alias("s"))
    bad = (
        ev.withColumn(
            "value",
            F.when(F.col("event_id") == 0, F.col("value") + 0.01).otherwise(
                F.col("value")
            ),
        )
        .select(*_recon_cols("x"))
        .groupBy("bucket")
        .agg(F.sum("fp_x").alias("s"))
    )
    diff = good.alias("g").join(bad.alias("b"), "bucket").filter(
        F.col("g.s") != F.col("b.s")
    )
    assert diff.count() == 1


def test_q271_window_group_limit_plan(spark):
    """The rank-filter formulation must compile to the bounded-shuffle
    physical strategy: a Partial WindowGroupLimit before the exchange
    (map-side top-k per group) and a Final one after. A regression to
    plain WindowExec would ship every row through the shuffle."""
    from nfl_predictions_spark.operators.extended import q271_window_group_limit

    df = q271_window_group_limit(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]
    assert "Partial" in plan and "Final" in plan
    rows = df.collect()
    # 5 priorities x top-3, ranks exactly 1..3 per group
    by_prio = {}
    for r in rows:
        by_prio.setdefault(r.o_orderpriority, []).append(r.rn)
    assert all(sorted(v) == [1, 2, 3] for v in by_prio.values())


def test_q272_runtime_bloom_plan_and_conf_hygiene(spark):
    """Under q272's scoped conf posture Spark must inject its runtime
    Bloom filter (bloom_filter_agg build + might_contain probe), and
    the function must leave every conf it touched exactly as found."""
    from nfl_predictions_spark.operators.skew import (
        _RF_CONFS,
        q272_runtime_bloom_join,
    )

    before = {}
    for k in _RF_CONFS:
        try:
            before[k] = spark.conf.get(k)
        except Exception:
            before[k] = None
    df = q272_runtime_bloom_join(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan, plan[:2000]
    assert "bloom_filter_agg" in plan
    for k, v in before.items():
        try:
            after = spark.conf.get(k)
        except Exception:
            after = None
        assert after == v, f"conf {k} leaked: {v!r} -> {after!r}"
    assert df.count() == 3


def test_q276_hybrid_join_both_strategies(spark):
    """The hybrid decomposition must actually materialize both physical
    strategies: broadcast hash join on the hot leg, sort-merge on the
    cold leg (merge hint — fixture-scale dims would otherwise broadcast
    and hide the pattern)."""
    from nfl_predictions_spark.operators.skew import q276_hybrid_skew_join

    df = q276_hybrid_skew_join(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" in plan


def test_q278_q279_optimizer_demos_conf_hygiene(spark):
    """Both runtime-optimizer demos self-assert their plan shape inside
    the scoped conf window (q278: CBO moved the fact out of the leading
    join leaf; q279: AQE's final plan broadcast-converted) — here pin
    that results are non-empty and every touched conf is restored."""
    from nfl_predictions_spark.operators.extended import (
        _AQE_CONFS,
        _CBO_CONFS,
        q278_cbo_join_reorder,
        q279_aqe_runtime_replan,
    )

    keys = set(_CBO_CONFS) | set(_AQE_CONFS)
    before = {}
    for k in keys:
        try:
            before[k] = spark.conf.get(k)
        except Exception:
            before[k] = None
    assert q278_cbo_join_reorder(spark, SF_SMOKE).count() == 2
    assert q279_aqe_runtime_replan(spark, SF_SMOKE).count() == 3
    for k, v in before.items():
        try:
            after = spark.conf.get(k)
        except Exception:
            after = None
        assert after == v, f"conf {k} leaked: {v!r} -> {after!r}"
