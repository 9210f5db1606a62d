"""Warehouse-lifecycle operators (operators/warehouse.py)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_incremental_mv_equals_full_recompute(spark):
    from nfl_predictions_spark.operators.warehouse import q164_incremental_mv

    got = {r.nation: (r.total_rev, r.n_orders) for r in q164_incremental_mv(spark, SF_SMOKE).collect()}

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    nat = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    full = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nat, cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    ref = {r.n_name: (r.rev, r.n) for r in full}
    assert got == ref


def test_incremental_mv_second_run_reads_view_store(spark):
    """After the first refresh the base aggregate is served from the
    materialized parquet store, not recomputed from raw orders."""
    from nfl_predictions_spark.operators.warehouse import q164_incremental_mv

    q164_incremental_mv(spark, SF_SMOKE).collect()  # ensure store exists
    key = os.path.basename(os.path.normpath(SF_SMOKE))
    # store dirs carry a source-data fingerprint suffix (stale-copy GC,
    # ADVICE r04 #3): nation_rev_<sf>_<fingerprint>/base
    import glob

    stores = glob.glob(
        os.path.join(
            tempfile.gettempdir(),
            "nfl_predictions_spark",
            "mv",
            f"nation_rev_{key}_*",
            "base",
        )
    )
    assert len(stores) == 1 and os.path.isdir(stores[0])
    plan = q164_incremental_mv(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "nation_rev_" in plan  # base comes from the view store
    # the only orders scan left is the delta partition (pushed filter)
    assert plan.count("orders.parquet") <= 1


def test_constraint_audit_finds_real_violations(spark):
    """The audit surfaces the synthetic data's genuine
    ship-before-order violations and passes the clean constraints."""
    from nfl_predictions_spark.operators.maintenance import q166_constraint_audit

    rows = {r.constraint_name: r for r in q166_constraint_audit(spark, SF_SMOKE).collect()}
    assert len(rows) == 9
    assert not rows["lineitem_ship_after_order"].passed
    assert rows["lineitem_ship_after_order"].n_violations > 0
    for clean in ("orders_pk_unique", "lineitem_fk_orders", "orders_status_domain"):
        assert rows[clean].passed, clean
    # one scan per plan fragment: orders appears in the orders-agg and
    # the fk join, lineitem in the lineitem-agg and the fk join — never
    # once per constraint
    plan = q166_constraint_audit(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("orders.parquet") <= 2
    assert plan.count("lineitem.parquet") <= 2


def test_merkle_sync_drilldown_contract(spark):
    """q305: the drill-down never compares more than fanout x dirty
    parents, dirty counts never exceed compared counts, every level's
    dirty set is non-empty down to the leaves (the replica provably
    lacks rows at SF_SMOKE), and the shipped-row count equals the
    deterministic drop count."""
    from nfl_predictions_spark.operators.extended import (
        _MK_DROP_MOD,
        _MK_FANOUT,
        q305_merkle_sync,
    )
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    rows = {r.level: r for r in q305_merkle_sync(spark, SF_SMOKE).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[0].n_nodes == 1 and rows[0].n_compared == 1
    for lvl in (1, 2, 3):
        assert rows[lvl].n_compared == _MK_FANOUT * rows[lvl - 1].n_dirty
        assert rows[lvl].n_dirty <= rows[lvl].n_compared
        assert rows[lvl].n_compared <= rows[lvl].n_nodes
    dropped = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .filter(F.col("o_orderkey") % _MK_DROP_MOD == 13)
        .count()
    )
    assert dropped >= 1
    assert rows[0].n_dirty == 1
    assert rows[3].n_rows_to_ship == dropped
