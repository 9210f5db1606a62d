"""Table-lifecycle invariants: compaction reduces file count without
changing content; the catalog table answers by name; the HLL sketch
rollup's estimate really is the merged-daily-sketch path (value parity
for all three is covered by the parametrized oracle comparison)."""

from __future__ import annotations

import os

from tests.conftest import SF_SMOKE


def test_compaction_reduces_files_preserves_rows(spark):
    from nfl_predictions_spark.operators.maintenance import _tmp, q82_compaction
    from nfl_predictions_spark.sources.tables import table

    q82_compaction(spark, SF_SMOKE).collect()
    staged = _tmp(SF_SMOKE, "compaction_events")
    n_files = sum(1 for f in os.listdir(staged) if f.endswith(".parquet"))
    assert 1 <= n_files < 64
    assert spark.read.parquet(staged).count() == table(spark, SF_SMOKE, "events").count()


def test_catalog_table_is_addressable_by_name(spark):
    from nfl_predictions_spark.operators.maintenance import q81_catalog_table

    q81_catalog_table(spark, SF_SMOKE).collect()
    tables = [t.name for t in spark.catalog.listTables()]
    assert any(t.startswith("nflspark_orders_") for t in tables)


def test_hll_daily_sketches_merge_to_overall(spark):
    """Union of per-day sketches estimates the same cardinality as one
    global sketch — the mergeability property the rollup relies on."""
    from pyspark.sql import functions as F

    from nfl_predictions_spark.sources.tables import table

    ev = table(spark, SF_SMOKE, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).first()["est"]
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))).alias("est")
    ).first()["est"]
    assert merged == direct


def test_grid_range_agg_decomposition(spark):
    """q304: the tile decomposition must equal a direct predicate scan
    for every rectangle (rows and exact-decimal revenue), and each rect
    intersects at least one tile."""
    from nfl_predictions_spark.operators.maintenance import (
        _GRID_RECTS,
        q304_grid_range_agg,
    )
    from pyspark.sql import functions as F

    rows = {r.rid: r for r in q304_grid_range_agg(spark, SF_SMOKE).collect()}
    assert set(rows) == {r[0] for r in _GRID_RECTS}
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    for rid, qlo, qhi, plo, phi in _GRID_RECTS:
        direct = li.filter(
            (F.col("l_quantity") >= qlo) & (F.col("l_quantity") < qhi)
            & (F.col("l_extendedprice") >= plo) & (F.col("l_extendedprice") < phi)
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double").alias("rev"),
        ).first()
        assert rows[rid].n_rows == direct.n
        assert rows[rid].revenue == direct.rev
        assert rows[rid].n_tiles_full + rows[rid].n_tiles_boundary >= 1
