"""Semantic invariants for the round-3 curation/profiling operators
(duplicate-passage detection, deterministic per-key sampling, one-pass
column profiling). Cross-engine value parity is the DuckDB oracle's
job; these pin the properties the oracles can't state."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_dup_passages_spans_really_occur(spark):
    """Every reported span is a real substring of both its first and
    last reporting documents, and reach is sorted descending."""
    from nfl_predictions_spark.operators.dedup import q117_dup_passages
    from nfl_predictions_spark.sources.tables import table

    rows = q117_dup_passages(spark, SF_SMOKE).collect()
    assert rows, "synthetic corpus contains duplicate docs; spans must exist"
    reaches = [r.n_docs for r in rows]
    assert reaches == sorted(reaches, reverse=True)
    texts = dict(
        table(spark, SF_SMOKE, "documents")
        .filter(
            F.col("doc_id").isin(
                [r.first_doc for r in rows] + [r.last_doc for r in rows]
            )
        )
        .select("doc_id", "text")
        .collect()
    )
    for r in rows:
        assert r.n_docs >= 2
        assert r.span in texts[r.first_doc]
        assert r.span in texts[r.last_doc]
        assert len(r.span.split(" ")) == 8


def test_per_key_sample_deterministic_and_bounded(spark):
    """Exactly k rows per key, and membership is identical under a
    different partitioning — the anti-rand() property."""
    from nfl_predictions_spark.operators.extended import (
        _SAMPLE_K,
        q121_per_key_sample,
    )

    a = q121_per_key_sample(spark, SF_SMOKE)
    per_key = a.groupBy("source").count().collect()
    assert per_key and all(r["count"] == _SAMPLE_K for r in per_key)
    base = sorted((r.source, r.doc_id, r.rn) for r in a.collect())
    again = sorted(
        (r.source, r.doc_id, r.rn)
        for r in q121_per_key_sample(spark, SF_SMOKE)
        .repartition(7)
        .collect()
    )
    assert base == again


def test_column_profile_shape_and_sanity(spark):
    from nfl_predictions_spark.operators.maintenance import (
        _PROFILE_COLS,
        q123_column_profile,
    )

    rows = q123_column_profile(spark, SF_SMOKE).collect()
    assert [r.col_name for r in rows] == sorted(_PROFILE_COLS)
    for r in rows:
        assert r.n_null == 0
        assert r.n_distinct > 0
        assert r.min_v <= r.mean_v <= r.max_v
