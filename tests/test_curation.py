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


def test_weighted_sample_matches_python_aes(spark):
    """The distributed A-ES top-k must equal an in-memory replay of the
    same md5-uniform + ln(u)/w keys."""
    import hashlib
    import math

    from nfl_predictions_spark.operators.llmprep import _WS_K, q140_weighted_sample
    from nfl_predictions_spark.sources.tables import table

    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text", "n_chars").collect()
    keyed = []
    for r in docs:
        bucket = int(hashlib.md5(("aes" + r.text).encode()).hexdigest()[:15], 16) % 1000000
        u = (bucket + 0.5) / 1000000.0
        keyed.append((round(math.log(u) / r.n_chars, 6), r.doc_id))
    top = sorted(keyed, key=lambda kv: (-kv[0], kv[1]))[:_WS_K]
    got = q140_weighted_sample(spark, SF_SMOKE).collect()
    assert [(r.aes_key, r.doc_id) for r in got] == top


def test_weighted_sample_prefers_heavy_docs(spark):
    """Longer docs must be over-represented relative to a uniform draw:
    the sampled mean weight exceeds the corpus mean weight."""
    from pyspark.sql import functions as F

    from nfl_predictions_spark.operators.llmprep import q140_weighted_sample
    from nfl_predictions_spark.sources.tables import table

    sample_mean = (
        q140_weighted_sample(spark, SF_SMOKE).agg(F.avg("weight")).collect()[0][0]
    )
    corpus_mean = (
        table(spark, SF_SMOKE, "documents").agg(F.avg("n_chars")).collect()[0][0]
    )
    assert sample_mean > corpus_mean


def test_zipf_slope_is_negative_powerlaw(spark):
    """Natural-ish token frequencies: slope decisively negative, good
    log-log fit."""
    from nfl_predictions_spark.operators.text import q141_zipf_fit

    row = q141_zipf_fit(spark, SF_SMOKE).collect()[0]
    assert row.zipf_slope < -0.1
    assert 0.0 <= row.r2 <= 1.0
    assert row.n_terms > 10


def test_last_touch_attribution_accounts_every_purchase(spark):
    """Attribution buckets partition the purchase set exactly, and an
    in-memory replay of one user's history agrees."""
    from pyspark.sql import functions as F

    from nfl_predictions_spark.operators.timeseries import (
        q142_last_touch_attribution,
    )
    from nfl_predictions_spark.sources.tables import table

    ev = table(spark, SF_SMOKE, "events")
    out = q142_last_touch_attribution(spark, SF_SMOKE).collect()
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    assert sum(r.purchases for r in out) == n_purch
    # replay the busiest purchaser
    uid = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id").count().orderBy(F.desc("count"), "user_id")
        .collect()[0].user_id
    )
    hist = sorted(
        ev.filter(F.col("user_id") == uid).collect(),
        key=lambda r: (r.ts, r.event_id),
    )
    last = None
    expect: dict = {}
    for r in hist:
        if r.event_type == "purchase":
            expect[last or "(none)"] = expect.get(last or "(none)", 0) + 1
        if r.event_type in ("click", "view"):
            last = r.event_type
    got_types = {r.touch_type for r in out}
    assert set(expect) <= got_types | {"(none)"}
