"""Pin the driver conformance window (VERDICT r03 next-round #7).

The driver checks the FIRST 50 ``queries()`` entries at sf0.01. A
registry edit that reorders entries would silently change what the
driver verifies; this pin makes any window change an explicit,
reviewed edit of EXPECTED_WINDOW.
"""

from __future__ import annotations

import __spark_entry__ as entrymod

EXPECTED_WINDOW = [
    # sentinels (held at the round-8 trim of 5: q06 joins covered by
    # q139/q144 here, q39 minhash by q324/q327/q332's banded
    # similarity, q16's lag family by q92/q175/q199/q208's windows)
    "q12_agg_pricing_summary",
    "q31_stream_tumbling",
    "q38_dedup_exact",
    "q40_token_stats",
    "q41_ann_topk",
    # round-9 rotation per VERDICT r08 #1: ALL 45 never-driver-checked
    # oracle-backed entries — round-8 additions front-loaded, then the
    # analytics/timeseries/graph/tokenizer remainder. Retires the
    # rotation debt completely.
    "q332_stream_neardup_ingest",
    "q322_maximal_shared_spans",
    "q325_span_dedup_removal",
    "q327_incremental_dedup",
    "q329_dbscan_cells",
    "q324_knn_hubness",
    "q328_blocklist_tagging",
    "q331_vocab_growth",
    "q92_weighted_moving_avg",
    "q142_last_touch_attribution",
    "q144_event_transitions",
    "q168_continuous_aggregate",
    "q175_time_weighted_avg",
    "q176_linear_interpolate",
    "q185_seasonal_outliers",
    "q191_partition_gaps",
    "q192_cep_pattern",
    "q199_capped_running_balance",
    "q201_event_paths",
    "q257_imputation_eval",
    "q258_percentile_bands",
    "q259_cohort_ltv",
    "q268_m4_decimation",
    "q139_triangle_count",
    "q145_bfs_levels",
    "q131_importance_sample",
    "q138_bigram_logprob",
    "q140_weighted_sample",
    "q147_quality_topk_filter",
    "q246_worst_window_logprob",
    "q323_chunk_windows",
    "q326_weighted_reservoir",
    "q180_forget_cascade",
    "q182_winsorized_mean",
    "q196_seasonal_naive_backtest",
    "q206_weighted_median",
    "q207_benford_audit",
    "q208_lag1_autocorr",
    "q330_acf_ljung_box",
    "q227_jackknife_se",
    "q233_median_ci",
    "q254_huber_mean",
    "q249_bpe_compression",
    "q306_regex_pretokenize",
    "q87_ml_feature_importance",
]


def test_window_composition_pinned():
    names = list(entrymod.queries())[:50]
    assert names == EXPECTED_WINDOW


def test_window_entries_oracle_backed():
    """Every window entry carries a full value oracle — the driver must
    never see a weaker rows-only check inside the conformance window."""
    oracle = entrymod.oracle_sql()
    missing = [n for n in EXPECTED_WINDOW if n not in oracle]
    assert missing == []


def test_registry_well_formed():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    # every oracle key has a query; no dangling SQL
    assert set(o) <= set(q)
    # the registry only ever grows past the window, never shrinks into it
    assert len(q) >= 239
