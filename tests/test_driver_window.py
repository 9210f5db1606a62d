"""Pin the driver conformance window (VERDICT r03 next-round #7).

The driver checks the FIRST 50 ``queries()`` entries at sf0.01. A
registry edit that reorders entries would silently change what the
driver verifies; this pin makes any window change an explicit,
reviewed edit of EXPECTED_WINDOW.
"""

from __future__ import annotations

import __spark_entry__ as entrymod

EXPECTED_WINDOW = [
    # sentinels (unchanged since round 4)
    "q12_agg_pricing_summary",
    "q16_window_lag_default",
    "q06_join_broadcast",
    "q31_stream_tumbling",
    "q38_dedup_exact",
    "q39_minhash_lsh_pairs",
    "q40_token_stats",
    "q41_ann_topk",
    # round-5 rotation: 42 first-time entries from the q213-q266 block
    # (VERDICT r04 next-round #2)
    "q213_countmin_heavy_hitters",
    "q215_label_propagation",
    "q216_unigram_viterbi_tokenize",
    "q219_pq_ann",
    "q224_ivfpq_ann",
    "q229_filtered_ann",
    "q225_stream_stream_left_join",
    "q222_map_in_arrow",
    "q221_mv_retraction",
    "q226_zone_map_pruning",
    "q228_scd2_merge_apply",
    "q232_aggregate_backfill_diff",
    "q237_join_skew_profile",
    "q238_bloom_file_pruning",
    "q239_lsm_compaction",
    "q214_ewma_smoothing",
    "q230_changepoint_binary_seg",
    "q240_rolling_corr",
    "q242_interval_union_length",
    "q243_nearest_asof_join",
    "q252_seasonal_decompose",
    "q263_holt_linear",
    "q264_weekly_drift",
    "q217_theilsen_slope",
    "q236_robust_scaler_stats",
    "q250_auc_calibration",
    "q255_quantile_normalization",
    "q218_ngram_novelty",
    "q231_phrase_search",
    "q241_weighted_jaccard_pairs",
    "q245_semantic_decontam",
    "q251_retrieval_eval",
    "q253_hard_negatives",
    "q260_dedup_savings",
    "q261_source_token_entropy",
    "q266_doc_keyphrases",
    "q223_temperature_balance",
    "q234_representation_audit",
    "q235_nested_samples",
    "q247_curriculum_order",
    "q248_split_leakage_audit",
    "q265_hierarchy_rollup",
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
