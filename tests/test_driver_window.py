"""Pin the driver conformance window (VERDICT r03 next-round #7).

The driver checks the FIRST 50 ``queries()`` entries at sf0.01. A
registry edit that reorders entries would silently change what the
driver verifies; this pin makes any window change an explicit,
reviewed edit of EXPECTED_WINDOW.
"""

from __future__ import annotations

import __spark_entry__ as entrymod

EXPECTED_WINDOW = [
    # sentinels
    "q12_agg_pricing_summary",
    "q16_window_lag_default",
    "q06_join_broadcast",
    "q31_stream_tumbling",
    "q38_dedup_exact",
    "q39_minhash_lsh_pairs",
    "q40_token_stats",
    "q41_ann_topk",
    # TPC-H macro tier
    "q156_tpch_q3",
    "q157_tpch_q5",
    "q158_tpch_q10",
    "q159_tpch_q18",
    "q172_tpch_q17",
    "q173_tpch_q21",
    "q193_tpch_q4",
    "q194_tpch_q14",
    "q195_tpch_q22",
    # statistics
    "q137_grouped_ols",
    "q148_contingency_chi2",
    "q149_welch_ttest",
    "q152_exact_grouped_median",
    "q153_mad_outliers",
    "q163_cov_matrix",
    "q183_histogram_median",
    "q197_ab_proportion_ztest",
    # tokenizer
    "q160_bpe_merges",
    "q162_bpe_tokenize",
    # clustering / MV / CDC / audit
    "q165_kmeans_lloyd",
    "q164_incremental_mv",
    "q170_snapshot_diff",
    "q166_constraint_audit",
    # ANN recall certification
    "q167_ann_recall",
    "q181_quantized_ann_recall",
    # round-3 dedup family
    "q133_containment_decontam",
    "q134_cluster_dedup_survivors",
    "q135_prefix_filter_jaccard",
    "q174_sorted_neighborhood",
    # frontier
    "q161_skyline",
    # LLM-prep picks
    "q130_sequence_packing",
    "q132_bm25_retrieval",
    "q136_hybrid_rrf",
    "q177_dataset_mixture",
    "q178_set_cover_selection",
    "q190_stratified_kfold",
    # event analytics + curation
    "q151_frequent_pairs",
    "q143_cohort_retention",
    "q146_split_drift",
    "q150_cusum_drawdown",
    "q179_scd2_pit_lookup",
    "q210_growth_accounting",
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
