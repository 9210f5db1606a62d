"""Pin the driver conformance window (VERDICT r03 next-round #7).

The driver checks the FIRST 50 ``queries()`` entries at sf0.01. A
registry edit that reorders entries would silently change what the
driver verifies; this pin makes any window change an explicit,
reviewed edit of EXPECTED_WINDOW.
"""

from __future__ import annotations

import __spark_entry__ as entrymod

EXPECTED_WINDOW = [
    # sentinels (trimmed 8 -> 5 in round 8; dropped q06/q39 families are
    # covered by same-family first-timers in this window — q51b/q209
    # joins, q39b/q39d minhash; q16's lag family stands on its r07 row)
    "q12_agg_pricing_summary",
    "q31_stream_tumbling",
    "q38_dedup_exact",
    "q40_token_stats",
    "q41_ann_topk",
    # round-8 rotation per VERDICT r07 #1/#2: the q61 wire-contract
    # re-check, the four round-7 additions front-loaded, then the
    # similarity certifiers + modern/maintenance + analytics blocks
    "q61_array_funcs",
    "q320_reservoir_sample",
    "q321_kn_doc_perplexity",
    "q37d_ml_gbt_scoring",
    "q41f_ivf_fitted",
    "q38b_dedup_rows",
    "q39b_ngram_jaccard_pairs",
    "q220_mutual_nn_pairs",
    "q244_lsh_scurve",
    "q41b_ann_topk_pandas",
    "q41e_ann_ivf_medoid",
    "q39d_mllib_minhash",
    "q171_stream_dedup_ttl",
    "q43_multimodal_features",
    "q45b_percentile_approx",
    "q70_sink_roundtrip",
    "q71_funnel",
    "q77_xml_roundtrip",
    "q81_catalog_table",
    "q82_compaction",
    "q85_pandas_api",
    "q93_schema_evolution",
    "q99_collation",
    "q101_malformed_csv",
    "q102_higher_order_funcs",
    "q103_sql_variables",
    "q104_sql_scripting",
    "q187_sql_pipe_syntax",
    "q188_lateral_alias_params",
    "q51b_salted_join",
    "q209_null_split_outer_join",
    "q269_dynamic_partition_pruning",
    "q205_skew_diagnostics",
    "q186_mode_per_group",
    "q189_grouped_agg_udaf",
    "q200_ratio_to_report",
    "q202_null_semantics",
    "q203_try_functions",
    "q262_audience_overlap",
    "q305_merkle_sync",
    "q40f_tfidf_top_terms",
    "q184_feature_hashing",
    "q63b_asof_tolerance",
    "q141_zipf_fit",
    "q64_gap_fill",
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
