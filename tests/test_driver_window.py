"""Pin the driver conformance window (VERDICT r03 next-round #7).

The driver checks the FIRST 50 ``queries()`` entries at sf0.01. A
registry edit that reorders entries would silently change what the
driver verifies; this pin makes any window change an explicit,
reviewed edit of EXPECTED_WINDOW.
"""

from __future__ import annotations

import __spark_entry__ as entrymod

EXPECTED_WINDOW = [
    "q12_agg_pricing_summary",
    "q16_window_lag_default",
    "q06_join_broadcast",
    "q31_stream_tumbling",
    "q38_dedup_exact",
    "q39_minhash_lsh_pairs",
    "q40_token_stats",
    "q41_ann_topk",
    "q344_ivf_evict",
    "q342_ivf_refit_policy",
    "q345_ivf_compact",
    "q346_forget_cascade_indexes",
    "q15b_cube",
    "q19b_sort_nulls",
    "q26b_map_lookup",
    "q53_stateful_running_totals",
    "q68_stream_stream_join",
    "q83_python_stream_source",
    "q84_state_reader",
    "q100_stream_static_enrich",
    "q32_stream_sliding",
    "q33_stream_session",
    "q34_stream_watermark",
    "q35_stream_dedup",
    "q36_stream_route_counts",
    "q91_decontamination",
    "q41c_ann_lsh",
    "q42_embedding_near_dup",
    "q90_chunk_documents",
    "q63_asof_join",
    "q65_range_join",
    "q66_connected_components",
    "q96_streaming_matview",
    "q112_streaming_corpus_ingest",
    "q39c_simhash_pairs",
    "q117_dup_passages",
    "q40b_quality_score",
    "q40c_lang_id",
    "q40d_fingerprint",
    "q40e_top_terms",
    "q105_vocab_oov",
    "q97_image_header_parse",
    "q114_image_decode_stats",
    "q115_audio_decode_stats",
    "q116_video_decode_stats",
    "q121_per_key_sample",
    "q51_salted_agg",
    "q52_bucketed_join",
    "q120_bloom_semi_join",
    "q72_recursive_cte",
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
