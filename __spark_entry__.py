"""Driver contract for the spark-graft builder (PySpark target).

Aggregates the engine's query registry: each operator module exposes a
``QUERIES`` dict (name -> callable(spark, sf_dir) -> DataFrame) and an
``ORACLE`` dict (name -> equivalent DuckDB-runnable ANSI SQL). See
SURVEY.md §2B for the inventory this covers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    from nfl_predictions_spark.operators import relational

    modules = [relational]
    for modname in (
        "streaming_batch",
        "dedup",
        "similarity",
        "text",
        "multimodal",
        "extended",
        "skew",
        "ml_text",
        "asof",
        "modern",
        "sketches",
        "maintenance",
        "timeseries",
        "interval",
        "graph",
        "llmprep",
        "warehouse",
        "stats",
        "macro",
        "tokenizer",
        "frontier",
    ):
        try:
            import importlib

            modules.append(
                importlib.import_module(f"nfl_predictions_spark.operators.{modname}")
            )
        except ImportError:
            pass
    try:
        from nfl_predictions_spark.ml import queries as ml_queries

        modules.append(ml_queries)
    except ImportError:
        pass

    queries: dict[str, Callable] = {}
    oracle: dict[str, str] = {}
    for mod in modules:
        queries.update(getattr(mod, "QUERIES", {}))
        oracle.update(getattr(mod, "ORACLE", {}))

    # The first ~50 entries are the driver's conformance window. Rounds 1-2
    # proved the full §2B canonical set (Q01..Q40 green twice); round 3
    # proved the llmprep/curation/warehouse/skew/timeseries/text/multimodal
    # /modern suites; round 4 the TPC-H macro tier + statistics/tokenizer/
    # MV-CDC/ANN-recall suites; round 5 the q213-q266 block — all 50 rows
    # hash-green every round. Round 6 rotates per VERDICT r05 #1 /
    # NOTES "Round-6 rotation plan": the same 8 sentinels + 42 first-time
    # oracle-backed entries, prioritized (1) the TPC-H macro completions
    # q280-q291, (2) the round-5 operator families q267/q270-q279/
    # q292-q304 (record linkage, MMR, SemDeDup, matryoshka/Hamming ANN,
    # CBO/AQE/bloom/skew join machinery, DV reads, k-core, grouped
    # logreg, Bradley-Terry, isotonic, KS test), (3) the head of the
    # SQL-surface block q44-q104. Round 7 rotates per VERDICT r06 #1:
    # the same 8 sentinels + (1) the 15 round-6-era additions
    # (q307-q319, q212b, oracle-promoted q78), (2) the 7 queries
    # rewritten since their last driver row (the rank-select family +
    # q174/q247, whose green rows predate the rewrite), (3) q154/q155
    # (VERDICT r06 #7: never checked anywhere), (4) the q47-q69 head
    # of the SQL-surface block. Round 8 rotates per VERDICT r07 #1/#2:
    # 5 sentinels + the q61 wire-contract re-check + 44 first-timers —
    # the four round-7 additions (q320/q321/q37d/q41f) front-loaded,
    # then the similarity/dedup certifiers, the q43-q104
    # modern/maintenance block, and the analytics/join/curation block.
    # Round 11 rotates per VERDICT r10 #5: the 8 sentinels, then the
    # round-11 additions — q344 (new: IVF tombstone eviction) and q342
    # (REWRITTEN this round: the policy gained the eviction arm, so its
    # r10 green row certifies the old schema) — then 40 re-certs of the
    # stalest entries ranked by LATEST hash-green round (r10 re-certified
    # Q01-Q31, so the tail is now the r1 streaming §2B rows q32-q36 and
    # the r2 set). Computed by tools/rotate_window.py (latest-green
    # backfill, VERDICT r10 #5).
    window = [
        # sentinels — one proven-green entry per major family
        "q12_agg_pricing_summary",
        "q16_window_lag_default",
        "q06_join_broadcast",
        "q31_stream_tumbling",
        "q38_dedup_exact",
        "q39_minhash_lsh_pairs",
        "q40_token_stats",
        "q41_ann_topk",
        # round-11 additions: never-checked (q344, q345, q346) + rewritten (q342)
        "q344_ivf_evict",
        "q342_ivf_refit_policy",
        "q345_ivf_compact",
        "q346_forget_cascade_indexes",
        # stalest-latest-green re-certification pass (r1/r2 rows)
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
    ordered: dict[str, Callable] = {}
    for name in window:
        if name in queries:
            ordered[name] = queries[name]
    for name, fn in queries.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered, oracle


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H-Q1-shaped
    pricing summary (multi-measure hash aggregate, exact-decimal sums)."""
    from nfl_predictions_spark.operators.relational import q12_agg_pricing_summary

    return q12_agg_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
