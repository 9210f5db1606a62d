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
    # of the SQL-surface block. Computed by tools/rotate_window.py.
    window = [
        # sentinels — one proven-green entry per family
        "q12_agg_pricing_summary",
        "q16_window_lag_default",
        "q06_join_broadcast",
        "q31_stream_tumbling",
        "q38_dedup_exact",
        "q39_minhash_lsh_pairs",
        "q40_token_stats",
        "q41_ann_topk",
        # round-6-era additions (never driver-checked)
        "q307_winnowing_fingerprints",
        "q308_ngram_overlap_eval",
        "q309_simplified_silhouette",
        "q310_brier_decomposition",
        "q311_conformal_thresholds",
        "q312_kaplan_meier",
        "q313_cuped_ab_readout",
        "q314_wordpiece_tokenize",
        "q315_adamic_adar",
        "q316_kmv_distinct_sketch",
        "q317_attribution_models",
        "q318_poisson_bootstrap_ci",
        "q319_kneser_ney_bigrams",
        "q212b_ivf_recall_medoid",
        "q78_binary_ingest",
        # rewritten since their last driver row (rank-select family + q174/q247)
        "q198_conversion_latency",
        "q204_rfm_segmentation",
        "q211_pareto_concentration",
        "q256_session_quality",
        "q174_sorted_neighborhood",
        "q169_equidepth_histogram",
        "q247_curriculum_order",
        # never checked by driver OR judge sample (VERDICT r06 #7)
        "q154_image_resize_stats",
        "q155_sliding_distinct",
        # q47-q69 head of the SQL-surface block
        "q47_sql_api",
        "q48_partition_pruned_scan",
        "q49_json_source",
        "q49b_orc_source",
        "q50_exists_agg_having",
        "q54_python_udtf",
        "q55_merge_upsert",
        "q56_window_ranks",
        "q56b_window_range_frame",
        "q56c_window_value_fns",
        "q57_posexplode",
        "q58_stats_agg",
        "q59_hash_sample",
        "q60_grouping_sets_sql",
        "q61_array_funcs",
        "q62_struct_nested",
        "q67_stratified_sample",
        "q69_python_datasource",
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
