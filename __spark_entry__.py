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
    # /modern suites (50 rows, 0 failures); round 4 proved the TPC-H macro
    # tier, statistics, tokenizer, MV/CDC, ANN-recall, dedup, and
    # curation-selection suites (50 rows, all hash-green). Round 5 rotates
    # onto the q213-q266 block that so far has only local-sweep +
    # driver_sim evidence (VERDICT r04 next-round #2): the same 8
    # sentinels (one proven-green entry per family, so a regression
    # anywhere still shows) + 42 first-time oracle-backed entries —
    # sketches, graph, composed ANN (PQ/IVFPQ/filtered), stream-stream
    # join, warehouse maintenance (SCD2/backfill/LSM/zone-map/bloom),
    # timeseries (EWMA/rolling-corr/seasonal/Holt), robust statistics,
    # text retrieval (phrase/eval/hard-negatives/keyphrases), and
    # curation (representation audit/curriculum/leakage). The 12
    # remaining q213-q266 entries plus the round-2 llmprep leftovers
    # (q106-q129) are round 6's rotation.
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
        # sketches / graph / tokenizer
        "q213_countmin_heavy_hitters",
        "q215_label_propagation",
        "q216_unigram_viterbi_tokenize",
        # composed ANN production paths
        "q219_pq_ann",
        "q224_ivfpq_ann",
        "q229_filtered_ann",
        # streaming + Arrow surfaces
        "q225_stream_stream_left_join",
        "q222_map_in_arrow",
        # warehouse maintenance / storage layout
        "q221_mv_retraction",
        "q226_zone_map_pruning",
        "q228_scd2_merge_apply",
        "q232_aggregate_backfill_diff",
        "q237_join_skew_profile",
        "q238_bloom_file_pruning",
        "q239_lsm_compaction",
        # timeseries
        "q214_ewma_smoothing",
        "q230_changepoint_binary_seg",
        "q240_rolling_corr",
        "q242_interval_union_length",
        "q243_nearest_asof_join",
        "q252_seasonal_decompose",
        "q263_holt_linear",
        "q264_weekly_drift",
        # robust statistics
        "q217_theilsen_slope",
        "q236_robust_scaler_stats",
        "q250_auc_calibration",
        "q255_quantile_normalization",
        # text retrieval / dedup
        "q218_ngram_novelty",
        "q231_phrase_search",
        "q241_weighted_jaccard_pairs",
        "q245_semantic_decontam",
        "q251_retrieval_eval",
        "q253_hard_negatives",
        "q260_dedup_savings",
        "q261_source_token_entropy",
        "q266_doc_keyphrases",
        # curation / mixture
        "q223_temperature_balance",
        "q234_representation_audit",
        "q235_nested_samples",
        "q247_curriculum_order",
        "q248_split_leakage_audit",
        # hierarchy
        "q265_hierarchy_rollup",
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
