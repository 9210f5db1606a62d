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
    # /modern suites (50 rows, 0 failures). Round 4 rotates onto the
    # round-3 mass that has only local-sweep evidence: 8 sentinels (one
    # per proven family, so a regression anywhere still shows) + 42
    # first-time entries — TPC-H macro tier, statistics, BPE tokenizer,
    # k-means/covariance, MV/CDC/audit, ANN recall certification, the new
    # dedup family, frontier/skyline, packing/BM25/retrieval, and the
    # curation-selection suite. All 42 are oracle-backed.
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
        # TPC-H macro tier (composed multi-join warehouse plans)
        "q156_tpch_q3",
        "q157_tpch_q5",
        "q158_tpch_q10",
        "q159_tpch_q18",
        "q172_tpch_q17",
        "q173_tpch_q21",
        "q193_tpch_q4",
        "q194_tpch_q14",
        "q195_tpch_q22",
        # statistics suite
        "q137_grouped_ols",
        "q148_contingency_chi2",
        "q149_welch_ttest",
        "q152_exact_grouped_median",
        "q153_mad_outliers",
        "q163_cov_matrix",
        "q183_histogram_median",
        "q197_ab_proportion_ztest",
        # BPE tokenizer training + apply
        "q160_bpe_merges",
        "q162_bpe_tokenize",
        # clustering / view maintenance / CDC / quality audit
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
        # frontier / skyline
        "q161_skyline",
        # LLM-prep: packing, retrieval, fusion, selection
        "q130_sequence_packing",
        "q132_bm25_retrieval",
        "q136_hybrid_rrf",
        "q177_dataset_mixture",
        "q178_set_cover_selection",
        "q190_stratified_kfold",
        # event analytics + curation picks
        "q151_frequent_pairs",
        "q143_cohort_retention",
        "q146_split_drift",
        "q150_cusum_drawdown",
        "q179_scd2_pit_lookup",
        "q210_growth_accounting",
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
