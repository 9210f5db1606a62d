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
    # SQL-surface block q44-q104. Computed by tools/rotate_window.py.
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
        # TPC-H macro completions (never driver-checked headline tier)
        "q280_tpch_q6",
        "q281_tpch_q2",
        "q282_tpch_q7",
        "q283_tpch_q8",
        "q284_tpch_q9",
        "q285_tpch_q11",
        "q286_tpch_q12",
        "q287_tpch_q13",
        "q288_tpch_q15",
        "q289_tpch_q16",
        "q290_tpch_q19",
        "q291_tpch_q20",
        # round-5 operator families
        "q267_record_linkage",
        "q273_mmr_rerank",
        "q274_semdedup",
        "q295_matryoshka_recall",
        "q296_hamming_ann",
        "q270_replica_reconciliation",
        "q271_window_group_limit",
        "q278_cbo_join_reorder",
        "q279_aqe_runtime_replan",
        "q272_runtime_bloom_join",
        "q276_hybrid_skew_join",
        "q299_bitmap_distinct_rollup",
        "q300_sharded_topk_bounds",
        "q277_deletion_vector_read",
        "q304_grid_range_agg",
        "q302_markov_stationary",
        "q303_activity_streaks",
        "q294_kcore",
        "q292_k_anonymity",
        "q298_label_agreement",
        "q275_grouped_logreg",
        "q293_bradley_terry",
        "q297_isotonic_calibration",
        "q301_ks_test",
        # head of the SQL-surface block
        "q94_nearest_centroid",
        "q98_fuzzy_match",
        "q44_pivot",
        "q44b_unpivot",
        "q45_percentiles",
        "q46_scalar_subquery",
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
