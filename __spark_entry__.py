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
    # Round 9 rotates per VERDICT r08 #1 / NOTES "Round-9 rotation
    # plan": the round-8 continuation additions (q322-q332)
    # front-loaded, then the analytics/timeseries/graph/tokenizer
    # remainder. Sentinels stay at the round-8 trim of 5 (round-8
    # precedent: q06 joins covered here by q139/q144's joins, q39
    # minhash by q324/q327/q332's banded similarity machinery, q16's
    # lag family by q92/q175/q199/q208's windows) so ALL 45
    # never-driver-checked oracle-backed entries fit in one 50-slot
    # window — the rotation debt retires completely this round.
    # Computed by tools/rotate_window.py.
    window = [
        # sentinels — one proven-green entry per major family
        "q12_agg_pricing_summary",
        "q31_stream_tumbling",
        "q38_dedup_exact",
        "q40_token_stats",
        "q41_ann_topk",
        # round-8 additions, never driver-checked (VERDICT r08 #1
        # front-load list): streaming/incremental/span dedup, DBSCAN,
        # hubness, blocklist tagging, vocab growth
        "q332_stream_neardup_ingest",
        "q322_maximal_shared_spans",
        "q325_span_dedup_removal",
        "q327_incremental_dedup",
        "q329_dbscan_cells",
        "q324_knn_hubness",
        "q328_blocklist_tagging",
        "q331_vocab_growth",
        # analytics / timeseries tail (q87-q268 remainder)
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
