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

    # The first entries double as the per-category conformance window: one
    # canonical query per SURVEY.md §2B category (Q01..Q40) followed by the
    # LLM-pipeline / time-series suite, so a prefix scan of the registry
    # exercises the full declared surface. Remaining (b/c-variant and
    # extended) entries follow in module order.
    window = [
        # §2B Q01..Q40, one canonical entry each
        "q01_scan_parquet",
        "q02_scan_csv_schema",
        "q03_project_alias",
        "q04_filter_conjunctive",
        "q05_limit_offset",
        "q06_join_broadcast",
        "q07_join_shuffle_agg",
        "q08_join_left_outer",
        "q09_join_semi",
        "q10_join_anti",
        "q11_join_theta",
        "q12_agg_pricing_summary",
        "q13_agg_distinct",
        "q14_agg_approx_distinct",
        "q15_rollup",
        "q16_window_lag_default",
        "q17_window_rank",
        "q18_window_running_sum",
        "q19_sort_multikey",
        "q20_topk",
        "q21_union_all_counts",
        "q22_intersect",
        "q23_string_scalars",
        "q24_date_scalars",
        "q25_math_conditional",
        "q26_array_collect",
        "q27_json",
        "q28_cast_matrix",
        "q29_udf_parity",
        "q30_grouped_normalize",
        "q31_stream_tumbling",
        "q32_stream_sliding",
        "q33_stream_session",
        "q34_stream_watermark",
        "q35_stream_dedup",
        "q36_stream_route_counts",
        "q37_ml_best_play",
        "q38_dedup_exact",
        "q39_minhash_lsh_pairs",
        "q40_token_stats",
        # LLM-pipeline north-star + time-series suite
        "q96_streaming_matview",
        "q91_decontamination",
        "q41_ann_topk",
        "q41c_ann_lsh",
        "q42_embedding_near_dup",
        "q90_chunk_documents",
        "q105_vocab_oov",
        "q63_asof_join",
        "q65_range_join",
        "q66_connected_components",
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
