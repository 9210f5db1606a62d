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
    # proved the full §2B canonical set (Q01..Q40 green twice) plus the
    # north-star suite; round 3 rotates the window onto the never-checked
    # mass: 10 sentinels (one per proven family, so a regression anywhere
    # still shows), the two round-2 hash-fix proofs (q96/q105), then the
    # llmprep / curation / warehouse / skew / timeseries / text / multimodal
    # / modern-SQL suites getting their first driver rows.
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
        "q37_ml_best_play",
        # Q37's deterministic prefix (StringIndexer + VectorAssembler),
        # first driver row with a full value oracle
        "q37c_ml_index_assemble",
        # round-2 hash-fail fixes — prove the output-type contract
        "q96_streaming_matview",
        "q105_vocab_oov",
        # LLM data-prep suite (first driver rows)
        "q106_repetition_stats",
        "q107_pii_redaction",
        "q108_hash_split",
        "q109_token_shards",
        "q110_unigram_logprob",
        "q111_corpus_pipeline",
        "q112_streaming_corpus_ingest",
        "q113_pipeline_observability",
        # curation / profiling
        "q117_dup_passages",
        "q121_per_key_sample",
        "q123_column_profile",
        # warehouse layout
        "q118_scd2_dimension",
        "q119_zorder_layout",
        # skew / runtime-filter patterns
        "q120_bloom_semi_join",
        "q51_salted_agg",
        "q52_bucketed_join",
        # time-series
        "q124_sessionize",
        "q126_rolling_zscore",
        "q129_max_concurrency",
        # text-analysis variants
        "q40b_quality_score",
        "q40c_lang_id",
        "q40d_fingerprint",
        "q40e_top_terms",
        # simhash near-dup
        "q39c_simhash_pairs",
        # multimodal codecs (oracle-backed)
        "q97_image_header_parse",
        "q114_image_decode_stats",
        "q115_audio_decode_stats",
        "q116_video_decode_stats",
        # modern SQL surface
        "q72_recursive_cte",
        "q73_variant_json",
        "q74_sql_udf",
        "q75_lateral_join",
        "q76_listagg",
        "q86_approx_top_k",
        "q88_group_by_all",
        "q89_nullsafe_join",
        # iterative graph + sketch rollup
        "q95_pagerank",
        "q80_hll_sketch_rollup",
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
