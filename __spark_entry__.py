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
    # Computed by tools/rotate_window.py.
    window = [
        # sentinels — one proven-green entry per major family. Trimmed
        # 8 -> 5 this round (VERDICT r07 #2 wants >=42 first-timers AND
        # the q61 re-check in one 50-slot window). The dropped three:
        # q06 broadcast join and q39 minhash stay covered by same-family
        # first-timers below (q51b/q209 joins, q39b/q39d minhash); q16's
        # lag/window family has no round-8 first-timer — it stands on
        # its r07 driver row plus q64/q200's partitioned windows here.
        "q12_agg_pricing_summary",
        "q31_stream_tumbling",
        "q38_dedup_exact",
        "q40_token_stats",
        "q41_ann_topk",
        # re-check: r07's one red row, now serialized to the scalar
        # wire contract (VERDICT r07 #1)
        "q61_array_funcs",
        # round-7 additions, never driver-checked (VERDICT r07 #2
        # front-load list)
        "q320_reservoir_sample",
        "q321_kn_doc_perplexity",
        "q37d_ml_gbt_scoring",
        "q41f_ivf_fitted",
        # production similarity/dedup certifiers
        "q38b_dedup_rows",
        "q39b_ngram_jaccard_pairs",
        "q220_mutual_nn_pairs",
        "q244_lsh_scurve",
        "q41b_ann_topk_pandas",
        "q41e_ann_ivf_medoid",
        "q39d_mllib_minhash",
        "q171_stream_dedup_ttl",
        # q43-q104 modern-SQL / maintenance block
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
        # analytics / joins / curation block
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
