"""Engine benchmark — prints ONE JSON line for the driver.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Each query executes
its full plan through the noop sink (measures compute, not driver-side
row materialization).

Methodology (round 4):
- median-of-N timing (N = $SPARK_GRAFT_BENCH_RUNS, default 3): every
  round before this one burned judge time on phantom ±1 s "regressions"
  that were single-run JIT/GC noise (VERDICT r03 "What's wrong" #2).
  ``queries`` reports the median; ``queries_min`` the best run.
- shuffle/spill telemetry per query from the Spark status REST API
  (stage-level deltas around the first run): shuffle read/write bytes,
  memory+disk spill, and input bytes are the actual 100 TB scale-killers
  that wall-clock alone cannot show (VERDICT r03 "What's missing" #3).

Methodology (round 6, ADVICE r05 #1): the query-builder call is timed
INSIDE each run — several queries do real work eagerly at construction
(staged stores, iterative peel loops, driver-action probes) that the
pre-r06 bench missed. ``value``/``queries`` therefore include
construction; ``value_exec``/``queries_exec`` are the write-only
medians comparable to rounds <=5, and ``eager_construct_sec`` names
the queries whose construction does >20% of their work.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_scan_parquet",
    "q03_project_alias",
    "q04_filter_conjunctive",
    "q06_join_broadcast",
    "q07_join_shuffle_agg",
    "q08_join_left_outer",
    "q11_join_theta",
    "q12_agg_pricing_summary",
    "q13_agg_distinct",
    "q16_window_lag_default",
    "q17_window_rank",
    "q18_window_running_sum",
    "q20_topk",
    "q26_array_collect",
    "q27_json",
    "q30_grouped_normalize",
    "q30b_grouped_normalize_expr",
    # north-star ops (production paths only: the intentionally-quadratic
    # exact baselines like q39b stay correctness-only, outside the bench)
    "q38_dedup_exact",
    "q39_minhash_lsh_pairs",
    "q40_token_stats",
    "q41_ann_topk",
    "q41c_ann_lsh",
    "q42_embedding_near_dup",
    "q91_decontamination",
    "q106_repetition_stats",
    "q108_hash_split",
    "q109_token_shards",
    "q111_corpus_pipeline",
    "q130_sequence_packing",
    "q131_importance_sample",
    "q132_bm25_retrieval",
    "q133_containment_decontam",
    # extended + scale patterns
    "q63_asof_join",
    "q44_pivot",
    "q45_percentiles",
    "q51_salted_agg",
    "q52_bucketed_join",
    # event analytics + statistics (round 3)
    "q143_cohort_retention",
    "q146_split_drift",
    "q150_cusum_drawdown",
    "q151_frequent_pairs",
    # TPC-H macro tier: composed multi-join warehouse plans (round 3)
    "q156_tpch_q3",
    "q157_tpch_q5",
    "q158_tpch_q10",
    "q159_tpch_q18",
    "q172_tpch_q17",
    "q173_tpch_q21",
    # round-3 additions: PCA production path, incremental view upkeep,
    # relational k-means, one-pass quality audit
    "q163b_pca_eigh",
    "q164_incremental_mv",
    "q165b_kmeans_arrow",
    "q166_constraint_audit",
    # round-4 additions: sketches, EWMA, communities, unigram tokenizer,
    # novelty, PQ index, MV retractions, Arrow UDF, language mixture
    # (q220 mutual-NN stays out: its candidate set is the intentionally
    # exact q39b edge set, a correctness baseline, not a production path)
    "q213_countmin_heavy_hitters",
    "q214_ewma_smoothing",
    "q215_label_propagation",
    "q216_unigram_viterbi_tokenize",
    "q217_theilsen_slope",
    "q218_ngram_novelty",
    "q219_pq_ann",
    "q221_mv_retraction",
    "q222_map_in_arrow",
    "q223_temperature_balance",
    # round-5 widening (VERDICT r04 #8: headline >=70 with growth
    # outliers): complete the TPC-H macro tier, tokenizer production
    # paths, composed/filtered ANN, text retrieval, rolling stats
    "q193_tpch_q4",
    "q194_tpch_q14",
    "q195_tpch_q22",
    "q160_bpe_merges",
    "q162_bpe_tokenize",
    "q224_ivfpq_ann",
    "q229_filtered_ann",
    "q231_phrase_search",
    "q245_semantic_decontam",
    "q240_rolling_corr",
    # round-5 additions: record linkage, M4 decimation, dynamic
    # partition pruning, replica reconciliation
    "q267_record_linkage",
    "q268_m4_decimation",
    "q269_dynamic_partition_pruning",
    "q270_replica_reconciliation",
    # round-5 additions: optimizer surfaces, diversified retrieval,
    # semantic dedup, GLM, skew decomposition, deletion vectors
    "q271_window_group_limit",
    "q272_runtime_bloom_join",
    "q273_mmr_rerank",
    "q274_semdedup",
    "q275_grouped_logreg",
    "q276_hybrid_skew_join",
    "q277_deletion_vector_read",
    "q278_cbo_join_reorder",
    "q279_aqe_runtime_replan",
    # round-5 completion: the remaining 12 TPC-H shapes (22/22 tier)
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
    # round-5 additions: privacy, preference fitting, dense subgraph,
    # embedding truncation
    "q292_k_anonymity",
    "q293_bradley_terry",
    "q294_kcore",
    "q295_matryoshka_recall",
    # round-5 additions: binary-quantized ANN, isotonic calibration,
    # annotator agreement, bitmap distinct rollup
    "q296_hamming_ann",
    "q297_isotonic_calibration",
    "q298_label_agreement",
    "q299_bitmap_distinct_rollup",
    "q300_sharded_topk_bounds",
    "q301_ks_test",
    "q302_markov_stationary",
    "q303_activity_streaks",
    "q304_grid_range_agg",
    "q305_merkle_sync",
    "q306_regex_pretokenize",
    # round-6: the six ex-single-partition order-statistic queries
    # (VERDICT r05 #7) — now bucket-decomposed; benched so any
    # regression back to a global sort shows up as a wall-time cliff
    "q250_auc_calibration",
    "q198_conversion_latency",
    "q256_session_quality",
    "q204_rfm_segmentation",
    "q211_pareto_concentration",
    "q174_sorted_neighborhood",
    # round-6 operator additions
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
    # round-7 widening (VERDICT r06 #5): every operator module gets at
    # least one benched representative so scale regressions anywhere in
    # the registry surface as wall-time moves, not silence.
    # graph family
    "q95_pagerank",
    "q66_connected_components",
    "q139_triangle_count",
    "q145_bfs_levels",
    "q265_hierarchy_rollup",
    # warehouse family
    "q118_scd2_dimension",
    "q170_snapshot_diff",
    "q228_scd2_merge_apply",
    "q239_lsm_compaction",
    # modern-SQL surface
    "q72_recursive_cte",
    "q85_pandas_api",
    "q86_approx_top_k",
    # previously unrepresented modules
    "q161_skyline",
    "q65_range_join",
    "q129_max_concurrency",
    "q40f_tfidf_top_terms",
    "q43_multimodal_features",
    "q154_image_resize_stats",
    "q31_stream_tumbling",
    "q171_stream_dedup_ttl",
    "q37c_ml_index_assemble",
    # round-8 additions (VERDICT r07 #4): the round-7 registry growth
    # gets scale trendlines — exact-k reservoir, KN per-doc perplexity
    # filter (shares q319's staged model), full GBT-inference oracle
    # path, fitted-KMeans IVF lattice.
    "q320_reservoir_sample",
    "q321_kn_doc_perplexity",
    "q37d_ml_gbt_scoring",
    "q41f_ivf_fitted",
    # round-8 registry growth: variable-length exact-repeat spans,
    # RAG chunk windows, kNN hubness audit
    "q322_maximal_shared_spans",
    "q323_chunk_windows",
    "q324_knn_hubness",
    "q325_span_dedup_removal",
    "q326_weighted_reservoir",
    # round-8 late growth: incremental batch-vs-base dedup (prefix-filter
    # cross-corpus ssjoin) and multi-phrase blocklist tagging (gram
    # hash-join in place of regex alternation)
    "q327_incremental_dedup",
    "q328_blocklist_tagging",
    "q329_dbscan_cells",
    "q330_acf_ljung_box",
    "q331_vocab_growth",
    "q332_stream_neardup_ingest",
    # round-9: base-absorb manifest compaction (incremental == rebuild)
    # and the multi-generation sequential absorb loop. q335 (the
    # streamed q334) stays out: q332 already carries the fixed
    # stream-replay wall in the headline, and q335's plans are q334's.
    "q333_absorb_rededup",
    "q334_multigen_absorb",
    "q336_compacted_rededup",
    "q337_ivf_absorb",
    "q338_evict_rededup",
    "q339_ivf_drift",
    # round-10: the quantizer re-fit + index migration q339 triggers,
    # and the drift policy that decides it. q341 (streamed q337) stays
    # out on the q335 precedent: its plans are q337's plus the fixed
    # stream-replay wall q332 already carries.
    "q340_ivf_refit_migrate",
    "q342_ivf_refit_policy",
    "q343_dedup_maintenance_policy",
    "q344_ivf_evict",
    "q345_ivf_compact",
    "q346_forget_cascade_indexes",
]

_METRIC_FIELDS = {
    "shuffle_read": "shuffleReadBytes",
    "shuffle_write": "shuffleWriteBytes",
    "spill_memory": "memoryBytesSpilled",
    "spill_disk": "diskBytesSpilled",
    "input": "inputBytes",
}

# Host-speed calibration probe (VERDICT r11 "Next round" #3): a fixed,
# single-partition, deterministic CPU-bound job (~1 s on the reference
# host). One partition => one core, so the number is a pure host-speed
# measure independent of $SPARK_GRAFT_CPUS; recording it in the detail
# lets a later reader normalize cross-day runs (round-11 documented
# ±15-20 % uniform host drift with per-query swings to 2x on identical
# code, which made every cross-round total ambiguous).
_CALIBRATION_ROWS = 150_000_000


def _calibration_sec(spark) -> float:
    """Median-of-3 wall time of the fixed single-core probe (one
    unrecorded warm run first so codegen JIT is excluded)."""
    times = []
    for i in range(4):
        t0 = time.time()
        spark.range(0, _CALIBRATION_ROWS, 1, 1).selectExpr(
            "bit_xor(xxhash64(id)) AS h"  # xor: no ANSI sum overflow
        ).collect()
        if i > 0:
            times.append(time.time() - t0)
    return round(statistics.median(times), 3)


def _stage_totals(spark, settle: bool = False) -> dict[str, int] | None:
    """Cumulative completed-stage metrics from the status REST API.

    Diffing these around a query run gives per-query shuffle/spill/input
    bytes. Returns None when the UI is unavailable (telemetry is then
    omitted, never fatal).

    With ``settle=True`` (used for the *after* read), first polls
    ``?status=active`` until no stage is still running: a stage that
    completes asynchronously after ``save()`` returns would otherwise be
    attributed to the NEXT query's delta (ADVICE r04 #2). Attribution
    still assumes ``spark.ui.retainedStages`` (20000 here) exceeds the
    run's stage count — noted in SCALING.md's table header."""
    base = spark.sparkContext.uiWebUrl
    if not base:
        return None
    app = spark.sparkContext.applicationId

    def _fetch(status: str):
        url = f"{base}/api/v1/applications/{app}/stages?status={status}"
        with urllib.request.urlopen(url, timeout=10) as resp:
            return json.load(resp)

    try:
        if settle:
            for _ in range(50):  # <=5 s; stages finish in ms after save()
                if not _fetch("active"):
                    break
                time.sleep(0.1)
        stages = _fetch("complete")
    except Exception:
        return None
    totals = dict.fromkeys(_METRIC_FIELDS, 0)
    for s in stages:
        for key, field in _METRIC_FIELDS.items():
            totals[key] += int(s.get(field) or 0)
    return totals


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    import __spark_entry__ as entrymod
    from nfl_predictions_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # Warm the JVM/codegen path once with a trivial job.
    spark.range(1000).count()
    calibration = _calibration_sec(spark)

    # Optional subset filter for scaling studies (round 12, VERDICT r11
    # #6): SPARK_GRAFT_BENCH_ONLY="q108_hash_split,q41_ann_topk" runs
    # just those HEADLINE entries (e.g. the data-bound set at sf1.0 at
    # two core counts). Unset (the driver's path), the full HEADLINE
    # list runs exactly as before — the filter never removes entries
    # from the default run.
    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    only = {n.strip() for n in only_env.split(",") if n.strip()} if only_env else None

    per_query: dict[str, float] = {}
    per_query_min: dict[str, float] = {}
    per_query_exec: dict[str, float] = {}
    telemetry: dict[str, dict[str, float]] = {}
    total = 0.0
    total_exec = 0.0
    construct_secs: dict[str, float] = {}
    for name in HEADLINE:
        if name not in queries or (only is not None and name not in only):
            continue
        # The builder call runs INSIDE the timed region (ADVICE r05 #1):
        # several queries do real work eagerly at construction (staged
        # stores, iterative peel loops, driver-action probes), and timing
        # only the final noop write under-reported them. Each run
        # re-constructs, so the median reflects steady-state (fixture
        # caches staged by an earlier run stay staged — that is the
        # store's contract, and run 1's staging cost is median-filtered).
        runs: list[float] = []
        constructs: list[float] = []
        for i in range(n_runs):
            before = _stage_totals(spark) if i == 0 else None
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            t_built = time.time()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            constructs.append(t_built - t0)
            if i == 0 and before is not None:
                after = _stage_totals(spark, settle=True)
                if after is not None:
                    telemetry[name] = {
                        k: round((after[k] - before[k]) / 1e6, 3)
                        for k in _METRIC_FIELDS
                    }
        med = round(statistics.median(runs), 3)
        per_query[name] = med
        per_query_min[name] = round(min(runs), 3)
        per_query_exec[name] = round(
            statistics.median(r - c for r, c in zip(runs, constructs)), 3
        )
        med_construct = round(statistics.median(constructs), 3)
        # Flag eager-construction queries (ADVICE r05 #1): construction
        # doing >20% of the work means the plan executes before the write.
        if med > 0.05 and med_construct > 0.2 * med:
            construct_secs[name] = med_construct
        total += med
        total_exec += per_query_exec[name]

    # Emission contract (VERDICT r04 "Next round" #1): the driver captures
    # only a ~2 KB tail of stdout and parses the LAST line. Round 4's line
    # grew to ~11 KB with per-query telemetry and BENCH_r04.json recorded
    # `parsed: null`. So: full per-query detail goes to an artifact file;
    # the final printed line is a compact summary guaranteed <1 KB.
    detail = {
        "metric": "headline_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "queries_min": per_query_min,
        # write-only medians (run minus construction) — the round-5
        # comparable numbers; `queries` now includes construction
        # (ADVICE r05 #1), which the pre-r06 bench did not time
        "queries_exec": per_query_exec,
        "value_exec": round(total_exec, 3),
        "runs_per_query": n_runs,
        "telemetry_mb": telemetry,
        # queries whose construction does >20% of their work eagerly
        # (driver actions / staged stores before the timed write)
        "eager_construct_sec": construct_secs,
        "sf": sf,
        "cpus": cpus,
        # fixed single-core probe (see _calibration_sec): divide any two
        # runs' calibration_sec to normalize away host-speed drift
        "calibration_sec": calibration,
    }
    # Core count in the filename (VERDICT r11 "What's wrong" #4): the
    # driver's low-core scaling run used to OVERWRITE the main run's
    # detail, which left PERF_r11 with no per-query table.
    subset_tag = "_subset" if only is not None else ""
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "artifacts",
        f"bench_detail_sf{sf}_c{cpus}{subset_tag}.json",
    )
    try:
        os.makedirs(os.path.dirname(detail_path), exist_ok=True)
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
    except OSError:
        detail_path = None  # read-only checkout: summary line still valid

    summary = {
        "metric": "headline_queries_total_wall",
        "value": round(total, 3),
        "value_exec": round(total_exec, 3),
        "unit": "sec",
        "sf": sf,
        "runs_per_query": n_runs,
        "n_queries": len(per_query),
        "queries_detail": detail_path,
        "calibration_sec": calibration,
    }
    line = json.dumps(summary)
    if len(line) >= 1000:
        # Never let an oversized line discard a finished run (ADVICE r05
        # #4): degrade by dropping optional keys until it fits.
        print(
            f"WARNING: summary line {len(line)}B exceeds driver capture; "
            "truncating optional keys",
            file=sys.stderr,
        )
        for key in ("calibration_sec", "queries_detail", "n_queries", "runs_per_query"):
            summary.pop(key, None)
            line = json.dumps(summary)
            if len(line) < 1000:
                break
    print(line)


if __name__ == "__main__":
    main()
