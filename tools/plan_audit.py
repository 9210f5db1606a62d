"""Physical-plan audit across the whole query registry.

Greps every oracle-backed query's executed plan for scale red flags:

- CartesianProduct / BroadcastNestedLoopJoin where not intended
- row-at-a-time Python UDF (BatchEvalPython) outside the declared UDF
  parity query
- parquet scans with no pushed filters on filtered queries
- global Sort without a Limit (full-sort antipattern) where avoidable

Usage: python tools/plan_audit.py [sf_dir]
Exit 1 if any unexpected red flag appears. This is the enforcement arm
of the README's "declarative first" rule.
"""

from __future__ import annotations

import sys

#: Queries allowed to contain the given fragment.
ALLOW = {
    "BatchEvalPython": {
        "q29_udf_parity",  # the declared row-UDF parity query
        "q54_python_udtf",  # UDTFs evaluate in Python by definition
        # q40f was allowlisted here through r04; its top-terms UDF is now
        # a relational broadcast-join + window (VERDICT r04 #5)
    },
    "CartesianProduct": {
        "q41_ann_topk",  # 5-row broadcast side, intended
        "q167_ann_recall",  # contains q41's subtree (the exact certifier)
        "q296_hamming_ann",  # 5-row packed-query broadcast sweep, intended
    },
    "BroadcastNestedLoopJoin": {
        "q41_ann_topk",
        "q46_scalar_subquery",
        "q41d_ann_ivf",  # query x centroid table: nlist x dim broadcast, intended
        "q110_unigram_logprob",  # 1-row corpus-total broadcast, intended
        # crossJoin(broadcast(<bounded-tiny frame>)) — the scalar/global-
        # stats distribution pattern; the loop side is 1 row (aggregate
        # totals) or vocabulary/query-k sized, never data-sized:
        "q119_zorder_layout",  # 1-row global min/max bounds
        "q120_bloom_semi_join",  # 1-row packed bloom bit words
        "q41e_ann_ivf_medoid",  # query x medoid table (nlist rows)
        "q132_bm25_retrieval",  # 1-row corpus stats (N, avgdl)
        "q136_hybrid_rrf",  # 1-row corpus stats via the BM25 subtree
        "q155_sliding_distinct",  # calendar-sized broadcast range join
        "q138_bigram_logprob",  # 1-row vocab totals
        "q139_triangle_count",  # three 1-row census aggregates
        "q146_split_drift",  # 1-row split totals
        "q148_contingency_chi2",  # 1-row n/n_lang/n_src totals
        "q149_welch_ttest",  # 2 one-row group-moment frames
        "q167_ann_recall",  # q41's 5-row query-side broadcast subtree
        "q181_quantized_ann_recall",  # same: q41 exact-truth subtree
        "q180_forget_cascade",  # 1-row purge-agg x 1-row total-agg per table
        "q195_tpch_q22",  # TPC-H Q22's 1-row global-average broadcast
        # round 4
        "q212_ivf_recall",  # q41 exact-truth + q41d centroid subtrees
        "q224_ivfpq_ann",  # query x 16-row medoid/codebook broadcasts
        "q229_filtered_ann",  # pre-filter exact side: 5-row query broadcast
        "q226_zone_map_pruning",  # 1-row max-orderkey broadcast
        "q223_temperature_balance",  # 1-row weight-total broadcast
        "q227_jackknife_se",  # 1-row totals + 1-row jackknife-mean broadcasts
        "q245_semantic_decontam",  # 20-row eval-set broadcast (the q91 shape)
        "q238_bloom_file_pruning",  # 1-row maxima + 15-row probe broadcasts
        "q234_representation_audit",  # 1-row corpus-totals broadcast
        "q246_worst_window_logprob",  # 1-row vocab-total broadcast (q110 shape)
        "q251_retrieval_eval",  # BM25 subtree's 1-row corpus-stats broadcast
        "q253_hard_negatives",  # same BM25 subtree
        "q250_auc_calibration",  # 1-row rank-sum aggregate broadcast
        "q255_quantile_normalization",  # 1-row max-rank broadcast
        "q260_dedup_savings",  # 1-row corpus-summary broadcast
        # round 5
        "q285_tpch_q11",  # Q11's 1-row total-stock-value scalar threshold
        "q292_k_anonymity",  # fixed k-threshold list (len(_KANON_KS) rows)
        "q295_matryoshka_recall",  # fixed dims list + q41's 5-row query broadcast
        "q296_hamming_ann",  # 5-row packed-query broadcast (q41's shape)
        "q300_sharded_topk_bounds",  # 1-row total-threshold broadcast
        "q301_ks_test",  # 1-row group-total broadcast (n1, n2)
        "q302_markov_stationary",  # 1-row state-count broadcast (uniform v0)
        "q304_grid_range_agg",  # fixed 3-rect list x tile-grid classification
    },
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from nfl_predictions_spark.session import get_spark

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    skip = {
        # streaming entries execute queries, not single plans; ML trains
        "q31_stream_tumbling",
        "q32_stream_sliding",
        "q33_stream_session",
        "q34_stream_watermark",
        "q35_stream_dedup",
        "q36_stream_score_route",
        "q37_ml_best_play",
        "q43_multimodal_features",
    }
    failures = []
    for name, fn in entrymod.queries().items():
        if name in skip:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover
            failures.append(f"{name}: plan build failed: {e}")
            continue
        for frag, allowed in ALLOW.items():
            if frag in plan and name not in allowed:
                failures.append(f"{name}: unexpected {frag}")
        print(f"audited {name}")

    if failures:
        print("\nRED FLAGS:")
        for f in failures:
            print(" -", f)
        sys.exit(1)
    print("\nplan audit clean")


if __name__ == "__main__":
    main()
