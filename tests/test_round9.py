"""Round-9 additions: q333 base-absorb/re-dedup (manifest compaction),
the q331 tiny-fixture decile fix, and plan-shape pins for the new
entries (VERDICT r08 #6/#8, ADVICE r08 #1)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_q333_absorb_idempotent(spark):
    """After the base absorbs the pass-1 survivors, EVERY batch doc must
    drop on the second pass (its surviving twin is in base'), so a
    further absorb would add nothing — the idempotence contract of the
    production dedup loop."""
    from nfl_predictions_spark.operators.dedup import (
        _INC_OFF,
        q333_absorb_rededup,
    )

    rows = q333_absorb_rededup(spark, SF_SMOKE).collect()
    assert rows, "q333 returned no rows"
    # idempotence: zero keeps remain after absorb
    assert all(r.action2 != "keep" for r in rows)
    # every pass-1 survivor is now an exact dup of an ABSORBED doc
    # (match in the batch id space), and the canonical survivor of each
    # text group matches itself
    kept = [r for r in rows if r.action1 == "keep"]
    assert kept, "fixture produced no pass-1 survivors"
    for r in kept:
        assert r.action2 == "drop_exact"
        assert r.match_id2 >= _INC_OFF
        assert r.match_id2 <= r.batch_id
    assert any(r.match_id2 == r.batch_id for r in kept)
    # pass-1 drops are untouched by the absorb: exact matches still
    # resolve to the ORIGINAL base doc (absorbed ids are all larger)
    for r in rows:
        if r.action1 == "drop_exact":
            assert r.action2 == "drop_exact" and r.match_id2 < _INC_OFF


def test_q333_pass1_matches_q327(spark):
    """q333's pass-1 verdict column must be exactly q327's actions —
    same machinery driven off the staged index instead of inline
    relations."""
    from nfl_predictions_spark.operators.dedup import (
        q327_incremental_dedup,
        q333_absorb_rededup,
    )

    got = {
        r.batch_id: r.action1
        for r in q333_absorb_rededup(spark, SF_SMOKE).collect()
    }
    want = {
        r.batch_id: r.action
        for r in q327_incremental_dedup(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_q333_delta_components_are_survivor_sized(spark):
    """The absorb stages DELTA components only: the survivor digest
    table must hold exactly the deduped pass-1 keeps (O(survivors)),
    and every delta component must cover the same id set — the
    'updated incrementally, not rebuilt' claim made structural."""
    from nfl_predictions_spark.operators.dedup import (
        base_index,
        q333_absorb_rededup,
    )

    rows = q333_absorb_rededup(spark, SF_SMOKE).collect()
    survivors = {
        r.match_id2 for r in rows if r.action1 == "keep"
    }  # canonical absorbed ids
    idx = base_index(spark, SF_SMOKE)
    kdig = idx["comp"]("kdig", None)
    assert {r.doc_id for r in kdig.select("doc_id").collect()} == survivors
    for kind in ("kex", "ksz", "kpd"):
        ids = {
            r.doc_id
            for r in idx["comp"](kind, None).select("doc_id").distinct().collect()
        }
        assert ids == survivors, kind
    # delta is disjoint from the base id space
    base_ids = {r.doc_id for r in idx["bdig"].select("doc_id").collect()}
    assert not (survivors & base_ids)


def test_q331_duplicate_targets_emit_all_deciles(spark, tmp_path):
    """ADVICE r08 #1: with fewer docs than deciles, several checkpoint
    targets collide — one output row per k must still appear (the
    oracle's chunkmap emits duplicates), not last-writer-wins."""
    import shutil

    from nfl_predictions_spark.operators.text import _VG_STEPS, q331_vocab_growth

    tiny = tmp_path / "tinysf"
    tiny.mkdir()
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "b c d e f"), (3, "c d e f g")],
        "doc_id long, text string",
    )
    docs.coalesce(1).write.parquet(str(tiny / "documents.parquet"))
    try:
        rows = q331_vocab_growth(spark, str(tiny)).collect()
        assert [r.k for r in rows] == list(range(1, _VG_STEPS + 1))
        # duplicate-target ks share the checkpoint doc's cumulative stats
        by_k = {r.k: r for r in rows}
        assert by_k[1].n_docs == 1 and by_k[_VG_STEPS].n_docs == 3
        # ceil(3k/10): k=1..3 -> doc 1, k=4..6 -> doc 2, k=7..10 -> doc 3
        for k in range(1, _VG_STEPS + 1):
            assert by_k[k].n_docs == -(-3 * k // _VG_STEPS)
    finally:
        shutil.rmtree(tiny, ignore_errors=True)


def test_q336_compaction_verdict_invariant(spark):
    """Re-ranking the absorbed index under refreshed document
    frequencies must not change a single verdict vs q333's
    frozen-order pass 2 — the correctness claim that makes deferred
    compaction safe in production."""
    from nfl_predictions_spark.operators.dedup import (
        q333_absorb_rededup,
        q336_compacted_rededup,
    )

    got = {
        r.batch_id: (r.action, r.match_id, r.jac)
        for r in q336_compacted_rededup(spark, SF_SMOKE).collect()
    }
    want = {
        r.batch_id: (r.action2, r.match_id2, r.jac2)
        for r in q333_absorb_rededup(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_q335_stream_equals_batch_q334(spark):
    """The streamed sequential absorb must produce EXACTLY q334's
    verdicts: both drive the same AbsorbState.absorb step, one chunk
    per micro-batch, so the carried index state evolves identically."""
    from nfl_predictions_spark.operators.dedup import q334_multigen_absorb
    from nfl_predictions_spark.operators.streaming_batch import (
        q335_stream_absorb_ingest,
    )

    got = {
        r.batch_id: (r.gen, r.action, r.match_id, r.jac)
        for r in q335_stream_absorb_ingest(spark, SF_SMOKE).collect()
    }
    want = {
        r.batch_id: (r.gen, r.action, r.match_id, r.jac)
        for r in q334_multigen_absorb(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_q334_absorb_discriminates(spark):
    """The fixture must exercise CROSS-GENERATION absorption — at least
    one later-chunk doc dropping against an EARLIER chunk's absorbed
    survivor (match in the batch id space). Without this the
    multi-generation oracle would be indistinguishable from q327."""
    from nfl_predictions_spark.operators.dedup import (
        _INC_OFF,
        q334_multigen_absorb,
    )

    rows = q334_multigen_absorb(spark, SF_SMOKE).collect()
    cross = [r for r in rows if r.match_id >= _INC_OFF]
    assert cross, "no cross-generation matches — fixture too weak"
    for r in cross:
        # an absorbed survivor is always from a STRICTLY earlier or
        # same chunk, and absorbed ids precede the matching doc
        assert r.match_id < r.batch_id
    # and plain base matches still dominate
    assert len(cross) < len(rows) / 4


def test_q337_absorb_surfaces_new_vectors(spark):
    """The absorbed batch must actually surface in probe results (some
    top-k hit carries an absorbed id) — otherwise the incremental
    inverted-list update is untested dead weight — while every query
    still returns a full, contiguous top-k."""
    from nfl_predictions_spark.operators.similarity import (
        _ANN_OFF,
        _N_QUERIES,
        _TOP_K,
        q337_ivf_absorb,
    )

    rows = q337_ivf_absorb(spark, SF_SMOKE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    assert len(by_q) == min(_N_QUERIES, len(by_q))
    for qid, rs in by_q.items():
        assert [r.rn for r in sorted(rs, key=lambda r: r.rn)] == list(
            range(1, len(rs) + 1)
        )
        assert len(rs) <= _TOP_K
    absorbed_hits = [r for r in rows if r.cid >= _ANN_OFF]
    assert absorbed_hits, "no absorbed vector ever reached a top-k"


def test_q338_eviction_flips_verdicts(spark):
    """Evicting the tombstone set must flip exactly the verdicts whose
    match was evicted: q327 matches to surviving docs are untouched,
    matches to evicted docs re-resolve (next copy, near, or keep), and
    no q338 verdict ever references an evicted doc."""
    from nfl_predictions_spark.operators.dedup import (
        _EVICT_MOD,
        q327_incremental_dedup,
        q338_evict_rededup,
    )

    before = {
        r.batch_id: r for r in q327_incremental_dedup(spark, SF_SMOKE).collect()
    }
    after = {
        r.batch_id: r for r in q338_evict_rededup(spark, SF_SMOKE).collect()
    }
    assert set(before) == set(after)
    flips = 0
    for bid, b in before.items():
        a = after[bid]
        # no verdict may point at an evicted doc
        assert not (a.match_id >= 0 and a.match_id % _EVICT_MOD == 0)
        if b.match_id >= 0 and b.match_id % _EVICT_MOD == 0:
            flips += 1
            assert (a.action, a.match_id) != (b.action, b.match_id)
        elif b.action == "drop_exact":
            # surviving exact matches are untouched by eviction
            assert (a.action, a.match_id) == (b.action, b.match_id)
    assert flips > 0, "tombstone set hit no matches — fixture too weak"


def test_staged_assign_keys_on_centroid_generation(spark, tmp_path):
    """Regression pin for the cross-scale centroid aliasing bug:
    sf0.001 and sf0.01 share an embedding count and therefore one
    in-place-rebuilt centroid dir, so the staged inverted list MUST
    key on the centroid generation fingerprint — a stale-generation
    assignment must never be served for fresh centroids."""
    from pyspark.sql import functions as F

    from nfl_predictions_spark.operators.similarity import (
        _fitted_centroids_path,
        _served_centroids,
        _staged_base_assign,
    )
    from nfl_predictions_spark.sources.tables import spread, table

    cent_path = _fitted_centroids_path(spark, SF_SMOKE)
    emb = spread(table(spark, SF_SMOKE, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    cent, gen = _served_centroids(spark, cent_path)
    med = cent.select(
        "cell", F.col("c").cast("array<double>").alias("c"), "gen"
    )
    real = _staged_base_assign(spark, SF_SMOKE, emb, med, gen)

    # a "rebuilt" centroid generation: new generation string, shifted
    # centroids — must mint a SEPARATE staged assignment, not serve
    # the previous generation's
    med2 = med.select(
        "cell",
        F.transform("c", lambda x: x + F.lit(10.0)).alias("c"),
        F.lit("deadbeef00").alias("gen"),
    )
    other = _staged_base_assign(spark, SF_SMOKE, emb, med2, "deadbeef00")
    a = {r.vec_id: r.cell for r in real.collect()}
    b = {r.vec_id: r.cell for r in other.collect()}
    assert set(a) == set(b)
    assert a != b, "shifted centroids produced an identical assignment"
    # and the real generation re-reads ITS OWN staged bytes unchanged
    again = _staged_base_assign(spark, SF_SMOKE, emb, med, gen)
    assert {r.vec_id: r.cell for r in again.collect()} == a


def test_round9_plan_shapes(spark):
    """Plan pins for q333 (VERDICT r08 #8 discipline): the steady-state
    run carries only the three declared row_number windows (batch-side
    prefix ranking + one best-match pick per pass) and no nested-loop
    or cartesian joins anywhere."""
    import __spark_entry__ as em

    p = (
        em.queries()["q333_absorb_rededup"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"\bWindow\b", p)) <= 3
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p

    from nfl_predictions_spark.operators.dedup import _INC_CHUNKS

    p = (
        em.queries()["q334_multigen_absorb"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # two row_number windows per generation (batch prefix rank + best
    # match); deltas are eagerly checkpointed so nothing re-derives
    assert len(re.findall(r"\bWindow\b", p)) <= 2 * _INC_CHUNKS
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p

    def plan(name):
        return (
            em.queries()[name](spark, SF_SMOKE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    # q336: staged compacted index hides its build window — the probe
    # carries only the batch prefix rank + best-match pick
    p = plan("q336_compacted_rededup")
    assert len(re.findall(r"\bWindow\b", p)) <= 2
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p

    # q337: batch assignment + query probe are the only two broadcast
    # centroid crossjoins (base assignment comes from the staged
    # component); probe rank + final top-k are the only windows
    p = plan("q337_ivf_absorb")
    assert p.count("BroadcastNestedLoopJoin") <= 2
    assert len(re.findall(r"\bWindow\b", p)) <= 2
    assert "CartesianProduct" not in p

    # q338: tombstones apply as broadcast HASH anti-joins — merge-on-
    # read must never degrade to a nested-loop plan
    p = plan("q338_evict_rededup")
    assert len(re.findall(r"\bWindow\b", p)) <= 2
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


#: Oracle-backed entries added AFTER the round-9 window froze; they
#: MUST take the first slots of the round-10 window. Shrink to empty
#: next round — any other name appearing in the ledger's `missing`
#: fails this test (VERDICT r08 #5: conformance completeness becomes a
#: structural CI assertion, not a per-round audit).
POST_WINDOW_ADDITIONS: set[str] = set()  # retired: q333-q339 sit in
# the round-10 window's first post-sentinel slots (test_driver_window)


def test_green_ledger_complete():
    """Every oracle-backed registry entry has a recorded driver-green
    round, sits in the in-flight driver window, or is a declared
    post-window addition queued for the next rotation. Nothing falls
    through the cracks silently."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    from green_ledger import build

    out = build(repo)
    missing = {n for n, v in out["entries"].items() if v == "missing"}
    assert missing <= POST_WINDOW_ADDITIONS, missing
    # the in-flight window only ever contains green-or-pending entries
    import __spark_entry__ as em

    window = list(em.queries())[:50]
    for n in window:
        assert out["entries"][n] != "missing", n


def _ref_multigen_absorb(docs: dict, n_chunks: int, tau: float, off: int):
    """Plain-Python reference for the q334 semantics: derive the
    re-crawl batch (id%3 rules), rank-split into chunks, then per
    generation: exact (md5-equal text, min surviving id), near (best
    DISTINCT-3-gram Jaccard >= tau, jac desc / id asc tie-break),
    keep; absorb keeps minus intra-chunk exact dups (min id wins)."""
    import hashlib

    def grams(text):
        ts = text.split(" ")
        return {
            " ".join(ts[i : i + 3]) for i in range(len(ts) - 2)
        } if len(ts) >= 3 else set()

    def derive(i, text):
        ts = text.split(" ")
        if i % 3 == 0:
            return text
        if i % 3 == 1:
            return " ".join(ts[: max(len(ts) - 2, 0)])
        return " ".join(reversed(ts))

    batch = [(i + off, derive(i, t)) for i, t in sorted(docs.items())]
    n = len(batch)
    chunks = [[] for _ in range(n_chunks)]
    for rank, row in enumerate(batch):
        chunks[rank * n_chunks // n].append(row)

    base = {i: t for i, t in docs.items()}
    out = {}
    for g, chunk in enumerate(chunks):
        bg = {i: grams(t) for i, t in base.items()}
        by_dig = {}
        for i, t in base.items():
            by_dig.setdefault(hashlib.md5(t.encode()).hexdigest(), []).append(i)
        survivors = []
        for bid, text in chunk:
            dg = hashlib.md5(text.encode()).hexdigest()
            if dg in by_dig:
                out[bid] = (g, "drop_exact", min(by_dig[dg]), 1.0)
                continue
            gs = grams(text)
            best = None
            for did in sorted(base):
                inter = len(gs & bg[did])
                if not gs or not bg[did] or not inter:
                    continue
                jac = inter / (len(gs) + len(bg[did]) - inter)
                if jac >= tau and (best is None or jac > best[1] + 1e-12):
                    best = (did, jac)
            if best is not None:
                out[bid] = (g, "drop_near", best[0], round(best[1], 6))
            else:
                out[bid] = (g, "keep", -1, 0.0)
                survivors.append((bid, text))
        absorbed = {}
        for bid, text in survivors:  # intra-chunk exact dedup, min wins
            dg = hashlib.md5(text.encode()).hexdigest()
            absorbed.setdefault(dg, (bid, text))
        for bid, text in absorbed.values():
            base[bid] = text
    return out


def test_q334_matches_pure_python_reference(spark, tmp_path):
    """The full sequential-absorb loop against a plain-Python oracle on
    an ADVERSARIAL fixture: sub-3-token docs (empty shingle sets),
    identical docs inside one chunk (intra-chunk survivor dedup),
    identical and near-dup docs across chunks (cross-generation exact
    and near matches against absorbed survivors)."""
    import shutil

    from nfl_predictions_spark.operators.dedup import (
        _INC_CHUNKS,
        _INC_OFF,
        _INC_TAU,
        q334_multigen_absorb,
    )

    docs = {
        # id%3==2 -> reversed = genuinely new; ids 2,5 identical source
        # => identical reversed survivors land in DIFFERENT chunks
        2: "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        " lambda mu nu xi omicron pi",
        5: "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        " lambda mu nu xi omicron pi",
        # 8: last-token edit of 2's source (13/15 gram Jaccard after
        # reversal) => its reversal near-matches the absorbed survivor
        # of 2 (cross-generation drop_near)
        8: "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        " lambda mu nu xi omicron rho",
        # 11: reversed palindrome-ish short doc
        11: "x y",
        # id%3==0 -> verbatim exact dups of base
        0: "one two three four five six",
        3: "seven eight nine ten eleven",
        6: "one two three four five six",  # base twin of 0
        9: "tiny",
        # id%3==1 -> truncated near-dups
        1: "red orange yellow green blue indigo violet ultra",
        4: "red orange yellow green blue indigo violet ultra",
        7: "spark flink trino duck presto hive impala drill",
        10: "a b c",
    }
    tiny = tmp_path / "absorbsf"
    tiny.mkdir()
    spark.createDataFrame(
        sorted(docs.items()), "doc_id long, text string"
    ).coalesce(1).write.parquet(str(tiny / "documents.parquet"))
    try:
        got = {
            r.batch_id: (r.gen, r.action, r.match_id, r.jac)
            for r in q334_multigen_absorb(spark, str(tiny)).collect()
        }
        want = _ref_multigen_absorb(docs, _INC_CHUNKS, _INC_TAU, _INC_OFF)
        assert set(got) == set(want)
        for bid in want:
            g, w = got[bid], want[bid]
            assert g[:3] == w[:3], (bid, g, w)
            assert abs(g[3] - w[3]) < 1e-9, (bid, g, w)
        # the fixture must actually exercise the cross-generation paths
        acts = {}
        for bid, (gen, action, mid, _) in want.items():
            acts.setdefault(action, []).append((bid, mid))
        assert any(m >= _INC_OFF for _, m in acts.get("drop_exact", []))
        assert any(m >= _INC_OFF for _, m in acts.get("drop_near", []))
        assert acts.get("keep"), "no survivors at all"
    finally:
        shutil.rmtree(tiny, ignore_errors=True)


def test_q332_epoch_sink_idempotent_layout(spark):
    """ADVICE r08 #3 regression pin: q332's sink is per-epoch overwrite
    partitions (epoch=<id> dirs), so a retried micro-batch replaces its
    own rows — and the discovered partition column never leaks into the
    wire schema."""
    from nfl_predictions_spark.operators.streaming_batch import (
        q332_stream_neardup_ingest,
    )

    out = q332_stream_neardup_ingest(spark, SF_SMOKE)
    assert out.columns == ["chunk", "batch_id", "action", "match_id", "jac"]
