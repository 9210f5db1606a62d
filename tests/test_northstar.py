"""North-star operator tests: dedup recall, ANN variant agreement and
LSH recall, multimodal plumbing determinism (the oracle-checkable
entries are covered by test_relational's parametrized comparison)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def test_minhash_equals_exact_pairs(spark):
    """LSH+verify must reproduce the exact near-dup pair set here (the
    planted dups sit at Jaccard >= 0.9 where band-miss p ~ 3e-8)."""
    from nfl_predictions_spark.operators.dedup import (
        q39_minhash_lsh_pairs,
        q39b_ngram_jaccard_pairs,
    )

    lsh = {(r.d1, r.d2) for r in q39_minhash_lsh_pairs(spark, SF_SMOKE).collect()}
    exact = {(r.d1, r.d2) for r in q39b_ngram_jaccard_pairs(spark, SF_SMOKE).collect()}
    assert lsh == exact and len(exact) > 0


def test_simhash_finds_planted_near_dups(spark):
    """Most near-identical documents (Jaccard >= 0.95) land within the
    simhash near-dup threshold. Not all: simhash bit sums are high
    variance for docs with few shingles, so a short planted pair can
    land far apart — recall, not containment, is the honest claim."""
    from nfl_predictions_spark.operators.dedup import (
        q39b_ngram_jaccard_pairs,
        q39c_simhash_pairs,
    )

    strong = {
        (r.d1, r.d2)
        for r in q39b_ngram_jaccard_pairs(spark, SF_SMOKE).collect()
        if r.jac >= 0.95
    }
    sim = {(r.d1, r.d2) for r in q39c_simhash_pairs(spark, SF_SMOKE).collect()}
    recall = len(strong & sim) / len(strong)
    assert strong and recall >= 0.8, f"simhash recall {recall:.2f}"


def test_ann_pandas_matches_exact(spark):
    from nfl_predictions_spark.operators.similarity import (
        q41_ann_topk,
        q41b_ann_topk_pandas,
    )

    exact = [(r.qid, r.cid, r.rn) for r in q41_ann_topk(spark, SF_SMOKE).collect()]
    fast = [(r.qid, r.cid, r.rn) for r in q41b_ann_topk_pandas(spark, SF_SMOKE).collect()]
    assert exact == fast


def test_ann_lsh_recall(spark):
    """Bucketed ANN must recover a solid fraction of the true top-10
    (8 tables x 6 hyperplanes on random data: recall well above a
    single-bucket baseline; rank-1 self-match always survives)."""
    from nfl_predictions_spark.operators.similarity import q41_ann_topk, q41c_ann_lsh

    exact = {(r.qid, r.cid) for r in q41_ann_topk(spark, SF_SMOKE).collect()}
    approx = {(r.qid, r.cid) for r in q41c_ann_lsh(spark, SF_SMOKE).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"LSH recall {recall:.2f}"
    for qid in {q for q, _ in exact}:
        assert (qid, qid) in approx  # identical vector shares every bucket


def test_multimodal_features_deterministic(spark):
    from nfl_predictions_spark.operators.multimodal import (
        extract_features,
        synthetic_media,
    )

    a = sorted(map(tuple, extract_features(synthetic_media(spark, 100)).collect()))
    b = sorted(map(tuple, extract_features(synthetic_media(spark, 100)).collect()))
    assert a == b
    assert all(r[2] > 0 for r in a)  # n_bytes positive
    assert all(len(r[7]) == 16 for r in a)  # head16 batch shape


def test_multimodal_frame_sampling(spark):
    from pyspark.sql import functions as F

    from nfl_predictions_spark.operators.multimodal import sample_frames, synthetic_media

    media = synthetic_media(spark, 100)
    frames = sample_frames(media)
    assert frames.filter(F.col("frame_len") > 16).count() == 0
    n_videos = media.filter(F.col("media_type") == "video").count()
    assert frames.select("asset_id").distinct().count() == n_videos


def test_decode_stub_raises(spark):
    from nfl_predictions_spark.operators.multimodal import decode_media_real

    with pytest.raises(NotImplementedError):
        decode_media_real(b"\x00\x01", "image")


def test_mllib_minhash_matches_exact(spark):
    from nfl_predictions_spark.operators.dedup import q39b_ngram_jaccard_pairs
    from nfl_predictions_spark.operators.ml_text import q39d_mllib_minhash

    mllib = {(r.d1, r.d2, r.jac) for r in q39d_mllib_minhash(spark, SF_SMOKE).collect()}
    exact = {(r.d1, r.d2, r.jac) for r in q39b_ngram_jaccard_pairs(spark, SF_SMOKE).collect()}
    assert mllib == exact


def test_tfidf_deterministic_in_session(spark):
    from nfl_predictions_spark.operators.ml_text import q40f_tfidf_top_terms

    a = q40f_tfidf_top_terms(spark, SF_SMOKE).collect()
    b = q40f_tfidf_top_terms(spark, SF_SMOKE).collect()
    assert a == b and len(a) > 0


def test_inlined_stopwords_match_mllib_loader(spark):
    """q40f's DuckDB oracle carries _EN_STOPWORDS inline (a static SQL
    string can't call the MLlib loader); if a Spark upgrade ever changes
    loadDefaultStopWords('english'), this catches the drift before the
    oracle silently diverges from StopWordsRemover's behavior."""
    from pyspark.ml.feature import StopWordsRemover

    from nfl_predictions_spark.operators.ml_text import _EN_STOPWORDS

    assert list(_EN_STOPWORDS) == StopWordsRemover.loadDefaultStopWords("english")


def test_ann_ivf_recall(spark):
    """IVF with nprobe/nlist = 4/16 must beat the cell-fraction baseline
    decisively and always find the query's own vector (a query probes
    its home cell first)."""
    from nfl_predictions_spark.operators.similarity import q41_ann_topk, q41d_ann_ivf

    exact = {(r.qid, r.cid) for r in q41_ann_topk(spark, SF_SMOKE).collect()}
    approx = {(r.qid, r.cid) for r in q41d_ann_ivf(spark, SF_SMOKE).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall {recall:.2f}"
    for qid in {q for q, _ in exact}:
        assert (qid, qid) in approx


def test_chunking_overlap_and_coverage(spark):
    """Chunks tile each document: chunk 0 starts at token 0, successive
    chunks start STEP tokens later sharing OVERLAP tokens, every token
    lands in some chunk, and only the final chunk may be short."""
    from nfl_predictions_spark.operators.text import (
        _CHUNK_SIZE,
        _CHUNK_STEP,
        q90_chunk_documents,
    )
    from nfl_predictions_spark.sources.tables import table

    chunks = q90_chunk_documents(spark, SF_SMOKE).collect()
    docs = {
        r.doc_id: r.text.split()
        for r in table(spark, SF_SMOKE, "documents").collect()
    }
    import hashlib

    by_doc = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    assert set(by_doc) == set(docs)
    for doc_id, cs in by_doc.items():
        toks = docs[doc_id]
        cs.sort(key=lambda c: c.chunk_id)
        for c in cs:
            start = c.chunk_id * _CHUNK_STEP
            expect = toks[start : start + _CHUNK_SIZE]
            assert c.n_tokens == len(expect)
            md5 = hashlib.md5(" ".join(expect).encode()).hexdigest()
            assert c.chunk_md5 == md5
        last = cs[-1]
        assert last.chunk_id * _CHUNK_STEP + last.n_tokens == len(toks)
        for c in cs[:-1]:
            assert c.n_tokens == _CHUNK_SIZE


def test_embedding_near_dup_salt_split_matches_unsalted(spark):
    """One oversized label forced through the salt-split path (tiny
    block_cap) must produce exactly the same pair set as the single
    per-label block - every pair exactly once, none lost at the salt
    boundaries."""
    import numpy as np
    from pyspark.sql import functions as F

    from nfl_predictions_spark.operators.similarity import embedding_near_dup

    rng = np.random.RandomState(7)
    n, dim = 200, 16
    base = rng.randn(8, dim)
    rows = []
    for i in range(n):
        v = base[i % 8] + 0.05 * rng.randn(dim)  # clustered -> many pairs
        rows.append((i, "hot", [float(x) for x in v]))
    rows.append((n, "cold", [float(x) for x in rng.randn(dim)]))
    emb = spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")

    plain = embedding_near_dup(emb, block_cap=10_000).orderBy("d1", "d2")
    salted = embedding_near_dup(emb, block_cap=16).orderBy("d1", "d2")
    a = [(r.d1, r.d2, r.cos) for r in plain.collect()]
    b = [(r.d1, r.d2, r.cos) for r in salted.collect()]
    assert len(a) > 100  # the cluster actually generates pairs
    assert a == b


def test_png_roundtrip_exact():
    """decode(encode(img)) must reproduce every pixel byte, and a
    corrupted chunk must fail CRC verification."""
    import numpy as np
    import pytest as _pytest

    from nfl_predictions_spark.operators.multimodal import png_decode, png_encode

    rng = np.random.RandomState(3)
    for h, w in [(1, 1), (8, 8), (5, 13)]:
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(png_decode(png_encode(img)), img)
    data = bytearray(png_encode(rng.randint(0, 256, (4, 4, 3), dtype=np.uint8)))
    data[40] ^= 0xFF  # flip a byte inside a chunk
    with _pytest.raises(ValueError):
        png_decode(bytes(data))


def test_wav_roundtrip_exact():
    import numpy as np

    from nfl_predictions_spark.operators.multimodal import wav_decode, wav_encode

    rng = np.random.RandomState(5)
    s = rng.randint(-32768, 32768, size=777, dtype=np.int16)
    assert np.array_equal(wav_decode(wav_encode(s)), s)


def test_y4m_roundtrip_exact():
    import numpy as np

    from nfl_predictions_spark.operators.multimodal import y4m_decode, y4m_encode

    rng = np.random.RandomState(9)
    frames = rng.randint(0, 256, size=(5, 6, 4), dtype=np.uint8)
    assert np.array_equal(y4m_decode(y4m_encode(frames)), frames)


def test_prefix_filter_equals_exact_pairs(spark):
    """Prefix filtering is an EXACT algorithm — the pair set (and the
    jaccard values) must equal the inverted-index baseline's, by the
    prefix-filter theorem, not by luck."""
    from nfl_predictions_spark.operators.dedup import (
        q39b_ngram_jaccard_pairs,
        q135_prefix_filter_jaccard,
    )

    pf = {(r.d1, r.d2, r.jac) for r in q135_prefix_filter_jaccard(spark, SF_SMOKE).collect()}
    exact = {(r.d1, r.d2, r.jac) for r in q39b_ngram_jaccard_pairs(spark, SF_SMOKE).collect()}
    assert pf == exact and len(exact) > 0


def test_hybrid_rrf_fuses_both_systems(spark):
    """RRF output: top-10 per query, rrf strictly descending in rank
    order (after rounding), and any doc ranked #1 by BOTH systems must
    be the fused #1 (RRF dominance)."""
    from nfl_predictions_spark.operators.text import (
        q132_bm25_retrieval,
        q136_hybrid_rrf,
    )

    fused = q136_hybrid_rrf(spark, SF_SMOKE).collect()
    by_q: dict = {}
    for r in fused:
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for rows in by_q.values():
        assert [r.rn for r in rows] == list(range(1, len(rows) + 1))
        assert all(a.rrf >= b.rrf for a, b in zip(rows, rows[1:]))
    bm_top = {
        (r.qid, r.doc_id) for r in q132_bm25_retrieval(spark, SF_SMOKE).collect() if r.rn == 1
    }
    for qid, doc in bm_top:
        # if the same doc also tops the dense list it must top the fusion
        dense_first = [r for r in by_q[qid] if r.rn == 1][0]
        if dense_first.doc_id == doc:
            assert dense_first.rn == 1


def test_grouped_ols_matches_numpy_fit(spark):
    """The closed-form aggregate fit must agree with numpy's least
    squares on the same rows (slope/intercept to 1e-4, r2 in [0,1])."""
    import numpy as np

    from nfl_predictions_spark.operators.extended import q137_grouped_ols
    from nfl_predictions_spark.sources.tables import table

    rows = q137_grouped_ols(spark, SF_SMOKE).collect()
    assert len(rows) == 3
    li = (
        table(spark, SF_SMOKE, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    )
    for r in rows:
        assert 0.0 <= r.r2 <= 1.0 and r.n > 0
        x = np.array([t.l_quantity for t in li if t.l_returnflag == r.l_returnflag])
        y = np.array([t.l_extendedprice for t in li if t.l_returnflag == r.l_returnflag])
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(r.slope - slope) < 1e-4, (r.l_returnflag, r.slope, slope)
        assert abs(r.intercept - intercept) < 1e-2 * max(1, abs(intercept))


def test_ivf_medoid_recall_and_self_hit(spark):
    """Medoid-quantized IVF: decisively better than the 4/16
    cell-fraction baseline, and every query finds its own vector (it
    probes its home cell first)."""
    from nfl_predictions_spark.operators.similarity import (
        q41_ann_topk,
        q41e_ann_ivf_medoid,
    )

    exact = {(r.qid, r.cid) for r in q41_ann_topk(spark, SF_SMOKE).collect()}
    approx = {(r.qid, r.cid) for r in q41e_ann_ivf_medoid(spark, SF_SMOKE).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"medoid IVF recall {recall:.2f}"
    for qid in {q for q, _ in exact}:
        assert (qid, qid) in approx


def test_triangle_count_matches_python_enumeration(spark):
    """Triangle/wedge counts must equal a brute-force enumeration of
    the same edge set."""
    from itertools import combinations

    from nfl_predictions_spark.operators.dedup import q39b_ngram_jaccard_pairs
    from nfl_predictions_spark.operators.graph import q139_triangle_count

    edges = {(r.d1, r.d2) for r in q39b_ngram_jaccard_pairs(spark, SF_SMOKE).collect()}
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if a < b < c
    )
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    row = q139_triangle_count(spark, SF_SMOKE).collect()[0]
    assert row.n_edges == len(edges)
    assert row.n_triangles == tri
    assert row.n_wedges == wedges


def test_bigram_logprob_matches_python_model(spark):
    """The distributed bigram model must reproduce an in-memory add-one
    bigram LM computed from the same documents."""
    import math

    from nfl_predictions_spark.operators.llmprep import q138_bigram_logprob
    from nfl_predictions_spark.sources.tables import table

    docs = {
        r.doc_id: r.text.split(" ")
        for r in table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    }
    c12: dict = {}
    c1: dict = {}
    vocab = set()
    for ts in docs.values():
        vocab.update(ts)
        for w1, w2 in zip(ts, ts[1:]):
            c12[(w1, w2)] = c12.get((w1, w2), 0) + 1
            c1[w1] = c1.get(w1, 0) + 1
    v = len(vocab)
    means = {}
    for d, ts in docs.items():
        lps = [
            math.log((c12[(w1, w2)] + 1.0) / (c1[w1] + v))
            for w1, w2 in zip(ts, ts[1:])
        ]
        if lps:
            means[d] = sum(lps) / len(lps)
    top = sorted(means.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = q138_bigram_logprob(spark, SF_SMOKE).collect()
    assert [r.doc_id for r in got] == [d for d, _ in top]
    for r, (_, m) in zip(got, top):
        assert abs(r.mean_bigram_lp - m) < 1e-5


def test_frequent_pairs_apriori_sound(spark):
    """Every reported pair's support clears min-sup, both members are
    individually frequent (downward closure), and the top pair matches a
    brute-force Python count."""
    from nfl_predictions_spark.operators.text import (
        _PAIR_MINSUP,
        q151_frequent_pairs,
    )
    from tests.conftest import SF_SMOKE
    from collections import Counter
    from itertools import combinations

    rows = q151_frequent_pairs(spark, SF_SMOKE).collect()
    assert rows
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    n_docs = len(docs)
    sets = [set(d.text.split(" ")) for d in docs]
    df = Counter(t for s in sets for t in s)
    pair_df = Counter(
        p for s in sets for p in combinations(sorted(s), 2)
    )
    minsup = n_docs * _PAIR_MINSUP
    for r in rows:
        assert r.pair_docs >= minsup
        assert df[r.t1] >= minsup and df[r.t2] >= minsup
        assert pair_df[(r.t1, r.t2)] == r.pair_docs
    assert rows[0].pair_docs == max(pair_df.values())


def test_image_resize_nearest_neighbor_exact(spark):
    """The resized channel means equal the closed-form pixel function
    sampled on the strided grid — one misplaced sample would diverge."""
    from nfl_predictions_spark.operators.multimodal import (
        _IMG_H,
        _IMG_W,
        _RESIZE_STRIDE,
        q154_image_resize_stats,
    )

    rows = q154_image_resize_stats(spark, SF_SMOKE).limit(5).collect()
    s = _RESIZE_STRIDE
    for r in rows:
        assert (r.out_w, r.out_h) == (_IMG_W // s, _IMG_H // s)
        pix = [
            (r.img_id * 31 + x * 7 + y * 13) % 256
            for x in range(0, _IMG_W, s)
            for y in range(0, _IMG_H, s)
        ]
        assert abs(r.r_mean - sum(pix) / len(pix)) < 1e-6


def test_kmeans_lloyd_matches_python_trajectory(spark):
    """q165 walks the same centroid trajectory as a direct Python Lloyd
    implementation under the shared determinism contract (first-k init,
    exact-distance argmin with id tie-break, round-6 centroid update)."""
    import numpy as np

    from nfl_predictions_spark.operators.similarity import (
        _KM_ITERS,
        _KM_K,
        q165_kmeans_lloyd,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").orderBy("vec_id").collect()
    X = np.array([r.embedding for r in emb], dtype=np.float64)
    cent = X[:_KM_K].copy()
    for _ in range(_KM_ITERS):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)  # numpy argmin takes first min = smallest id
        cent = np.array(
            [np.round(X[a == c].sum(axis=0) / (a == c).sum(), 6) for c in range(_KM_K)]
        )
    sizes = np.bincount(a, minlength=_KM_K)

    rows = q165_kmeans_lloyd(spark, SF_SMOKE).collect()
    assert len(rows) == _KM_K * X.shape[1]
    for r in rows:
        assert abs(r.coord - cent[r.cluster, r.i]) < 1e-6, (r.cluster, r.i)
        assert r.n_members == sizes[r.cluster]


def test_kmeans_arrow_path_matches_exact_trajectory(spark):
    """q165b (numpy assignment + per-partition sum accumulation) walks
    the identical quantized centroid trajectory and reports the same
    final-update membership as the decimal-exact q165."""
    from nfl_predictions_spark.operators.similarity import (
        q165_kmeans_lloyd,
        q165b_kmeans_arrow,
    )

    a = {(r.cluster, r.i): (r.coord, r.n_members)
         for r in q165_kmeans_lloyd(spark, SF_SMOKE).collect()}
    b = {(r.cluster, r.i): (r.coord, r.n_members)
         for r in q165b_kmeans_arrow(spark, SF_SMOKE).collect()}
    assert a == b


def test_ivf_recall_certified(spark):
    """q41d (KMeans IVF) has no SQL oracle; this is its certification
    (VERDICT r03 #4): recall@10 vs the exact q41 truth through the
    shared q212 harness must clear the same floor class as the LSH and
    quantized indexes."""
    from nfl_predictions_spark.operators.similarity import q212_ivf_recall

    rows = q212_ivf_recall(spark, SF_SMOKE).collect()
    recalls = [r["recall"] for r in rows]
    assert len(recalls) == 5
    assert min(recalls) >= 0.5
    assert sum(recalls) / len(recalls) >= 0.7


def test_pq_recall_certified(spark):
    """PQ+rerank recall@10 vs exact truth: the 2-byte-code index with a
    50-candidate exact rerank must keep most of the true top-10."""
    from nfl_predictions_spark.operators.similarity import (
        q41_ann_topk,
        q219_pq_ann,
        recall_vs_exact,
    )

    rows = recall_vs_exact(
        q41_ann_topk(spark, SF_SMOKE), q219_pq_ann(spark, SF_SMOKE)
    ).collect()
    recalls = [r["recall"] for r in rows]
    assert len(recalls) == 5
    assert min(recalls) >= 0.4
    assert sum(recalls) / len(recalls) >= 0.6


def test_ivfpq_recall_certified(spark):
    """Composed IVF+PQ index: probing 4/16 cells over 2-byte codes with
    exact rerank still keeps a usable share of the true top-10."""
    from nfl_predictions_spark.operators.similarity import (
        q41_ann_topk,
        q224_ivfpq_ann,
        recall_vs_exact,
    )

    rows = recall_vs_exact(
        q41_ann_topk(spark, SF_SMOKE), q224_ivfpq_ann(spark, SF_SMOKE)
    ).collect()
    recalls = [r["recall"] for r in rows]
    assert len(recalls) == 5
    assert min(recalls) >= 0.3
    assert sum(recalls) / len(recalls) >= 0.5


def test_record_linkage_weights_and_scores(spark):
    """Fellegi-Sunter sanity: every agreement weight is positive and
    every disagreement weight negative (m=0.9 exceeds all random-pair
    agreement rates on these fields); each emitted score must equal the
    decimal sum of the weights its pattern implies; and the candidate
    join must be nation-blocked (equi-join, never a cross product)."""
    from decimal import Decimal

    from tests.conftest import SF_SMOKE

    from nfl_predictions_spark.operators.dedup import (
        _FS_FIELDS,
        _fs_weights,
        q267_record_linkage,
    )

    w = _fs_weights(spark, SF_SMOKE)
    for k in _FS_FIELDS:
        wa, wd = w[k]
        assert wa > 0 > wd, (k, wa, wd)
    df = q267_record_linkage(spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) == 20
    keys = list(_FS_FIELDS)
    q6 = Decimal("0.000001")
    for r in rows:
        expect = sum(
            Decimal(repr(w[k][0] if p == "A" else w[k][1])).quantize(q6)
            for k, p in zip(keys, r.pattern)
        )
        assert Decimal(repr(r.score)).quantize(q6) == expect, (r, expect)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_mmr_rerank_greedy_invariants(spark):
    """Picks are distinct per query, step 1 is the pure-relevance
    argmax of the shortlist, and every later step's score is <= the
    lambda-scaled relevance bound (the diversity penalty only ever
    subtracts)."""
    from nfl_predictions_spark.operators.similarity import (
        _MMR_K,
        _MMR_LAMBDA,
        q273_mmr_rerank,
        q41_ann_topk,
    )

    rows = q273_mmr_rerank(spark, SF_SMOKE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    top1 = {
        r.qid: r.cid for r in q41_ann_topk(spark, SF_SMOKE).collect() if r.rn == 1
    }
    for qid, picks in by_q.items():
        assert [p.step for p in sorted(picks, key=lambda p: p.step)] == list(
            range(1, _MMR_K + 1)
        )
        assert len({p.cid for p in picks}) == _MMR_K
        first = min(picks, key=lambda p: p.step)
        assert first.cid == top1[qid]  # step 1 == pure relevance argmax
        bound = max(p.score for p in picks if p.step == 1)
        assert all(p.score <= bound + 1e-9 for p in picks)


def test_semdedup_census_counts_consistent(spark):
    """Cells partition the corpus (n_vecs sums to the table size),
    kept + dup = total per cell, and at least one vector per occupied
    cell survives (the most-central member can never be dominated)."""
    from nfl_predictions_spark.operators.similarity import q274_semdedup
    from nfl_predictions_spark.sources.tables import table

    rows = q274_semdedup(spark, SF_SMOKE).collect()
    total = table(spark, SF_SMOKE, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == total
    for r in rows:
        assert r.n_kept + r.n_dup == r.n_vecs
        assert r.n_kept >= 1


def test_matryoshka_recall_monotone_in_dimension(spark):
    """More prefix dimensions never hurt MEAN recall on the fixtures
    (pinned empirically at both sweep scales), and every (d, qid) cell
    is a valid recall fraction of the top-k."""
    from nfl_predictions_spark.operators.similarity import (
        _MRL_DIMS,
        _N_QUERIES,
        _TOP_K,
        q295_matryoshka_recall,
    )

    rows = q295_matryoshka_recall(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == len(_MRL_DIMS) * _N_QUERIES
    means = {}
    for d in _MRL_DIMS:
        recs = [r.recall for r in rows if r.d == d]
        assert len(recs) == _N_QUERIES
        means[d] = sum(recs) / len(recs)
    for r in rows:
        assert 0 <= r.hits <= _TOP_K
        assert abs(r.recall - r.hits / _TOP_K) < 1e-12
    assert means[8] <= means[16] <= means[32]


def test_hamming_ann_contract(spark):
    """q296: self-match is exact (ham=0, cos=1, rank 1), Hamming stays
    within the 64-bit budget, the emitted schema matches the two-phase
    contract, and the binary shortlist keeps a usable fraction of the
    exact top-k (floor pinned empirically at both sweep scales)."""
    from nfl_predictions_spark.operators.similarity import (
        _N_QUERIES,
        _TOP_K,
        q41_ann_topk,
        q296_hamming_ann,
    )

    rows = q296_hamming_ann(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == _N_QUERIES * _TOP_K
    for r in rows:
        assert 0 <= r.ham <= 64
        assert -1.0 <= r.cos <= 1.0
    firsts = {r.qid: r for r in rows if r.rn == 1}
    for qid, r in firsts.items():
        assert r.cid == qid and r.ham == 0 and r.cos == 1.0
    ham = {(r.qid, r.cid) for r in rows}
    exact = {
        (r.qid, r.cid)
        for r in q41_ann_topk(spark, "/root/testdata/sf0.001").collect()
    }
    assert len(ham & exact) / len(exact) >= 0.4
