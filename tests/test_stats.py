"""Statistical-test operators (operators/stats.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_chi2_matches_scipy_free_formula(spark):
    """Cross-check the chi-square statistic against a direct Python
    computation on the collected contingency table."""
    from nfl_predictions_spark.operators.stats import q148_contingency_chi2

    r = q148_contingency_chi2(spark, SF_SMOKE).collect()[0]
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    from collections import Counter

    obs = Counter((d.lang, d.source) for d in docs)
    row = Counter(d.lang for d in docs)
    col = Counter(d.source for d in docs)
    n = len(docs)
    chi2 = sum(
        (obs.get((l, s), 0) - row[l] * col[s] / n) ** 2 / (row[l] * col[s] / n)
        for l in row
        for s in col
    )
    assert r.n == n
    assert r.dof == (len(row) - 1) * (len(col) - 1)
    assert abs(r.chi2 - chi2) < 1e-4


def test_welch_t_matches_python(spark):
    from nfl_predictions_spark.operators.stats import q149_welch_ttest

    r = q149_welch_ttest(spark, SF_SMOKE).collect()[0]
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    a = [round(e.value, 6) for e in ev if e.event_type == "purchase"]
    b = [round(e.value, 6) for e in ev if e.event_type == "click"]

    def mv(x):
        m = sum(x) / len(x)
        return m, sum((v - m) ** 2 for v in x) / (len(x) - 1)

    ma, va = mv(a)
    mb, vb = mv(b)
    t = (ma - mb) / math.sqrt(va / len(a) + vb / len(b))
    assert (r.n_a, r.n_b) == (len(a), len(b))
    assert abs(r.t_stat - t) < 1e-3


def test_cusum_drawdown_invariants(spark):
    """Drawdown is non-negative, peak >= final total, and peak equals
    the max prefix sum computed directly in Python for a sample user."""
    from nfl_predictions_spark.operators.stats import q150_cusum_drawdown

    rows = q150_cusum_drawdown(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.max_drawdown >= 0
        assert r.peak_total >= r.final_total - 1e-9
    uid = rows[0].user_id
    ev = sorted(
        (
            e
            for e in spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
            if e.user_id == uid
        ),
        key=lambda e: (e.ts, e.event_id),
    )
    cum, peak, dd = 0.0, -1e18, 0.0
    for e in ev:
        cum += round(e.value, 6)
        peak = max(peak, cum)
        dd = max(dd, peak - cum)
    assert abs(rows[0].peak_total - peak) < 1e-6
    assert abs(rows[0].max_drawdown - dd) < 1e-6
    assert abs(rows[0].final_total - cum) < 1e-6


def test_exact_median_matches_python(spark):
    from nfl_predictions_spark.operators.stats import q152_exact_grouped_median
    import statistics

    rows = q152_exact_grouped_median(spark, SF_SMOKE).collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    by_type = {}
    for e in ev:
        by_type.setdefault(e.event_type, []).append(e.value)
    assert {r.event_type for r in rows} == set(by_type)
    for r in rows:
        assert r.n == len(by_type[r.event_type])
        assert abs(r.median - statistics.median(by_type[r.event_type])) < 1e-6


def test_mad_outliers_match_python(spark):
    from nfl_predictions_spark.operators.stats import q153_mad_outliers
    import statistics

    rows = q153_mad_outliers(spark, SF_SMOKE).collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    by_type = {}
    for e in ev:
        by_type.setdefault(e.event_type, []).append(e.value)
    for r in rows:
        vals = by_type[r.event_type]
        med = statistics.median(vals)
        ads = [abs(v - med) for v in vals]
        mad = statistics.median(ads)
        n_out = sum(1 for a in ads if round(a, 6) > round(3 * mad, 6))
        assert abs(r.median - med) < 1e-6
        assert abs(r.mad - mad) < 1e-6
        assert r.n_outliers == n_out


def test_cov_matrix_matches_numpy(spark):
    """q163's decimal-exact covariance equals numpy's float64 covariance
    to rounding tolerance."""
    import numpy as np

    from nfl_predictions_spark.operators.stats import q163_cov_matrix

    rows = q163_cov_matrix(spark, SF_SMOKE).collect()
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    X = np.array([r.embedding for r in emb], dtype=np.float64)
    ref = np.cov(X, rowvar=False)
    assert len(rows) == X.shape[1] * (X.shape[1] + 1) // 2
    worst = max(abs(r.cov - ref[r.i, r.j]) for r in rows)
    assert worst < 1e-6, worst


def test_pca_eigh_matches_exact_covariance(spark):
    """The production Gram path (q163b) yields the same eigen-spectrum as
    eigh over q163's oracle-exact covariance matrix."""
    import numpy as np

    from nfl_predictions_spark.operators.stats import (
        q163_cov_matrix,
        q163b_pca_eigh,
    )

    cov_rows = q163_cov_matrix(spark, SF_SMOKE).collect()
    dim = max(r.i for r in cov_rows) + 1
    cov = np.zeros((dim, dim))
    for r in cov_rows:
        cov[r.i, r.j] = r.cov
        cov[r.j, r.i] = r.cov
    w_ref = np.sort(np.linalg.eigvalsh(cov))[::-1]

    got = q163b_pca_eigh(spark, SF_SMOKE).collect()
    assert [g.component for g in got] == list(range(dim))
    w_got = np.array([g.eigenvalue for g in got])
    assert np.max(np.abs(w_got - w_ref)) < 1e-4
    ratios = np.array([g.explained_ratio for g in got])
    assert abs(ratios.sum() - 1.0) < 1e-3


def test_bradley_terry_invariants(spark):
    """Strengths are a normalized distribution (sum ~1 up to the 1e-6
    output quantization), non-negative, and ordered descending; the
    win counts reconcile with the comparison counts."""
    from nfl_predictions_spark.operators.stats import q293_bradley_terry

    rows = q293_bradley_terry(spark, SF_SMOKE).collect()
    assert len(rows) == 25
    total = sum(r.strength for r in rows)
    assert abs(total - 1.0) < 25e-6
    assert all(r.strength >= 0 for r in rows)
    assert [r.strength for r in rows] == sorted(
        (r.strength for r in rows), reverse=True
    )
    for r in rows:
        assert 0 <= r.wins <= r.n_comparisons


def test_isotonic_calibration_invariants(spark):
    """q297: the fitted curve is monotone non-decreasing, bounded by the
    observed rate range, and preserves the weighted total (the PAVA
    block-mean property: sum n_k * fitted_k == sum pos_k)."""
    from nfl_predictions_spark.operators.stats import q297_isotonic_calibration

    rows = q297_isotonic_calibration(spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    fits = [r.fitted for r in rows]
    assert all(a <= b for a, b in zip(fits, fits[1:]))
    rates = [r.rate for r in rows]
    assert min(rates) <= min(fits) and max(fits) <= max(rates)
    assert abs(
        sum(r.n * r.fitted for r in rows) - sum(r.pos for r in rows)
    ) < 1e-6 * sum(r.n for r in rows)
    n_orders = sum(r.n for r in rows)
    assert n_orders == spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()


def test_ks_test_invariants(spark):
    """q301: the KS statistic is a valid sup-gap (0 < D <= 1 on these
    distinct groups), counts reconcile with the table, the argmax
    location is a real price, and D == d_num/(n1*n2) exactly."""
    from nfl_predictions_spark.operators.stats import q301_ks_test

    r = q301_ks_test(spark, SF_SMOKE).collect()[0]
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    assert r.n1 + r.n2 == orders.count()
    assert 0 < r.d_num <= r.n1 * r.n2
    assert 0.0 < r.d <= 1.0
    assert r.d == r.d_num / (r.n1 * r.n2)
    lo, hi = orders.agg(
        F.min("o_totalprice"), F.max("o_totalprice")
    ).first()
    assert lo <= r.at_x <= hi
