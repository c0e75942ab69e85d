"""Algorithmic invariants of the sketch / robust-stats query family.

The oracle gate proves Spark == DuckDB; these prove the ALGORITHMS are
right (both engines could agree on a wrong implementation): one-sided
sketch error, Bloom's no-false-negative guarantee, PAVA's monotonicity
and mean preservation, estimator error bounds.
"""

import math

import pytest

from tracker_trainer_spark.queries import QUERIES


@pytest.fixture(scope="module")
def rows(spark, sf_dir):
    """Materialize each family query once for the module."""
    cache = {}

    def get(name):
        if name not in cache:
            cache[name] = QUERIES[name](spark, sf_dir).toPandas()
        return cache[name]

    return get


def test_hll_estimate_within_error_bound(rows):
    """HLL with m=256 registers has std error 1.04/sqrt(256) = 6.5% in
    the raw regime; small cardinalities fall to the linear-counting
    branch whose error is tighter still.  Assert 4 sigma everywhere —
    the pre-correction raw estimator was off by 12x at n=15, which is
    exactly what this test exists to catch."""
    df = rows("hll_distinct_users")
    assert len(df) > 0
    for _, r in df.iterrows():
        rel = abs(r.hll_est - r.n_exact) / max(r.n_exact, 1)
        assert rel < 4 * 1.04 / math.sqrt(256), dict(r)
        assert 0 < r.n_registers <= 256


def test_hll_merge_equals_whole_stream_sketch(rows):
    """Union-of-maxes == sketch-of-union: hll_merge_daily's '(merged)'
    row is built ONLY from the per-day register vectors, while
    hll_distinct_users' 'purchase' row sketches the same stream in one
    pass — HLL mergeability says they must agree EXACTLY (same
    registers, same estimate, bit for bit), and the exact comparators
    must match too."""
    merged = rows("hll_merge_daily")
    merged_row = merged[merged.day == "(merged)"]
    assert len(merged_row) == 1
    whole = rows("hll_distinct_users")
    whole_row = whole[whole.event_type == "purchase"]
    assert len(whole_row) == 1
    assert float(merged_row.hll_est.iloc[0]) == float(whole_row.hll_est.iloc[0])
    assert int(merged_row.n_exact.iloc[0]) == int(whole_row.n_exact.iloc[0])
    # daily sketches themselves stay inside the HLL error envelope
    days = merged[merged.day != "(merged)"]
    assert len(days) > 0
    for _, r in days.iterrows():
        rel = abs(r.hll_est - r.n_exact) / max(r.n_exact, 1)
        assert rel < 4 * 1.04 / math.sqrt(256), dict(r)


def test_cms_never_underestimates(rows):
    """Count-Min point estimates are one-sided: est >= truth, always."""
    df = rows("countmin_frequency_topk")
    assert len(df) == 20
    assert (df.cms_est >= df.true_n).all()
    assert (df.overcount == df.cms_est - df.true_n).all()
    assert (df.overcount >= 0).all()


def test_cms_join_size_never_underestimates(rows):
    df = rows("cms_join_size_estimate")
    assert len(df) == 1
    r = df.iloc[0]
    assert r.exact_size > 0
    assert r.cms_est >= r.exact_size
    assert r.overcount == r.cms_est - r.exact_size


def test_bloom_has_no_false_negatives(rows):
    """Every truly blocked key must test positive; the only slack is
    false positives, and the counts must reconcile exactly."""
    df = rows("bloom_filter_audit")
    assert len(df) > 0
    assert (df.n_bloom_pos >= df.n_blocked).all()
    assert (df.n_false_pos == df.n_bloom_pos - df.n_blocked).all()
    assert (df.n_parts >= df.n_bloom_pos).all()


def test_hierarchy_covers_every_customer_once(rows, spark, sf_dir):
    df = rows("customer_hierarchy_rollup")
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert int(df.n_nodes.sum()) == n_cust
    assert int(df.loc[df.depth == 0, "n_nodes"].iloc[0]) == 1
    # 8-ary tree: each level at most 8x the previous
    by_depth = df.sort_values("depth").n_nodes.tolist()
    for a, b in zip(by_depth, by_depth[1:]):
        assert b <= 8 * a


def test_isotonic_fit_is_monotone_and_mean_preserving(rows):
    """The two defining PAVA properties: the fitted rates are
    non-decreasing in score order, and the weighted fit preserves the
    overall positive mass (the L2 projection onto the monotone cone
    keeps the weighted mean)."""
    df = rows("isotonic_calibration").sort_values("bin")
    iso = df.iso_rate.tolist()
    assert all(a <= b + 1e-12 for a, b in zip(iso, iso[1:]))
    assert abs((df.iso_rate * df.n).sum() - df.pos.sum()) < 1e-6
    # the fit dominates raw rates from below at violations but stays
    # inside the observed range
    assert df.iso_rate.min() >= -1e-12
    assert df.iso_rate.max() <= 1 + 1e-12


def test_theil_sen_slope_inside_pair_envelope(rows):
    df = rows("theil_sen_price_slope")
    assert len(df) == 1
    r = df.iloc[0]
    assert r.n_points >= 2
    assert 0 < r.n_pairs <= r.n_points * (r.n_points - 1) // 2
    # the sampled pair medians swing sign on tiny samples (unit price
    # varies per part), so only finiteness is invariant
    assert math.isfinite(r.theil_sen_slope)


def test_autocorr_is_a_valid_correlation(rows):
    df = rows("daily_revenue_autocorr")
    assert set(df.lag) == {1, 7}
    assert (df.n_pairs > 0).all()
    assert (df.acf.abs() <= 1 + 1e-12).all()


def test_running_distinct_milestones_consistent(rows):
    df = rows("user_running_distinct")
    assert (df.n_types >= 1).all()
    assert (df.n_types <= df.n_events).all()
    reached = df.n_types >= 3
    assert df.loc[reached, "third_type_ts"].notna().all()
    assert df.loc[~reached, "third_type_ts"].isna().all()


def test_trigrams_are_the_bigram_extension(rows, spark, sf_dir):
    """Every surfaced trigram's (t1, t2) prefix must exist as an
    observed transition, and counts are positive."""
    tri = rows("event_trigram_patterns")
    assert 0 < len(tri) <= 15
    assert (tri.n > 0).all()
    trans = QUERIES["event_transition_matrix"](spark, sf_dir).toPandas()
    pairs = set(zip(trans.prev_type, trans.next_type)) if "prev_type" in trans else None
    if pairs is not None:
        assert all((a, b) in pairs for a, b in zip(tri.t1, tri.t2))


def test_bootstrap_ci_brackets_the_mean(rows):
    """The replicate distribution must bracket the full-sample mean and
    the endpoints must be ordered (2nd vs 49th order statistic)."""
    df = rows("bootstrap_mean_ci")
    assert len(df) == 1
    r = df.iloc[0]
    assert r.n_boot == 50
    assert r.ci_lo <= r.ci_hi
    assert r.ci_lo <= r.mean_value <= r.ci_hi
    # Poisson-bootstrap spread scales like sigma/sqrt(n): the interval
    # must be non-degenerate but far narrower than the mean itself
    assert 0 < (r.ci_hi - r.ci_lo) < r.mean_value


def test_km_survival_is_a_valid_curve(rows):
    """Kaplan-Meier invariants: S is non-increasing in day, stays in
    [0, 1], risk sets shrink by exactly the prior deaths (censoring
    only at the horizon), and S(k) equals the explicit product of its
    own step factors."""
    df = rows("km_conversion_survival").sort_values("day").reset_index(drop=True)
    assert len(df) > 0
    s = df.survival.tolist()
    assert all(0 <= x <= 1 + 1e-12 for x in s)
    assert all(a >= b - 1e-12 for a, b in zip(s, s[1:]))
    n, d = df.n_risk.tolist(), df.d_events.tolist()
    assert all(nb == na - da for na, da, nb in zip(n, d, n[1:]))
    prod = 1.0
    for i in range(len(df)):
        prod *= 1.0 - d[i] / n[i]
        assert abs(prod - s[i]) < 1e-9


def test_shared_parts_pairs_ordered_and_positive(rows):
    df = rows("supplier_shared_parts")
    assert len(df) == 20
    assert (df.shared_parts > 0).all()
    assert (df.s1 < df.s2).all()
    counts = df.shared_parts.tolist()
    assert counts == sorted(counts, reverse=True)
