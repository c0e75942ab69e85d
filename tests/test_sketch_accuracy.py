"""Sketch swap-path guarantees: the docstrings of orders_profile and
order_value_percentiles claim the exact aggregates swap to
approx_count_distinct / percentile_approx at 100 TB "without changing
the query shape". These tests pin that claim: same frame, same grouping,
sketch result within the published error envelope of the exact one, and
the sketches MERGE (the property that makes them shuffle-safe — partial
sketches per partition union into the global answer)."""

from pyspark.sql import functions as F


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    o = _orders(spark, sf_dir)
    exact, approx = o.agg(
        F.count_distinct("o_custkey").alias("e"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("a"),
    ).first()
    # HLL++ rsd=0.02 → 3-sigma envelope 6%
    assert abs(approx - exact) <= max(0.06 * exact, 1)


def test_percentile_approx_within_rank_error(spark, sf_dir):
    """percentile_approx(accuracy=a) guarantees rank error <= n/a: the
    approx p-quantile's true rank must sit within that band."""
    o = _orders(spark, sf_dir)
    acc = 1000
    n = o.count()
    row = o.agg(
        F.percentile("o_totalprice", F.array(F.lit(0.5), F.lit(0.99))).alias("e"),
        F.percentile_approx(
            "o_totalprice", F.array(F.lit(0.5), F.lit(0.99)), F.lit(acc)
        ).alias("a"),
    ).first()
    for p, approx_v in zip((0.5, 0.99), row.a):
        true_rank = o.where(F.col("o_totalprice") <= approx_v).count()
        assert abs(true_rank - p * n) <= n / acc + 1, (p, approx_v)


def test_hll_sketches_merge_across_splits(spark, sf_dir):
    """The distributed-aggregation property: per-split HLL sketches
    unioned with hll_union_agg estimate the same cardinality as one
    sketch over all rows — so partial aggregation before the exchange
    (what Spark plans for approx_count_distinct) is sound.

    Within the sketch's error bound, not exact: DataSketches' union
    path can drop the historic-inverse-probability estimator (the
    out-of-order flag), so merged and whole may differ by a fraction of
    the documented RSE (1.04/sqrt(2^lgK) ≈ 1.6% at the default lgK=12)
    even over identical value sets."""
    o = _orders(spark, sf_dir).withColumn(
        "half", (F.col("o_orderkey") % 2).cast("int")
    )
    whole = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("est")
    ).first().est
    merged = (
        o.groupBy("half")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()
        .est
    )
    rse = 1.04 / (2 ** 12) ** 0.5
    assert abs(merged - whole) <= 2 * rse * whole, (merged, whole)


def test_profile_swaps_to_sketch_same_shape(spark, sf_dir):
    """The orders_profile swap: replacing count_distinct with
    approx_count_distinct must REMOVE the multi-distinct Expand rewrite
    (sketches need no distinct expansion) and keep a single agg pass —
    the cheaper plan the docstring promises at scale."""
    from tracker_trainer_spark.plans import count_shuffles, physical_plan

    o = _orders(spark, sf_dir)
    sketch_profile = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct("o_orderkey").alias("n_orderkeys"),
        F.approx_count_distinct("o_custkey").alias("n_customers"),
        F.round(F.min("o_totalprice"), 4).alias("min_totalprice"),
        F.round(F.max("o_totalprice"), 4).alias("max_totalprice"),
    )
    plan = physical_plan(sketch_profile)
    assert "Expand" not in plan
    assert count_shuffles(sketch_profile) == 1
    row = sketch_profile.first()
    exact = o.agg(F.count_distinct("o_custkey").alias("e")).first().e
    assert abs(row.n_customers - exact) <= max(0.15 * exact, 2)


def test_count_min_sketch_overestimates_within_bound(spark, sf_dir):
    """Count-min heavy hitters: estimates are >= true counts (one-sided
    by construction) and within eps*N of them — the fixed-memory
    frequency sketch the per-term TF/DF aggs swap to when the vocab
    itself no longer fits a hash agg."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eps, conf = 0.01, 0.95
    sk = ev.agg(
        F.count_min_sketch(
            "event_type", F.lit(eps), F.lit(conf), F.lit(42)
        ).alias("sk")
    ).first().sk
    true = {r.event_type: r.n for r in
            ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_total = sum(true.values())

    # probe the sketch through the JVM helper
    jvm = spark.sparkContext._jvm
    jsk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(sk))
    for et, n in true.items():
        est = jsk.estimateCount(et)
        assert est >= n                      # never undercounts
        assert est - n <= eps * n_total + 1  # within the eps*N bound


def test_approx_top_k_heavy_hitters_swap_path(spark, sf_dir):
    """Heavy-hitters swap path for the term-ranking queries: at 100 TB
    an exact groupBy(term) for "top terms" becomes approx_top_k with a
    bounded state (maxItemsTracked), same single-agg shape. Pin that on
    the real corpus the sketch returns the true leaders: every term
    whose exact count clears the tracked-state guarantee must appear,
    with exact counts (approx_top_k counts are exact for items that
    never leave the tracked set at this cardinality)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
    )
    exact_all = {
        r.term: r.n
        for r in terms.groupBy("term").agg(F.count("*").alias("n")).collect()
    }
    sketch = terms.agg(
        F.expr("approx_top_k(term, 10, 10000)").alias("tk")
    ).first().tk
    got = {r["item"]: r["count"] for r in sketch}  # .count is Row's method
    # tie-insensitive at the rank-10 boundary (the sketch breaks count
    # ties in its own internal order, not lexicographically): every
    # reported count must be the EXACT global count of that term, and
    # the count multiset must equal the true top-10 count multiset
    assert len(got) == 10
    for t, n in got.items():
        assert n == exact_all[t], (t, n, exact_all[t])
    true_top = sorted(exact_all.values(), reverse=True)[:10]
    assert sorted(got.values(), reverse=True) == true_top


def test_theta_sketch_set_operations_swap_path(spark, sf_dir):
    """Audience-overlap swap path: |viewers ∩ purchasers| and the union
    at 100 TB become theta sketches — the sketch family whose
    intersection/difference ESTIMATES compose from mergeable partials
    (HLL only unions). Below the sketch's nominal-entries threshold the
    estimate is exact, so at test cardinality the numbers must equal
    the exact distinct counts; the swap keeps the one-agg shape."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    viewers = ev.where(F.col("event_type") == "view")
    buyers = ev.where(F.col("event_type") == "purchase")
    exact_i = viewers.select("user_id").intersect(buyers.select("user_id")).count()
    exact_u = viewers.select("user_id").union(buyers.select("user_id")).distinct().count()

    row = ev.agg(
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'view' THEN user_id END)"
        ).alias("v"),
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'purchase' THEN user_id END)"
        ).alias("p"),
    ).select(
        F.expr("theta_sketch_estimate(theta_intersection(v, p))").alias("i"),
        F.expr("theta_sketch_estimate(theta_union(v, p))").alias("u"),
    ).first()
    assert row.i == exact_i
    assert row.u == exact_u
