"""Runtime bloom-filter semi-join reduction (Catalyst InjectRuntimeFilter).

At 100 TB the win for a selective dim ⨝ huge fact shuffle join is not the
join itself but the fact rows that never reach the shuffle: Spark builds a
bloom filter from the filtered creation side and applies it as a row-level
predicate on the application side scan. The optimizer only injects it past
size thresholds tuned for clusters (application side ≥ 10 GB), so at test
scale we lower the thresholds and pin that OUR join shapes are eligible —
a plan regression here means a real 100 TB run would silently lose the
reduction (e.g. someone reorders the filter above the join or swaps the
equi-join for a non-injectable shape).
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bloom_confs(spark):
    """Lower injection thresholds to test scale; force the shuffle join
    (broadcast joins get their own pushdown and never need the bloom)."""
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    saved = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_selective_dim_fact_join_gets_bloom_reduction(spark, sf_dir, bloom_confs):
    """The engine's canonical selective-dim ⨝ fact shape (filtered orders
    ⨝ lineitem on orderkey) must be bloom-injectable: the fact side scan
    gains a might_contain predicate built from the filtered dim."""
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).agg(
        F.sum("l_quantity").alias("qty")
    )
    plan = _optimized(joined)
    assert "bloom_filter_agg" in plan or "might_contain" in plan, plan

    # the reduction must not change results
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        want = joined.collect()[0]["qty"]
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    got = joined.collect()[0]["qty"]
    assert got == want


def test_reward_decision_attribution_join_is_bloom_eligible(spark, sf_dir, bloom_confs):
    """The tracker's own shape: a selective slice of decisions (one model's
    recent window) joined to the full reward fact stream by key."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    decisions = (
        ev.where((F.col("event_type") == "view") & (F.col("value") > 50))
        .select(F.col("event_id").alias("decision_id"))
    )
    rewards = ev.select(F.col("event_id").alias("decision_id"), "value")
    joined = rewards.join(decisions, "decision_id").agg(
        F.sum("value").alias("reward_sum")
    )
    assert "bloom_filter_agg" in _optimized(joined) or "might_contain" in _optimized(joined)
