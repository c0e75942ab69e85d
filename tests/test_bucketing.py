"""Bucketed tables: co-located joins and aggregations without a shuffle.

The 100 TB pre-partitioning story: when two tables are bucketed on the
join key with the same bucket count, the join (and a groupBy on the key)
reads co-located buckets and skips the exchange entirely. The timeline's
analogue is bucketing rewarded_decisions by decision_id so trainer joins
(propensity scores ⨝ weights, reward joins) never reshuffle the fact
table.
"""

import pytest
from pyspark.sql import functions as F

from tracker_trainer_spark.plans import count_shuffles


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    # external tables (explicit path option) — the static warehouse dir
    # of the shared test session cannot be changed
    wh = str(tmp_path_factory.mktemp("warehouse"))
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )
    for name in ("ev_bucketed_a", "ev_bucketed_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            events.write.bucketBy(8, "user_id").sortBy("user_id")
            .option("path", f"{wh}/{name}")
            .saveAsTable(name)
        )
    yield "ev_bucketed_a", "ev_bucketed_b"
    for name in ("ev_bucketed_a", "ev_bucketed_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    a, b = bucketed
    left = spark.table(a).groupBy("user_id").agg(F.count(F.lit(1)).alias("n_a"))
    right = spark.table(b).groupBy("user_id").agg(F.sum("value").alias("v_b"))
    joined = left.join(right, "user_id")
    # both aggs run bucket-local AND the join is co-located: zero exchanges
    assert count_shuffles(joined) == 0
    assert joined.count() > 0


def test_unbucketed_equivalent_does_shuffle(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )
    left = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_a"))
    right = events.groupBy("user_id").agg(F.sum("value").alias("v_b"))
    assert count_shuffles(left.join(right, "user_id")) >= 1


def test_bucketed_results_match_unbucketed(spark, bucketed, sf_dir):
    a, _ = bucketed
    got = {
        r.user_id: r.n
        for r in spark.table(a).groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {
        r.user_id: r.n
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want
