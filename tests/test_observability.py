"""observe() metrics must match a direct aggregation — and cost no
second scan (they ride the action)."""

from pyspark.sql import functions as F

from tracker_trainer_spark.observability import merge_metrics, observe_frame
from tracker_trainer_spark.queries import QUERIES


def test_merge_metrics_match_direct_agg(spark, sf_dir):
    df = QUERIES["merge_rewarded_events"](spark, sf_dir)
    obs, observed = merge_metrics(df)
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    want = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("reward").alias("n_rewarded"),
        F.coalesce(F.sum("reward"), F.lit(0.0)).alias("reward_sum"),
    ).first()
    assert got["n_rows"] == want["n_rows"] > 0
    assert got["n_rewarded"] == want["n_rewarded"]
    assert abs(got["reward_sum"] - want["reward_sum"]) < 1e-6


def test_observe_frame_rides_single_action(spark, sf_dir):
    """The observed plan contains CollectMetrics and exactly the same
    scan set as the unobserved plan — no second pass."""
    from tracker_trainer_spark.plans import physical_plan

    df = QUERIES["events_type_stats"](spark, sf_dir)
    obs, observed = observe_frame(df, "m", F.count(F.lit(1)).alias("n"))
    plan = physical_plan(observed)
    assert "CollectMetrics" in plan
    assert plan.count("events.parquet") == physical_plan(df).count(
        "events.parquet"
    )
