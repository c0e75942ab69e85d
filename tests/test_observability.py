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


def test_observed_metrics_surface_in_streaming_progress(spark, tmp_path):
    """On a stream the same observe() metrics arrive per micro-batch in
    the query's progress events (Observation objects are batch-only, so
    the streaming form uses the string-named observe)."""
    import json
    import os

    import pandas as pd

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    os.makedirs(src)
    pd.DataFrame(
        [{"reward": 1.5, "item": "a"}, {"reward": None, "item": "b"}]
    ).to_json(f"{src}/b1.json", orient="records", lines=True)

    from pyspark.sql import functions as F

    stream = spark.readStream.schema("reward DOUBLE, item STRING").json(src)
    observed = stream.observe(
        "merge_metrics",
        F.count(F.lit(1)).alias("n_rows"),
        F.count("reward").alias("n_rewarded"),
    )
    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    progress = [json.loads(p.json) for p in q.recentProgress]
    metrics = [
        p["observedMetrics"]["merge_metrics"]
        for p in progress
        if p.get("observedMetrics", {}).get("merge_metrics")
    ]
    assert metrics, "no observed metrics in progress events"
    assert metrics[0]["n_rows"] == 2
    assert metrics[0]["n_rewarded"] == 1
