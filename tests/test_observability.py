"""observe() metrics must match a direct aggregation — and cost no
second scan (they ride the action)."""

import json
import os

import pandas as pd
from pyspark.sql import functions as F

from tracker_trainer_spark.observability import (
    merge_metric_exprs,
    merge_metrics,
    observe_frame,
    observe_stream,
    training_metrics,
)
from tracker_trainer_spark.queries import QUERIES


def test_merge_metrics_match_direct_agg(spark, sf_dir):
    df = QUERIES["merge_rewarded_events"](spark, sf_dir)
    obs, observed = merge_metrics(df)
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    # independent spellings — n_rewards is the reward-bearing signal on
    # this frame (reward itself is coalesced to 0.0 by the merge)
    want = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("n_rewards") > 0, 1)).alias("n_rewarded"),
        F.sum("reward").alias("reward_sum"),
    ).first()
    assert got["n_rows"] == want["n_rows"] > 0
    # every merged row happens to be rewarded at this SF; the
    # distinguishing cases (0 < rewarded < rows) are pinned by the
    # synthetic training/streaming tests below
    assert 0 < got["n_rewarded"] == want["n_rewarded"] <= got["n_rows"]
    assert abs(got["reward_sum"] - want["reward_sum"]) < 1e-6


def test_training_metrics_count_orphans_and_null_rewards(spark):
    """Contract test on a frame with KNOWN orphans/null rewards — the
    loader's own output is post-null-fill, so the metrics must be
    observed upstream of it."""
    df = spark.createDataFrame(
        [("a", 1.0), (None, None), ("c", None)],
        "item STRING, reward DOUBLE",
    )
    obs, observed = training_metrics(df)
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_rows"] == 3
    assert got["n_orphans"] == 1
    assert got["n_null_reward"] == 2


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
    """On a stream the SAME metric expressions (shared via
    merge_metric_exprs) arrive per micro-batch in progress events."""
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    os.makedirs(src)
    pd.DataFrame(
        [{"reward": 1.5, "item": "a"}, {"reward": None, "item": "b"}]
    ).to_json(f"{src}/b1.json", orient="records", lines=True)

    stream = spark.readStream.schema("reward DOUBLE, item STRING").json(src)
    observed = observe_stream(
        stream, "merge_metrics", *merge_metric_exprs(stream)
    )
    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120), "stream did not finish in time"
        progress = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()
    metrics = [
        p["observedMetrics"]["merge_metrics"]
        for p in progress
        if p.get("observedMetrics", {}).get("merge_metrics")
    ]
    assert metrics, "no observed metrics in progress events"
    assert metrics[0]["n_rows"] == 2
    assert metrics[0]["n_rewarded"] == 1  # nonzero-reward row only
    assert abs(metrics[0]["reward_sum"] - 1.5) < 1e-9
