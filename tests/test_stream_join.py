"""Stream-stream watermarked join: drained stream == batch join, state
eviction driven by the watermark + range condition."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from tracker_trainer_spark.streaming.stream_join import decisions_rewards_join

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _fixture(spark):
    """Decisions + rewards with in-window matches, an out-of-window
    reward (beyond max_delay) and an orphan decision."""
    decisions = spark.createDataFrame(
        [
            ("m", "d1", T0),
            ("m", "d2", T0 + timedelta(minutes=10)),
            ("m", "d3", T0 + timedelta(minutes=20)),   # orphan: no reward
            ("n", "d1", T0 + timedelta(minutes=5)),    # same id, other model
        ],
        "model string, decision_id string, decision_ts timestamp",
    )
    rewards = spark.createDataFrame(
        [
            ("m", "d1", "r1", T0 + timedelta(minutes=30), 1.0),
            ("m", "d1", "r2", T0 + timedelta(minutes=90), 2.0),
            ("m", "d2", "r3", T0 + timedelta(minutes=15), 3.0),
            ("m", "d2", "r4", T0 + timedelta(hours=3), 9.0),   # > max_delay
            ("n", "d1", "r5", T0 + timedelta(minutes=6), 4.0),
            ("m", "d9", "r6", T0 + timedelta(minutes=7), 5.0),  # no decision
        ],
        "model string, decision_id string, message_id string, "
        "reward_ts timestamp, reward double",
    )
    return decisions, rewards


def _drain(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_stream_join_matches_batch(spark, tmp_path):
    decisions, rewards = _fixture(spark)
    dsrc, rsrc = str(tmp_path / "d"), str(tmp_path / "r")
    decisions.write.parquet(dsrc)
    rewards.write.parquet(rsrc)

    dstream = spark.readStream.schema(decisions.schema).parquet(dsrc)
    rstream = spark.readStream.schema(rewards.schema).parquet(rsrc)

    got = _drain(
        spark, decisions_rewards_join(dstream, rstream), "ssj_inner"
    ).collect()
    want = decisions_rewards_join(decisions, rewards).collect()

    key = lambda r: (r.model, r.decision_id, r.message_id)
    assert sorted(map(key, got)) == sorted(map(key, want))
    # exact expected envelope: in-window rewards only
    assert sorted(map(key, want)) == [
        ("m", "d1", "r1"), ("m", "d1", "r2"), ("m", "d2", "r3"),
        ("n", "d1", "r5"),
    ]
    assert all(r.reward is not None for r in got)


def test_stream_join_plan_has_bounded_state(spark, tmp_path):
    """Both sides must carry event-time watermarks into the join so the
    engine derives state eviction (no watermark → unbounded state and
    Spark rejects append mode)."""
    decisions, rewards = _fixture(spark)
    dsrc, rsrc = str(tmp_path / "d2"), str(tmp_path / "r2")
    decisions.write.parquet(dsrc)
    rewards.write.parquet(rsrc)
    dstream = spark.readStream.schema(decisions.schema).parquet(dsrc)
    rstream = spark.readStream.schema(rewards.schema).parquet(rsrc)
    df = decisions_rewards_join(dstream, rstream)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2


def test_stream_left_outer_emits_orphans(spark, tmp_path):
    """leftOuter: the orphan decision must appear with null reward once
    the reward watermark passes — the streaming twin of the trainer's
    null-filled orphan rows (P2)."""
    decisions, rewards = _fixture(spark)
    # late sentinels on BOTH streams: outer-null eviction follows the
    # GLOBAL watermark (min across streams, multipleWatermarkPolicy=min),
    # so each side must advance past every decision's eligibility window
    # before orphans can emit in the drain
    d_sentinel = spark.createDataFrame(
        [("z", "zd", T0 + timedelta(days=2))], decisions.schema
    )
    r_sentinel = spark.createDataFrame(
        [("z", "zz", "r7", T0 + timedelta(days=2), 0.0)], rewards.schema
    )
    dsrc, rsrc = str(tmp_path / "d3"), str(tmp_path / "r3")
    decisions.unionAll(d_sentinel).write.parquet(dsrc)
    rewards.unionAll(r_sentinel).write.parquet(rsrc)
    dstream = spark.readStream.schema(decisions.schema).parquet(dsrc)
    rstream = spark.readStream.schema(rewards.schema).parquet(rsrc)

    rows = _drain(
        spark,
        decisions_rewards_join(dstream, rstream, how="leftOuter"),
        "ssj_outer",
    ).collect()
    orphans = {
        (r.model, r.decision_id) for r in rows if r.message_id is None
    }
    assert ("m", "d3") in orphans
    matched = {(r.model, r.decision_id, r.message_id)
               for r in rows if r.message_id is not None}
    assert ("m", "d1", "r1") in matched and ("m", "d2", "r3") in matched
