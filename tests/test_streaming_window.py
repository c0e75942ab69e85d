"""Watermarked windowed aggregation: streaming result == batch result
when the stream drains fully (AvailableNow + complete mode)."""

from pyspark.sql import functions as F

from tracker_trainer_spark.streaming.ingest_stream import windowed_event_stats


def _events(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    for f_ in df.schema.fields:
        if f_.name == "ts" and f_.dataType.simpleString() == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
            )
    return df.select("ts", "event_type", "value")


def test_windowed_stream_matches_batch(spark, sf_dir, tmp_path):
    batch = _events(spark, sf_dir)
    src = str(tmp_path / "src")
    batch.write.parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        windowed_event_stats(stream)
        .writeStream.format("memory").queryName("win_counts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.event_type): (r.n, round(r.sum_value, 6))
        for r in spark.table("win_counts").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n, round(r.sum_value, 6))
        for r in windowed_event_stats(batch).collect()
    }
    assert got == want and len(got) > 0


def test_watermark_bounds_state(spark, sf_dir, tmp_path):
    """Append mode: closed windows emit, the tail inside the watermark
    delay stays open (state bounded by delay, not stream age)."""
    batch = _events(spark, sf_dir)
    src = str(tmp_path / "src2")
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        windowed_event_stats(stream, watermark_delay="2 hours")
        .writeStream.format("memory").queryName("win_append")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    emitted = spark.table("win_append").agg(F.max("window_start")).first()[0]
    hi = batch.agg(F.max("ts")).first()[0]
    assert emitted is not None
    # every emitted window closed before (max_ts - delay)
    from datetime import timedelta
    assert emitted + timedelta(hours=1) <= hi - timedelta(hours=2) + timedelta(hours=1)


def _user_events(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    for f_ in df.schema.fields:
        if f_.name == "ts" and f_.dataType.simpleString() == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
            )
    return df.select("user_id", "ts", "value")


def test_session_window_stream_matches_batch(spark, sf_dir, tmp_path):
    """Gap-based sessions: a fully-drained stream must produce the
    identical session set as the batch plan (complete mode merges
    cross-batch session fragments in state)."""
    from tracker_trainer_spark.streaming.ingest_stream import session_window_stats

    batch = _user_events(spark, sf_dir)
    src = str(tmp_path / "sess_src")
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        session_window_stats(stream)
        .writeStream.format("memory").queryName("sess_counts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start): (r.n_events, r.session_value)
        for r in spark.table("sess_counts").collect()
    }
    want = {
        (r.user_id, r.session_start): (r.n_events, r.session_value)
        for r in session_window_stats(batch).collect()
    }
    assert got == want and len(got) > 0


def test_windowed_stats_rejects_non_timestamp_event_time(spark):
    """A bigint event-time (what nanosAsLong=true delivers from raw
    parquet) must raise, not be cast as seconds into garbage windows."""
    import pytest

    df = spark.range(10).select(
        F.col("id").alias("ts"), F.lit("view").alias("event_type"),
        F.lit(1.0).alias("value"),
    )
    with pytest.raises(TypeError, match="timestamp"):
        windowed_event_stats(df)


def test_dedup_stream_drops_in_watermark_duplicates(spark, sf_dir, tmp_path):
    """A drained stream with planted duplicates inside the lateness
    bound keeps exactly one row per key and matches the batch dedup."""
    from tracker_trainer_spark.streaming.ingest_stream import dedup_stream

    base = _events(spark, sf_dir).withColumn(
        "message_id", F.concat(F.lit("m"), F.monotonically_increasing_id())
    )
    dup = base.limit(50)  # duplicates with identical ts: inside any bound
    batch = base.unionAll(dup)
    src = str(tmp_path / "dupsrc")
    batch.write.parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        dedup_stream(stream, key_cols=("message_id",))
        .writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    got = spark.table("dedup_out")
    n_keys = batch.select("message_id").distinct().count()
    assert got.count() == n_keys
    assert got.select("message_id").distinct().count() == n_keys
    assert dedup_stream(batch).count() == n_keys  # batch path agrees


def test_dedup_stream_batch_path_needs_no_event_time(spark):
    """Batch degradation is plain dropDuplicates: no ts column required,
    bigint ts tolerated — only the streaming watermark validates time."""
    from tracker_trainer_spark.streaming.ingest_stream import dedup_stream

    no_ts = spark.createDataFrame(
        [("a",), ("a",), ("b",)], ["message_id"]
    )
    assert dedup_stream(no_ts, key_cols=("message_id",)).count() == 2
    bigint_ts = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "message_id string, ts long"
    )
    assert dedup_stream(bigint_ts, key_cols=("message_id",)).count() == 2
