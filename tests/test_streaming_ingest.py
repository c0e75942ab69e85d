"""Structured Streaming ingest: file stream → foreachBatch merge → timeline.

Covers SURVEY §2.11: micro-batch windows, exactly-once file accounting
across restarts, late rewards as orphans, groom repair.
"""

import gzip
import json
import time

import pytest
from pyspark.sql import functions as F

from tracker_trainer_spark.ingest.groom import assert_no_duplicate_keys, groom
from tracker_trainer_spark.ksuid import deterministic_ksuid
from tracker_trainer_spark.streaming import start_timeline_stream

TS = int(time.time()) - 86_400


def _write_gz(path, records):
    with gzip.open(path, "wt") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


@pytest.fixture()
def paths(tmp_path):
    (tmp_path / "in").mkdir()
    return {
        "in": str(tmp_path / "in"),
        "timeline": str(tmp_path / "timeline"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _drain(spark, paths):
    q = start_timeline_stream(spark, paths["in"], paths["timeline"], paths["ckpt"])
    q.awaitTermination(120)


def test_stream_merges_and_is_incremental(spark, paths):
    d1 = deterministic_ksuid(TS, "d1")
    r1 = deterministic_ksuid(TS + 10, "r1")
    _write_gz(f"{paths['in']}/b1.jsonl.gz", [
        {"message_id": d1, "model": "m1", "item": {"x": 1}, "count": 2},
        {"message_id": r1, "model": "m1", "decision_id": d1, "reward": 1.5},
    ])
    _drain(spark, paths)
    rows = {r.decision_id: r for r in spark.read.parquet(paths["timeline"]).collect()}
    assert rows[d1].reward == 1.5 and json.loads(rows[d1].rewards) == {r1: 1.5}

    # second batch: a late duplicate reward (same message_id, new value)
    # and a brand-new decision; the old file must NOT be reprocessed
    d2 = deterministic_ksuid(TS + 30, "d2")
    _write_gz(f"{paths['in']}/b2.jsonl.gz", [
        {"message_id": r1, "model": "m1", "decision_id": d1, "reward": 4.0},
        {"message_id": d2, "model": "m1", "item": {"x": 2}, "count": 1},
    ])
    _drain(spark, paths)
    df = spark.read.parquet(paths["timeline"])
    # d1 now has two partial rows (append); groom repairs to one with last-win
    assert df.where(F.col("decision_id") == d1).count() == 2
    groom(spark, paths["timeline"])
    assert_no_duplicate_keys(spark, paths["timeline"])
    rows = {r.decision_id: r for r in spark.read.parquet(paths["timeline"]).collect()}
    assert json.loads(rows[d1].rewards) == {r1: 4.0} and rows[d1].reward == 4.0
    assert rows[d1].item == '{"x":1}'  # decision payload survives the repair
    assert rows[d2].rewards == "{}" and rows[d2].reward == 0.0


def test_stream_orphan_reward_then_late_decision(spark, paths):
    dX = deterministic_ksuid(TS + 5, "dX")
    rX = deterministic_ksuid(TS + 15, "rX")
    _write_gz(f"{paths['in']}/only_reward.jsonl.gz", [
        {"message_id": rX, "model": "m1", "decision_id": dX, "reward": 2.0},
    ])
    _drain(spark, paths)
    (orphan,) = spark.read.parquet(paths["timeline"]).collect()
    assert orphan.item is None and orphan["count"] is None and orphan.reward == 2.0

    _write_gz(f"{paths['in']}/late_decision.jsonl.gz", [
        {"message_id": dX, "model": "m1", "item": {"late": True}, "count": 3},
    ])
    _drain(spark, paths)
    groom(spark, paths["timeline"])
    (merged,) = spark.read.parquet(paths["timeline"]).collect()
    assert merged.item == '{"late":true}' and merged["count"] == 3.0
    assert merged.reward == 2.0  # orphaned reward re-attached


def test_stream_processing_time_trigger(spark, paths):
    """The continuous-operation mode (Firehose cadence): a
    ProcessingTime-trigger stream picks up files as they appear and
    lands the same merged rows, then stops cleanly."""
    d1 = deterministic_ksuid(TS, "pt-d1")
    _write_gz(f"{paths['in']}/pt1.jsonl.gz", [
        {"message_id": d1, "model": "m1", "count": 2, "item": {"x": 1}},
    ])
    q = start_timeline_stream(
        spark, paths["in"], paths["timeline"], paths["ckpt"],
        available_now=False, processing_time="1 seconds",
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if spark.read.parquet(paths["timeline"]).count() >= 1:
                    break
            except Exception:
                pass  # first batch not committed yet
            time.sleep(0.5)
        rows = spark.read.parquet(paths["timeline"])
        assert rows.where(F.col("decision_id") == d1).count() == 1
    finally:
        q.stop()


def test_stream_drops_invalid_records(spark, paths):
    good = deterministic_ksuid(TS, "ok")
    _write_gz(f"{paths['in']}/mixed.jsonl.gz", [
        {"message_id": good, "model": "m1", "item": 1, "count": 2},
        {"message_id": "not-a-ksuid", "model": "m1", "item": 1, "count": 2},
        {"message_id": deterministic_ksuid(TS, "f"), "model": "bad name!", "item": 1, "count": 2},
        "not json at all",
    ])
    _drain(spark, paths)
    rows = spark.read.parquet(paths["timeline"]).collect()
    assert [r.decision_id for r in rows] == [good]


def test_stream_reports_invalid_histogram(spark, tmp_path):
    """A9 in streams: each micro-batch's invalid records surface as a
    {reason: count} histogram through on_invalid."""
    import gzip
    import json
    import time as _time

    from tracker_trainer_spark import ksuid
    from tracker_trainer_spark.streaming.ingest_stream import start_timeline_stream

    src = tmp_path / "in"
    src.mkdir()
    ts = int(_time.time()) - 86400
    lines = [
        json.dumps({"message_id": ksuid.deterministic_ksuid(ts, 1),
                    "model": "m1", "count": 2, "item": {"a": 1}}),
        json.dumps({"message_id": "not-a-ksuid", "model": "m1", "count": 2}),
        "not json at all",
    ]
    with gzip.open(src / "b.jsonl.gz", "wt") as f:
        f.write("\n".join(lines) + "\n")

    seen = []
    q = start_timeline_stream(
        spark, str(src), str(tmp_path / "tl"), str(tmp_path / "ck"),
        available_now=True, on_invalid=seen.append,
    )
    q.awaitTermination()
    assert len(seen) == 1
    hist = seen[0]
    assert hist.get("unparseable") == 1
    assert hist.get("invalid message_id") == 1
    assert sum(hist.values()) == 2
