"""KSUID codec roundtrip, invalid-record histogram (A9), groom fixpoint."""

import json
import time

from pyspark.sql import functions as F

from tracker_trainer_spark import ksuid
from tracker_trainer_spark.ingest.groom import groom
from tracker_trainer_spark.ingest.reader import parse_track_records, read_track_lines
from tracker_trainer_spark.ingest.validate import invalid_record_histogram

TS = 1650000000


def test_ksuid_roundtrip_timestamp(spark):
    ids = [(ksuid.deterministic_ksuid(TS + i, i),) for i in range(5)]
    assert all(len(k) == 27 for (k,) in ids)
    df = spark.createDataFrame(ids, "id string")
    got = [r.t for r in df.select(ksuid.ksuid_timestamp(F.col("id")).alias("t"))
           .orderBy("t").collect()]
    assert got == [TS + i for i in range(5)]


def test_ksuid_sorts_chronologically():
    ks = [ksuid.deterministic_ksuid(TS + i * 1000, i) for i in range(20)]
    assert ks == sorted(ks)  # lexicographic == chronological


def test_invalid_record_histogram(spark, tmp_path):
    good = ksuid.deterministic_ksuid(TS, "g")
    lines = [
        json.dumps({"message_id": good, "model": "m", "item": 1, "count": 2}),
        "not json",
        json.dumps({"message_id": "short", "model": "m", "count": 2}),
        json.dumps({"message_id": ksuid.deterministic_ksuid(TS, 1), "model": "no spaces!", "count": 2}),
        json.dumps({"message_id": ksuid.deterministic_ksuid(TS, 2), "model": "m", "count": 0}),
        json.dumps({"message_id": ksuid.deterministic_ksuid(TS, 3), "model": "m",
                    "count": 1, "sample": {"x": 1}}),
        json.dumps({"message_id": ksuid.deterministic_ksuid(TS, 4), "model": "m",
                    "decision_id": "bogus", "reward": 1.0}),
        json.dumps({"message_id": ksuid.deterministic_ksuid(TS, 5), "model": "m",
                    "decision_id": good, "reward": "not-a-number"}),
    ]
    p = str(tmp_path / "mixed.jsonl")
    open(p, "w").write("\n".join(lines))
    parsed = parse_track_records(read_track_lines(spark, p))
    hist = {r.reason: r["count"] for r in invalid_record_histogram(parsed).collect()}
    assert hist == {
        "unparseable": 1,
        "invalid message_id": 1,
        "invalid model": 1,
        "invalid count": 1,
        "invalid count of 1 with sample": 1,
        "invalid decision_id": 1,
        "invalid reward": 1,
    }


def test_groom_reaches_fixpoint(spark, timeline):
    # first groom may rewrite (the fixture appends within one batch so it
    # may already be clean); the second call must be a no-op
    groom(spark, timeline)
    assert groom(spark, timeline) == 0
