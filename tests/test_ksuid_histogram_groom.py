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


def test_groom_wide_timeline(spark, tmp_path):
    """Groom across many (model, dt) partitions: only dirty ones are
    rewritten, the pruning predicate stays linear in #models, and the
    repair is exact."""
    import json

    from pyspark.sql import functions as F

    from tracker_trainer_spark import ksuid
    from tracker_trainer_spark.ingest.groom import (
        assert_no_duplicate_keys,
        groom,
        plan_groom,
    )
    from tracker_trainer_spark.ingest.merge import (
        finalize_for_storage,
        merge_rewarded_decisions,
    )
    from tracker_trainer_spark.ingest.sink import write_timeline

    ts0 = 1640000000
    rows = []
    for m in range(3):                 # 3 models
        for d in range(10):            # 10 days each
            for i in range(8):
                did = ksuid.deterministic_ksuid(ts0 + d * 86400 + i, m * 1000 + d * 10 + i)
                rows.append((f"m{m}", did, json.dumps({"x": i}), "{}", 2.0,
                             None, "{}", 0.0))
    df = spark.createDataFrame(
        rows, "model string, decision_id string, item string, context string, "
              "count double, sample string, rewards string, reward double")
    path = str(tmp_path / "tl")
    write_timeline(df, path)

    # dirty half the days of model m1 with duplicate-key partial rewards
    extra = []
    for d in range(0, 10, 2):
        for i in range(4):
            did = ksuid.deterministic_ksuid(ts0 + d * 86400 + i, 1000 + d * 10 + i)
            rid = ksuid.deterministic_ksuid(ts0 + d * 86400 + 500 + i, 90000 + d * 10 + i)
            extra.append(("m1", did, None, None, None, None,
                          json.dumps({rid: 1.0}), 1.0))
    write_timeline(spark.createDataFrame(extra, df.schema), path)

    plan = plan_groom(spark, path)
    dirty_keys = {(r["model"], str(r["dt"])) for r in plan.dirty}
    assert len(dirty_keys) == 5 and all(m == "m1" for m, _ in dirty_keys)

    assert groom(spark, path) == 5
    assert_no_duplicate_keys(spark, path)
    merged = spark.read.parquet(path)
    assert merged.count() == 240  # all duplicates merged, nothing lost
    # rewards actually merged into their decisions
    got = merged.where(F.col("reward") > 0).count()
    assert got == 20
    assert groom(spark, path) == 0  # fixpoint


def test_groom_empty_and_missing_timeline(spark, tmp_path):
    """A fresh deployment's first maintenance cycle: absent or empty
    timelines plan as clean instead of failing schema inference."""
    from tracker_trainer_spark.ingest.groom import groom, plan_groom

    missing = str(tmp_path / "never_written")
    assert plan_groom(spark, missing).dirty == []
    assert groom(spark, missing) == 0

    empty = tmp_path / "empty"
    empty.mkdir()
    assert groom(spark, str(empty)) == 0


def test_groom_fails_loudly_on_broken_layout(spark, tmp_path):
    """A corrupt/conflicting partition layout must raise, not silently
    plan as clean — a no-op repair job on a broken timeline would let
    duplicate keys accumulate unnoticed."""
    import pytest as _pytest
    from pyspark.errors.exceptions.base import PySparkException

    from tracker_trainer_spark.ingest.groom import plan_groom

    path = tmp_path / "tl"
    (path / "dt=2024-01-01").mkdir(parents=True)
    (path / "model=m1" / "dt=2024-01-01").mkdir(parents=True)
    spark.range(3).write.mode("overwrite").parquet(str(path / "dt=2024-01-01"))
    spark.range(3).write.mode("overwrite").parquet(
        str(path / "model=m1" / "dt=2024-01-01"))
    # surfaces as CONFLICTING_DIRECTORY_STRUCTURES (SparkRuntimeException)
    with _pytest.raises(PySparkException, match="CONFLICTING"):
        plan_groom(spark, str(path))


def test_ksuid_column_matches_driver_codec(spark):
    """The distributed KSUID builder (Arrow UDF) must emit byte-for-byte
    the same ids as the pure-Python deterministic_ksuid — the contract
    groom_fixpoint_check's oracle counts rely on (same ids ⇒ same
    partition dts ⇒ same dirty set)."""
    rows = [(TS + i * 1000, i) for i in range(8)]
    df = spark.createDataFrame(rows, "t long, k long")
    got = {
        (r.t, r.k): r.id
        for r in df.select(
            "t", "k", ksuid.ksuid_column("t", "k").alias("id")
        ).collect()
    }
    for t, k in rows:
        assert got[(t, k)] == ksuid.deterministic_ksuid(t, k)


def test_ztp_from_uniform_breakpoints(spark):
    """Shared inverse-CDF: uniforms straddling the first breakpoints
    map to k=1/2/3, u→1 saturates at max_k, and the chain constants are
    exposed for SQL-literal embedding (the cross-engine contract of
    propensity_training_weights)."""
    from pyspark.sql import functions as F

    from tracker_trainer_spark.trainer.weights import (
        ztp_cdf_chain,
        ztp_from_uniform,
    )

    chain = ztp_cdf_chain()
    assert chain[0][0] == 1 and abs(chain[0][1] - 0.5819767068693265) < 1e-15
    c1, c2 = chain[0][1], chain[1][1]
    us = [0.0, c1 - 1e-12, c1 + 1e-12, c2 - 1e-12, c2 + 1e-12, 1.0 - 1e-15]
    df = spark.createDataFrame([(u,) for u in us], "u double")
    got = [r.k for r in df.select(
        ztp_from_uniform(F.col("u")).alias("k")).collect()]
    assert got == [1.0, 1.0, 2.0, 2.0, 3.0, 12.0], got
