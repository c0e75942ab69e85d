"""S5 quarantine: files with invalid decision_ids move wholesale to
_unrecoverable/ (preserving their partition-relative path) and scans
proceed clean afterward (reference: src/ingest/partition.py:357-372)."""

import os

from pyspark.sql import functions as F

from tracker_trainer_spark import ksuid
from tracker_trainer_spark.ingest.quarantine import (
    UNRECOVERABLE_DIR,
    find_invalid_files,
    quarantine_invalid_files,
)

TS = 1650000000


def _timeline_with_bad_file(spark, tmp_path):
    path = str(tmp_path / "tl")
    good = [(ksuid.deterministic_ksuid(TS + i, i), float(i)) for i in range(20)]
    spark.createDataFrame(good, "decision_id string, reward double").coalesce(
        1
    ).write.parquet(path)
    # second file in the same table with one invalid (non-KSUID) id
    bad = [(ksuid.deterministic_ksuid(TS + 100 + i, i), float(i)) for i in range(5)]
    bad.append(("not-a-ksuid!", 1.0))
    spark.createDataFrame(bad, "decision_id string, reward double").coalesce(
        1
    ).write.mode("append").parquet(path)
    return path


def test_quarantine_moves_only_offending_file(spark, tmp_path):
    path = _timeline_with_bad_file(spark, tmp_path)
    assert spark.read.parquet(path).count() == 26

    found = find_invalid_files(spark, path)
    assert len(found) == 1

    moved = quarantine_invalid_files(spark, path)
    assert moved == found

    # scan proceeds clean: _-prefixed dir is invisible to Spark listing
    left = spark.read.parquet(path)
    assert left.count() == 20
    assert left.where(~F.col("decision_id").rlike("^[0-9A-Za-z]{27}$")).count() == 0

    # audit trail: the file exists under _unrecoverable with its name
    qdir = os.path.join(path, UNRECOVERABLE_DIR)
    quarantined = [
        os.path.join(dp, f) for dp, _, fs in os.walk(qdir) for f in fs
        if f.endswith(".parquet")
    ]
    assert len(quarantined) == 1
    assert os.path.basename(quarantined[0]) in moved[0]
    # all 6 rows preserved, nothing rewritten
    assert spark.read.parquet(quarantined[0]).count() == 6

    # idempotent: second pass is a no-op
    assert quarantine_invalid_files(spark, path) == []


def test_quarantine_future_ksuid_guard(spark, tmp_path):
    """now_ts makes the future-KSUID rule part of validity, matching the
    ingest guard (reference: src/ingest/utils.py:62-67)."""
    path = str(tmp_path / "tl2")
    rows = [(ksuid.deterministic_ksuid(TS + i, i), float(i)) for i in range(5)]
    rows.append((ksuid.deterministic_ksuid(TS + 10**6, 99), 9.9))  # "future"
    spark.createDataFrame(rows, "decision_id string, reward double").coalesce(
        1
    ).write.parquet(path)

    assert find_invalid_files(spark, path, now_ts=None) == []
    moved = quarantine_invalid_files(spark, path, now_ts=TS + 100)
    assert len(moved) == 1
    # the whole (only) data file moved → clean listing is empty (schema
    # must be given: no data files remain to infer it from)
    empty = spark.read.schema("decision_id string, reward double").parquet(path)
    assert empty.count() == 0


def test_maintain_timeline_full_pass(spark, tmp_path):
    """quarantine → groom → invariant in one entry: a timeline with a
    poisoned file AND duplicate-key partials comes out clean."""
    import json as _json

    from tracker_trainer_spark.ingest.groom import maintain_timeline
    from tracker_trainer_spark.ingest.merge import (
        finalize_for_storage,
        merge_rewarded_decisions,
    )
    from tracker_trainer_spark.ingest.sink import write_timeline

    path = str(tmp_path / "tl3")
    ids = [ksuid.deterministic_ksuid(TS + i, i) for i in range(30)]
    base = [(None, d, _json.dumps({"x": i}), None, 2.0, None, None)
            for i, d in enumerate(ids)]
    schema = ("model string, decision_id string, item string, context string, "
              "count double, sample string, rewards map<string,double>")
    df = spark.createDataFrame([("m1",) + r[1:] for r in base], schema)
    write_timeline(finalize_for_storage(merge_rewarded_decisions(
        df, ("model", "decision_id"))), path)
    # duplicate-key partial rewards (dirty partitions for groom)
    partials = spark.createDataFrame(
        [("m1", d, None, None, None, None,
          {ksuid.deterministic_ksuid(TS + 500 + i, i): 1.0})
         for i, d in enumerate(ids[:10])], schema)
    write_timeline(finalize_for_storage(merge_rewarded_decisions(
        partials, ("model", "decision_id"))), path)
    # a poisoned file (invalid decision_id) appended inside a real
    # partition directory, conforming to the stored schema
    import glob as _glob

    part_dir = sorted(_glob.glob(f"{path}/model=m1/dt=*"))[0]
    stored = spark.read.parquet(part_dir)
    bad_row = [tuple("###bad###" if f.name == "decision_id" else None
                     for f in stored.schema.fields)]
    spark.createDataFrame(bad_row, stored.schema).coalesce(1).write.mode(
        "append").parquet(part_dir)

    report = maintain_timeline(spark, path)
    assert len(report["quarantined"]) == 1
    assert report["groomed"] >= 1
    left = spark.read.parquet(path)
    assert left.where(F.col("decision_id") == "###bad###").count() == 0
    assert left.count() == 30  # one row per decision again
    # reward landed
    assert left.where(F.col("reward") == 1.0).count() == 10

    again = maintain_timeline(spark, path)
    assert again == {"quarantined": [], "groomed": 0}


def test_maintain_timeline_fresh_deployment(spark, tmp_path):
    """A first maintenance cycle on an absent timeline is a clean no-op
    (quarantine, groom and verify all tolerate the empty listing)."""
    from tracker_trainer_spark.ingest.groom import maintain_timeline

    report = maintain_timeline(spark, str(tmp_path / "never-written"))
    assert report == {"quarantined": [], "groomed": 0}
