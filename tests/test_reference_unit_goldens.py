"""Unit-level parity with the reference's golden fixtures.

1. Per-group merge cases (_merge_many_records_group_*.json,
   _merge_single_record_groups_*.json): rows in DF_SCHEMA order
   [decision_id, item, context, count, sample, rewards, reward] merge to
   the expected single rows
   (reference: tests/tracker/test_partitions.py and
   src/ingest/partition.py:155-268).
2. KSUID codec vectors (tests/tracker/ksuid.json): (timestamp, 16-byte
   payload) → base62, and base62 → timestamp round-trip
   (reference: tests/tracker/generate_ksuid_json_data.py).
"""

from __future__ import annotations

import base64
import datetime
import glob
import json
import math
import os

import pytest

from tracker_trainer_spark.ingest.merge import (
    finalize_for_storage,
    merge_rewarded_decisions,
    parse_stored,
)
from tracker_trainer_spark import ksuid as K

CASES_DIR = "/root/reference/tests/test_cases/tracker_test_cases"
KSUID_JSON = "/root/reference/tests/tracker/ksuid.json"
RD_SCHEMA = ("decision_id string, item string, context string, "
             "count double, sample string, rewards string, reward double")

# only the cases the reference's own test suite wires up (groups 1-8 and
# the four single-record cases — tests/tracker/test_partitions.py). Cases
# 9-14 exist on disk but are referenced by no test, and their expected
# outputs contradict their own slices (e.g. case 9 expects rewards from
# rows outside [start, end)), so they are excluded as dead fixtures.
_group_cases = sorted(
    glob.glob(os.path.join(CASES_DIR, "_merge_many_records_group_[1-8].json"))
    + glob.glob(os.path.join(CASES_DIR, "_merge_single_record_groups_*.json"))
)


def _norm(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, str) and v[:1] in "{[":
        return json.dumps(json.loads(v), sort_keys=True)
    return v


@pytest.mark.skipif(not _group_cases, reason="reference fixtures absent")
@pytest.mark.parametrize("case_file", _group_cases,
                         ids=[os.path.basename(p) for p in _group_cases])
def test_reference_merge_group_golden(spark, case_file):
    case = json.load(open(case_file))
    records = case["test_case"]["records"]
    start = case["test_case"].get("group_slice_start", 0)

    if isinstance(records, str):
        # records names a gz JSONL batch: slice the projected rewarded-
        # decision rows in decision_id-sorted order (stable within a key,
        # preserving file order), like the reference's sort()+slice
        # (src/ingest/partition.py:94-97,111-153)
        from tracker_trainer_spark.ingest.project import to_rewarded_decisions
        from tracker_trainer_spark.ingest.reader import (
            parse_track_records,
            read_track_lines,
        )
        from tracker_trainer_spark.ingest.validate import split_valid

        gz = os.path.join(os.path.dirname(CASES_DIR), "data", "merge", records)
        raw = read_track_lines(spark, gz)
        valid, _ = split_valid(parse_track_records(raw))
        projected = finalize_for_storage(
            to_rewarded_decisions(valid, keep_model=False)
        ).toPandas()
        projected = projected.sort_values("decision_id", kind="stable")
        end = case["test_case"].get("group_slice_end", len(projected))
        rows = [
            tuple(
                None if isinstance(v, float) and math.isnan(v) else v
                for v in r
            )
            for r in projected.iloc[start:end].itertuples(index=False, name=None)
        ]
    else:
        end = case["test_case"].get("group_slice_end", len(records))
        rows = [tuple(r) for r in records[start:end]]

    df = spark.createDataFrame(rows, RD_SCHEMA)
    merged = finalize_for_storage(merge_rewarded_decisions(parse_stored(df)))
    got = sorted(
        (tuple(_norm(v) for v in r) for r in merged.collect()),
        key=lambda t: t[0],
    )
    want = sorted(
        (tuple(_norm(v) for v in r) for r in case["expected_output"]),
        key=lambda t: t[0],
    )
    assert got == want, f"{os.path.basename(case_file)}:\n got {got}\nwant {want}"


@pytest.mark.skipif(not os.path.exists(KSUID_JSON), reason="reference fixtures absent")
def test_reference_ksuid_vectors():
    vectors = json.load(open(KSUID_JSON))
    assert vectors
    lo, hi = K.KSUID_EPOCH, K.KSUID_EPOCH + (1 << 32) - 1
    for v in vectors:
        ts = datetime.datetime.fromisoformat(v["timestamp"]).replace(
            tzinfo=datetime.timezone.utc
        ).timestamp()
        # the reference generator clamps out-of-range timestamps to the
        # KSUID extremes before encoding (generate_ksuid_json_data.py)
        clamped = min(max(ts, lo), hi)
        payload = base64.b64decode(v["uid_base64"])
        assert K.from_parts(clamped, payload) == v["ksuid_base62"], v
        assert K.timestamp_of(v["ksuid_base62"]) == clamped, v
        assert K.is_valid(v["ksuid_base62"], now=clamped + 1), v
