"""E2E merge parity against the reference's own golden fixtures.

Each case JSON under the reference's tracker_test_cases names a gzipped
JSONL track batch, optional pre-merged parquet per model, and the
expected merged frame per model
(reference: tests/tracker/test_merge_rewarded_decisions.py:281-340,
tests/test_cases/data/merge/*). We run the same inputs through OUR
pipeline (read → validate → project → union stored → merge → finalize)
and compare frame-for-frame.

JSON-string columns (item/context/sample/rewards) are compared as parsed
values, not raw strings: the reference serializes with orjson sorted
keys, and byte-level parity of key order is a non-goal (our sink sorts
map keys too, but dict key order inside item/context is preserved from
the producer, not canonicalized).
"""

from __future__ import annotations

import glob
import json
import math
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tracker_trainer_spark.ingest.merge import (
    finalize_for_storage,
    merge_rewarded_decisions,
    parse_stored,
)
from tracker_trainer_spark.ingest.project import to_rewarded_decisions
from tracker_trainer_spark.ingest.reader import parse_track_records, read_track_lines
from tracker_trainer_spark.ingest.validate import split_valid

CASES_DIR = "/root/reference/tests/test_cases/tracker_test_cases"
DATA_DIR = "/root/reference/tests/test_cases/data/merge"
CANONICAL = ["decision_id", "item", "context", "count", "sample", "rewards", "reward"]

_case_files = sorted(
    glob.glob(os.path.join(CASES_DIR, "single_model_merge_*.json"))
    + glob.glob(os.path.join(CASES_DIR, "multiple_models_merge_*.json"))
)


def _norm_json(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return ("absent",)
    return ("json", json.dumps(json.loads(v), sort_keys=True))


def _norm_rewards(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return {}
    return {k: float(x) for k, x in json.loads(v).items()}


def _norm_num(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    return round(float(v), 9)


def _normalize(df: pd.DataFrame) -> list[dict]:
    rows = []
    for r in df.sort_values("decision_id").to_dict("records"):
        rows.append({
            "decision_id": r["decision_id"],
            "item": _norm_json(r["item"]),
            "context": _norm_json(r["context"]),
            "count": _norm_num(r["count"]),
            "sample": _norm_json(r["sample"]),
            "rewards": _norm_rewards(r["rewards"]),
            "reward": _norm_num(r["reward"]),
        })
    return rows


@pytest.mark.skipif(not _case_files, reason="reference fixtures absent")
@pytest.mark.parametrize("case_file", _case_files,
                         ids=[os.path.basename(p) for p in _case_files])
def test_reference_merge_golden(spark, case_file):
    case_json = json.load(open(case_file))
    case = case_json["test_case"]
    model_names = case["model_names"]
    merged_keys = case.get("merged_s3_keys") or [None] * len(model_names)
    expected_files = case_json["expected_outputs_files"]

    raw = read_track_lines(spark, os.path.join(DATA_DIR, case["gzipped_records"]))
    parsed = parse_track_records(raw)
    valid, invalid = split_valid(parsed)
    assert invalid.count() == 0, "golden inputs are all valid"
    projected = to_rewarded_decisions(valid)

    for model, stored_file, expected_file in zip(model_names, merged_keys, expected_files):
        new_rows = projected.where(F.col("model") == model).drop("model")
        if stored_file is not None:
            stored = (
                spark.read.parquet(os.path.join(DATA_DIR, stored_file))
                .select(CANONICAL)  # tolerate extra columns, like the
                # reference's fixed-column read (src/ingest/partition.py:359)
            )
            new_rows = parse_stored(stored).unionByName(new_rows)
        merged = finalize_for_storage(merge_rewarded_decisions(new_rows))

        got = _normalize(merged.toPandas())
        want = _normalize(pd.read_parquet(os.path.join(DATA_DIR, expected_file)))
        assert len(got) == len(want), (
            f"{os.path.basename(case_file)}/{model}: {len(got)} rows != {len(want)}"
        )
        for g, w in zip(got, want):
            assert g == w, (
                f"{os.path.basename(case_file)}/{model}:\n got {g}\nwant {w}"
            )
