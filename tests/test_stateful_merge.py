"""Stateful in-stream merge (applyInPandasWithState): partial records
fold into per-decision state; the final merged row emits on timeout."""

import json
import time

import pytest
from pyspark.sql import functions as F

from tracker_trainer_spark.streaming.stateful_merge import (
    MERGED_SCHEMA,
    _fold,
    stateful_merge_stream,
)

import pandas as pd


def test_fold_first_non_null_and_last_win_rewards():
    state = None
    b1 = pd.DataFrame([
        {"item": '{"x":1}', "context": None, "count": 2.0, "sample": None, "rewards": None},
        {"item": None, "context": None, "count": None, "sample": None, "rewards": '{"r1": 1.0}'},
    ])
    state = _fold(state, [b1])
    assert state[0] == '{"x":1}' and state[2] == 2.0
    assert json.loads(state[4]) == {"r1": 1.0}
    # later batch: duplicate reward id overrides (last-win), payload kept
    b2 = pd.DataFrame([
        {"item": None, "context": None, "count": None, "sample": None, "rewards": '{"r1": 9.0, "r2": 0.5}'},
    ])
    state = _fold(state, [b2])
    assert state[0] == '{"x":1}'
    assert json.loads(state[4]) == {"r1": 9.0, "r2": 0.5}


def test_fold_is_idempotent():
    b = pd.DataFrame([
        {"item": '{"a":1}', "context": "{}", "count": 1.0, "sample": None, "rewards": '{"r": 2.0}'},
    ])
    once = _fold(None, [b])
    twice = _fold(once, [b])
    assert once == twice


def test_stateful_stream_emits_merged_row_after_timeout(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    import os
    os.makedirs(src)

    def write_batch(name, rows):
        pd.DataFrame(rows).to_json(f"{src}/{name}.json", orient="records", lines=True)

    write_batch("b1", [
        {"model": "m1", "decision_id": "d1", "item": '{"x":1}', "context": None,
         "count": 2.0, "sample": None, "rewards": None},
        {"model": "m1", "decision_id": "d1", "item": None, "context": None,
         "count": None, "sample": None, "rewards": '{"r1": 1.5}'},
    ])

    schema = ("model string, decision_id string, item string, context string, "
              "count double, sample string, rewards string")
    partials = spark.readStream.schema(schema).json(src)
    merged = stateful_merge_stream(partials, lateness_ms=3_000)
    q = (merged.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(processingTime="1 second").outputMode("append").start())
    try:
        # wait for the timeout to fire and the merged row to appear; new
        # batches keep the trigger advancing state timeouts
        deadline = time.time() + 240
        rows = []
        tick = 0
        while time.time() < deadline and not rows:
            time.sleep(2)
            tick += 1
            write_batch(f"tick{tick}", [
                {"model": "m1", "decision_id": f"keepalive{tick}", "item": "{}",
                 "context": None, "count": 1.0, "sample": None, "rewards": None},
            ])
            try:
                rows = (spark.read.schema(MERGED_SCHEMA).parquet(out)
                        .where(F.col("decision_id") == "d1").collect())
            except Exception:
                rows = []
    finally:
        q.stop()
    assert rows, "merged row for d1 never emitted"
    (r,) = rows
    assert r.item == '{"x":1}' and r["count"] == 2.0
    assert json.loads(r.rewards) == {"r1": 1.5} and r.reward == 1.5
