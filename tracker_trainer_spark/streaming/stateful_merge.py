"""Stateful in-stream merge: the retention-bounded alternative to groom.

SURVEY §2.11 lists two honest designs for late rewards:
(a) append partial rows + batch groom repair (ingest_stream.py — matches
    the reference's unbounded "eventual consistency",
    reference: src/ingest/partition.py:448-453);
(b) keep per-decision state in the stream and emit merged rows, bounding
    reward lateness by a state timeout. This module is (b), built on
    ``applyInPandasWithState``: state is keyed by (model, decision_id),
    each micro-batch folds its records into the held partial record with
    exactly the J3 semantics (first-non-null payload columns, keyed
    last-win rewards union, recomputed reward sum), and the merged record
    is emitted on processing-time timeout — i.e. when no new partial has
    arrived for ``lateness``.

Trade-offs vs (a), stated for the 100 TB choice:
- state size = open decisions × ~1 row, sharded by the state-store
  partitioning — flat per executor, but rewards later than ``lateness``
  are DROPPED by design (the reference never drops; that's why (a) is
  the default path);
- output rows are final (no groom needed), so downstream consumers read
  a clean timeline with no repair pass.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

# held partial record per (model, decision_id); rewards as JSON string
# because state schemas cannot hold maps
STATE_SCHEMA = StructType([
    StructField("item", StringType()),
    StructField("context", StringType()),
    StructField("count", DoubleType()),
    StructField("sample", StringType()),
    StructField("rewards", StringType()),
])

MERGED_SCHEMA = StructType([
    StructField("model", StringType()),
    StructField("decision_id", StringType()),
    StructField("item", StringType()),
    StructField("context", StringType()),
    StructField("count", DoubleType()),
    StructField("sample", StringType()),
    StructField("rewards", StringType()),
    StructField("reward", DoubleType()),
])


def _fold(state_row: tuple | None, pdfs: list[pd.DataFrame]) -> tuple:
    """Fold micro-batch partials into the held record (J3 semantics)."""
    item, context, count, sample, rewards_json = state_row or (None, None, None, None, "{}")
    rewards: dict[str, Any] = json.loads(rewards_json or "{}")
    for pdf in pdfs:
        for _, r in pdf.iterrows():
            item = item if item is not None else _or_none(r.get("item"))
            context = context if context is not None else _or_none(r.get("context"))
            count = count if count is not None else _num_or_none(r.get("count"))
            sample = sample if sample is not None else _or_none(r.get("sample"))
            partial = json.loads(r["rewards"]) if r.get("rewards") else {}
            rewards.update(partial)  # keyed last-win, dict.update semantics
    return (item, context, count, sample, json.dumps(rewards, sort_keys=True))


def _or_none(v):
    return None if v is None or (isinstance(v, float) and pd.isna(v)) else v


def _num_or_none(v):
    return None if v is None or pd.isna(v) else float(v)


def make_merge_fn(lateness_ms: int):
    """Bind the lateness timeout into the state kernel."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        model, decision_id = key
        if state.hasTimedOut:
            item, context, count, sample, rewards_json = state.get
            rewards = json.loads(rewards_json or "{}")
            state.remove()
            yield pd.DataFrame([{
                "model": model, "decision_id": decision_id,
                "item": item, "context": context, "count": count,
                "sample": sample, "rewards": rewards_json,
                "reward": float(sum(rewards.values())),
            }], columns=[f.name for f in MERGED_SCHEMA.fields])
            return
        held = state.get if state.exists else None
        state.update(_fold(held, list(pdfs)))
        state.setTimeoutDuration(lateness_ms)
        yield pd.DataFrame(columns=[f.name for f in MERGED_SCHEMA.fields])

    return fn


def stateful_merge_stream(partials, lateness_ms: int = 60_000):
    """Partial rewarded-decision stream → merged-record stream.

    ``partials`` must carry (model, decision_id, item, context, count,
    sample, rewards-json). Emits one final merged row per decision,
    ``lateness_ms`` after its last partial arrived.
    """
    return (
        partials.groupBy("model", "decision_id")
        .applyInPandasWithState(
            make_merge_fn(lateness_ms),
            outputStructType=MERGED_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
