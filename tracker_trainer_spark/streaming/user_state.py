"""Arbitrary stateful streaming with the Spark 4 ``transformWithState``
API: a per-user running engagement aggregate with optional state TTL.

This is the third point on the engine's custom-stateful-operator
spectrum (SURVEY §2.11):
(a) append + batch groom repair        — ingest_stream.py (default)
(b) applyInPandasWithState + timeout   — stateful_merge.py
(c) transformWithStateInPandas         — THIS MODULE: typed named state
    (ValueState), per-state TTL, timers, and initial-state support —
    the API Spark 4 positions as the successor to (b).

The operator keeps one ValueState row per user — (n_events,
purchase_value) — folds each micro-batch's Arrow chunk in vectorized
pandas, and emits the updated running row per key per batch
(outputMode=Update). TTL evicts idle users' state, bounding the store
at ~active-user cardinality instead of all-time users: the same
retention trade-off as (b), expressed declaratively instead of via a
hand-rolled timeout.

Scale: state is sharded by the user key across the state store's
partitions (RocksDB-backed — required by the API and the right choice
past memory-sized state); per-batch work is one Arrow pass per updated
key group. The batch-parity contract (stream totals == one batch
groupBy) is pinned in tests/test_user_state.py — SKIPPED in this
container because Spark's transformWithState Python runner needs
``google.protobuf`` (absent here; the same import-gate posture as
xgboost/coremltools). The fold semantics are covered by a
dependency-free unit test either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, purchase_value DOUBLE"
STATE_SCHEMA = "n_events BIGINT, purchase_value DOUBLE"


class UserEngagementProcessor(StatefulProcessor):
    """Running (event count, purchase value) per user.

    ``ttl_ms``: evict a user's state after that long without an update
    (None = keep forever)."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        cur = self._totals.get()
        n, v = (int(cur[0]), float(cur[1])) if cur is not None else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            purch = pdf.loc[pdf["event_type"] == "purchase", "value"]
            v += float(purch.fillna(0.0).sum())
        self._totals.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "purchase_value": [v]}
        )

    def close(self) -> None:
        pass


def user_engagement_stream(events, ttl_ms: int | None = None):
    """events (stream or batch DataFrame with user_id/event_type/value)
    → running per-user totals, one updated row per key per micro-batch.

    Requires the RocksDB state store provider (the transformWithState
    backend): set
    ``spark.sql.streaming.stateStore.providerClass=
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``.
    """
    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            UserEngagementProcessor(ttl_ms),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="ProcessingTime",
        )
    )
