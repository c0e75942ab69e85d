"""transformWithState running user totals: stream output must equal the
one-shot batch aggregate after all micro-batches fold in.

The whole suite is gated on ``google.protobuf`` — Spark's
transformWithState Python runner speaks protobuf to the state server,
and the package is absent in this container (same import-gate pattern
as xgboost/coremltools; the processor logic itself is covered by the
dependency-free unit test below)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tracker_trainer_spark.streaming.user_state import (
    UserEngagementProcessor,
    user_engagement_stream,
)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class _FakeValueState:
    def __init__(self):
        self._v = None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()
        self.ttl = "unset"

    def getValueState(self, name, schema, ttlDurationMs=None):
        self.ttl = ttlDurationMs
        return self.state


def test_processor_folds_running_totals():
    """Dependency-free check of the fold semantics: counts accumulate
    across batches, only purchase values sum, NULL values count 0."""
    p = UserEngagementProcessor(ttl_ms=60_000)
    h = _FakeHandle()
    p.init(h)
    assert h.ttl == 60_000
    b1 = pd.DataFrame(
        {"user_id": [1, 1], "event_type": ["view", "purchase"],
         "value": [None, 10.0]}
    )
    (out1,) = p.handleInputRows((1,), iter([b1]), None)
    assert out1["n_events"].iloc[0] == 2
    assert out1["purchase_value"].iloc[0] == 10.0
    b2 = pd.DataFrame(
        {"user_id": [1], "event_type": ["purchase"], "value": [2.5]}
    )
    (out2,) = p.handleInputRows((1,), iter([b2]), None)
    assert out2["n_events"].iloc[0] == 3
    assert out2["purchase_value"].iloc[0] == 12.5


@pytest.fixture()
def rocksdb_state(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB)
    yield
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def _write_batch(src, name, rows):
    pd.DataFrame(rows).to_json(f"{src}/{name}.json", orient="records", lines=True)


def test_stream_totals_match_batch_aggregate(spark, tmp_path, rocksdb_state):
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's Python runner requires protobuf",
    )
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    os.makedirs(src)
    b1 = [
        {"user_id": 1, "event_type": "view", "value": None},
        {"user_id": 1, "event_type": "purchase", "value": 10.0},
        {"user_id": 2, "event_type": "click", "value": None},
    ]
    b2 = [
        {"user_id": 1, "event_type": "purchase", "value": 2.5},
        {"user_id": 2, "event_type": "purchase", "value": 4.0},
        {"user_id": 3, "event_type": "view", "value": None},
    ]
    _write_batch(src, "b1", b1)
    _write_batch(src, "b2", b2)

    schema = "user_id BIGINT, event_type STRING, value DOUBLE"
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).json(src)
    out = user_engagement_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # LAST update per user is the running total after all batches
    updates = spark.sql("SELECT * FROM user_totals").toPandas()
    final = (
        updates.groupby("user_id").last().reset_index()
        .sort_values("user_id").reset_index(drop=True)
    )
    batch = (
        spark.createDataFrame(pd.DataFrame(b1 + b2), schema)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value"))
                .otherwise(0.0)
            ).alias("purchase_value"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert final["n_events"].tolist() == batch["n_events"].tolist()
    assert final["purchase_value"].tolist() == batch["purchase_value"].tolist()
    # user 1 got updates in BOTH micro-batches (running, not per-batch)
    assert (updates["user_id"] == 1).sum() == 2
