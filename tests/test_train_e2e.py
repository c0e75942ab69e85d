"""End-to-end: synthetic track records → ingest → timeline → two-phase
train (fallback backend when xgboost is absent) → propensity scoring."""

import json
import random

import pytest
from pyspark.sql import functions as F

from tracker_trainer_spark import ksuid
from tracker_trainer_spark.ingest import (
    finalize_for_storage,
    merge_rewarded_decisions,
    parse_track_records,
    split_valid,
    to_rewarded_decisions,
    write_timeline,
)
from tracker_trainer_spark.ingest.reader import read_track_lines
from tracker_trainer_spark.trainer.train import train_two_phase, propensity_scores

TS = 1650000000


@pytest.fixture(scope="module")
def timeline(spark, tmp_path_factory):
    rng = random.Random(7)
    lines = []
    for i in range(120):
        did = ksuid.deterministic_ksuid(TS + i * 60, i)
        item = {"song": rng.choice(["a", "b", "c", "d"]), "tempo": rng.randint(60, 180)}
        ctx = {"os": rng.choice(["ios", "android"]), "hour": rng.randint(0, 23)}
        count = rng.randint(1, 5)
        rec = {"message_id": did, "model": "m1", "count": count,
               "item": item, "context": ctx}
        if count > 1:
            rec["sample"] = {"song": rng.choice(["a", "b", "c", "d"]),
                             "tempo": rng.randint(60, 180)}
        lines.append(json.dumps(rec))
        if rng.random() < 0.5:
            rid = ksuid.deterministic_ksuid(TS + i * 60 + 30, 10_000 + i)
            lines.append(json.dumps({
                "message_id": rid, "model": "m1", "decision_id": did,
                "reward": round(rng.uniform(0, 10), 2),
            }))
    path = str(tmp_path_factory.mktemp("ingest") / "batch.jsonl")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    table = str(tmp_path_factory.mktemp("tl") / "rewarded_decisions")
    parsed = parse_track_records(read_track_lines(spark, path))
    valid, invalid = split_valid(parsed)
    assert invalid.count() == 0
    merged = finalize_for_storage(
        merge_rewarded_decisions(to_rewarded_decisions(valid), ("model", "decision_id"))
    )
    write_timeline(merged, table)
    return table


def test_two_phase_train_and_score(spark, timeline):
    prop, dec = train_two_phase(
        spark, timeline, model_seed=1, model="m1", max_features=50, explore=False
    )
    assert prop.mean_item_count >= 1.0
    assert "t" in prop.feature_names and "t" in dec.feature_names
    assert any(f.startswith("item.") for f in prop.feature_names)
    assert any(f.startswith("context.") for f in prop.feature_names)
    # string features got tables only if they survived the count>20 prune
    for feat, table in {**prop.string_tables, **dec.string_tables}.items():
        assert len(table) >= 1

    # phase-2 model predicts finite values on its own training frame shape
    from tracker_trainer_spark.trainer.encode import encode_to_vectors, TIMESTAMP_KEY
    from tracker_trainer_spark.trainer.flatten import flatten_col
    from tracker_trainer_spark.ksuid import ksuid_timestamp
    from tracker_trainer_spark.trainer.loader import load_training_frame

    df = load_training_frame(spark, timeline, columns=["decision_id", "item", "context"], model="m1")
    flat = (
        df.withColumn("_i", flatten_col("item", "item"))
        .withColumn("_c", flatten_col("context", "context"))
        .withColumn(TIMESTAMP_KEY, ksuid_timestamp(F.col("decision_id")))
        .select(
            "decision_id", TIMESTAMP_KEY,
            F.map_concat(F.col("_c")["num"], F.col("_i")["num"]).alias("num_features"),
            F.map_concat(F.col("_c")["str"], F.col("_i")["str"]).alias("str_features"),
        )
    )
    enc = encode_to_vectors(
        flat, [f for f in prop.feature_names if f != TIMESTAMP_KEY],
        prop.string_tables, prop.model_seed,
    )
    scored = propensity_scores(prop, enc)
    rows = scored.select("propensity").collect()
    assert len(rows) == df.count()
    assert all(0.0 <= r["propensity"] <= 1.0 for r in rows)
