"""M5/M6: model save → load round-trip and checkpoint freshness."""

import json
import os
import time

import pytest

from tracker_trainer_spark.trainer.artifacts import (
    METADATA_FILE,
    load_checkpoint_if_fresh,
    load_model,
    save_model,
)
from tracker_trainer_spark.trainer.train import train_propensity_model


@pytest.fixture(scope="module")
def prop_model(spark, timeline):
    return train_propensity_model(
        spark, timeline, model_seed=1, model="m1", max_features=50, explore=False
    )


def test_save_load_roundtrip(spark, prop_model, tmp_path):
    path = str(tmp_path / "artifact")
    save_model(prop_model, path, model_name="m1")
    loaded = load_model(spark, path)
    assert loaded.feature_names == prop_model.feature_names
    assert loaded.string_tables == prop_model.string_tables
    assert loaded.model_seed == prop_model.model_seed
    assert loaded.mean_item_count == prop_model.mean_item_count
    # loaded estimator predicts (same class of model, usable in scoring)
    assert type(loaded.model).__name__ == type(prop_model.model).__name__


def test_checkpoint_freshness(spark, prop_model, tmp_path):
    path = str(tmp_path / "ckpt")
    save_model(prop_model, path, model_name="m1")
    assert load_checkpoint_if_fresh(spark, path, max_age_seconds=3600) is not None
    # age it out
    meta_file = os.path.join(path, METADATA_FILE)
    meta = json.load(open(meta_file))
    meta["created_at"] = time.time() - 7200
    json.dump(meta, open(meta_file, "w"))
    assert load_checkpoint_if_fresh(spark, path, max_age_seconds=3600) is None
    # version mismatch also invalidates
    meta["created_at"] = time.time()
    meta["version"] = "0"
    json.dump(meta, open(meta_file, "w"))
    assert load_checkpoint_if_fresh(spark, path, max_age_seconds=3600) is None


def test_missing_checkpoint_is_none(spark, tmp_path):
    assert load_checkpoint_if_fresh(spark, str(tmp_path / "nope"), 3600) is None
