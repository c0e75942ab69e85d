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


def test_publish_archive_and_latest(spark, tmp_path):
    """S13: gzipped artifacts land in archive/{model}/{ts}/ and latest/
    is atomically replaced on re-publish."""
    import gzip
    import json
    import os

    from tracker_trainer_spark.trainer.artifacts import (
        METADATA_FILE,
        publish_model,
        save_model,
    )
    from tracker_trainer_spark.trainer.train import TrainedModel

    class _FakeWriter:
        def overwrite(self):
            return self

        def save(self, path):
            os.makedirs(path, exist_ok=True)
            with open(os.path.join(path, "data"), "w") as f:
                f.write("weights")

    class _FakeModel:
        def write(self):
            return _FakeWriter()

    art = str(tmp_path / "art")
    repo = str(tmp_path / "repo")
    tm = TrainedModel(model=_FakeModel(), feature_names=["a"],
                      string_tables={}, model_seed=1)
    save_model(tm, art, model_name="bandit")
    archive1 = publish_model(art, repo, "bandit")

    latest = os.path.join(repo, "models", "latest", "bandit")
    with gzip.open(os.path.join(latest, METADATA_FILE + ".gz")) as f:
        meta = json.load(f)
    assert meta["model_name"] == "bandit"
    assert os.path.exists(os.path.join(archive1, METADATA_FILE + ".gz"))
    assert os.path.exists(os.path.join(latest, "model", "data.gz"))
    assert os.path.islink(latest)  # atomic-swap symlink, never a half dir

    # immediate re-publish → distinct archive (ms stamp), latest re-targets
    save_model(tm, art, model_name="bandit")
    archive2 = publish_model(art, repo, "bandit")
    assert archive2 != archive1
    assert os.path.exists(archive1) and os.path.exists(archive2)
    assert os.path.realpath(latest) == os.path.realpath(archive2)
    assert not os.path.exists(os.path.join(repo, "models", "latest", ".bandit.tmp"))


def test_publish_same_tick_never_merges(tmp_path):
    """Fifty publishes of an artifact with the SAME created_at (the
    worst-case stamp collision — r8's red test saw two save_model calls
    land in one millisecond) must produce fifty distinct archive dirs via
    the -N de-collision suffix, with latest tracking the final one."""
    from tracker_trainer_spark.trainer.artifacts import (
        METADATA_FILE,
        publish_model,
    )

    art = str(tmp_path / "art")
    os.makedirs(art)
    with open(os.path.join(art, METADATA_FILE), "w") as f:
        json.dump({"created_at": time.time()}, f)
    with open(os.path.join(art, "model.bin"), "wb") as f:
        f.write(b"\x00" * 64)

    repo = str(tmp_path / "repo")
    dirs = [publish_model(art, repo, "m") for _ in range(50)]
    assert len(set(dirs)) == 50
    for d in dirs:
        assert os.path.exists(os.path.join(d, "model.bin.gz"))
    latest = os.path.join(repo, "models", "latest", "m")
    assert os.path.realpath(latest) == os.path.realpath(dirs[-1])
