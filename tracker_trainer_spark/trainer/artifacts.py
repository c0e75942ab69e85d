"""Model artifacts: save / load / checkpoint reuse (M5/M6).

Reference semantics:
- export embeds metadata (model name, feature names, string tables,
  seed, created_at, version) in the booster attributes and writes both
  `.xgb` and `.mlmodel` artifacts (reference:
  src/trainer/code/model_utils.py:174-321);
- the trainer reuses phase-1's checkpointed booster when the stored
  version matches and the artifact is younger than
  ``max_checkpoint_age`` (reference: src/trainer/code/checkpoint.py:26-150).

Here the artifact is a directory:
  metadata.json   — the TrainedModel fields + version + created_at
  model/          — the fitted estimator (xgboost native format when the
                    xgboost backend is active, Spark ML writer otherwise)

All driver-side by design (the reference's export is too); the only
data-derived payloads are capped structures (string tables ≤10k
entries/feature, feature names ≤max_features).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession

from ..hashing import STRING_HASH_NAME
from .train import HAS_XGBOOST, TrainedModel

ARTIFACT_VERSION = "1"
METADATA_FILE = "metadata.json"
MODEL_DIR = "model"


def save_model(tm: TrainedModel, path: str, model_name: str = "model") -> None:
    """Persist a TrainedModel as a metadata.json + backend model dir."""
    os.makedirs(path, exist_ok=True)
    created_at = time.time()
    meta = {
        "version": ARTIFACT_VERSION,
        "created_at": created_at,
        "model_name": model_name,
        "feature_names": tm.feature_names,
        "string_tables": tm.string_tables,
        "model_seed": tm.model_seed,
        "mean_item_count": tm.mean_item_count,
        "metadata": tm.metadata,
        "backend": "xgboost" if HAS_XGBOOST else "spark-ml",
        "string_hash": STRING_HASH_NAME,
    }
    model_path = os.path.join(path, MODEL_DIR)
    if HAS_XGBOOST:
        # client artifacts: metadata-embedded model.xgb (+ model.mlmodel
        # when coremltools is importable) — reference model_utils.py:275-321.
        # ONE created_at for metadata.json and the embedded ai.improve
        # stamp (UTC ISO of the same epoch); feature names passed
        # explicitly — a SparkXGB booster trains on one vector column
        # and carries none of its own.
        from datetime import datetime, timezone

        from .export import export_client_artifacts

        export_client_artifacts(
            tm.model.get_booster(), path, model_name,
            tm.string_tables, tm.model_seed,
            created_at=datetime.fromtimestamp(
                created_at, timezone.utc).isoformat(),
            mean_item_count=tm.mean_item_count,
            feature_names=tm.feature_names,
        )
    tm.model.write().overwrite().save(model_path)
    # metadata.json is the COMMIT MARKER and must be written LAST: a
    # crash between a fresh metadata and the (stale) model dir would
    # otherwise leave a checkpoint whose seed/tables pass the
    # load_checkpoint_if_fresh gate while the trees underneath belong to
    # the previous train — silently-wrong propensities downstream.
    with open(os.path.join(path, METADATA_FILE), "w") as f:
        json.dump(meta, f, sort_keys=True)


def load_model(spark: SparkSession, path: str) -> TrainedModel:
    """Load a saved artifact back into a TrainedModel."""
    with open(os.path.join(path, METADATA_FILE)) as f:
        meta = json.load(f)
    stored_hash = meta.get("string_hash", STRING_HASH_NAME)
    if stored_hash != STRING_HASH_NAME:
        # a table built under one hash decodes to garbage under the other
        raise ValueError(
            f"artifact string tables were built with {stored_hash}, but this "
            f"environment hashes with {STRING_HASH_NAME} (install/remove the "
            "xxhash package to match)"
        )
    model_path = os.path.join(path, MODEL_DIR)
    objective = meta["metadata"].get("objective", "regression")
    if meta["backend"] == "xgboost":
        from xgboost.spark import (  # type: ignore
            SparkXGBClassifierModel,
            SparkXGBRegressorModel,
        )

        cls = SparkXGBClassifierModel if objective == "binary" else SparkXGBRegressorModel
    else:
        from pyspark.ml.classification import GBTClassificationModel
        from pyspark.ml.regression import GBTRegressionModel

        cls = GBTClassificationModel if objective == "binary" else GBTRegressionModel
    fitted = cls.load(model_path)
    return TrainedModel(
        model=fitted,
        feature_names=meta["feature_names"],
        string_tables={k: list(v) for k, v in meta["string_tables"].items()},
        model_seed=meta["model_seed"],
        mean_item_count=meta["mean_item_count"],
        metadata=meta["metadata"],
    )


def load_checkpoint_if_fresh(spark: SparkSession, path: str,
                             max_age_seconds: float,
                             model_name: str | None = None,
                             model_seed: int | None = None) -> TrainedModel | None:
    """Checkpoint fast-path: reuse the stored model when the artifact
    version matches and it is younger than ``max_age_seconds``
    (reference: src/trainer/code/checkpoint.py:26-91).

    ``model_name`` / ``model_seed``: when given, the checkpoint must
    also have been trained for the SAME model and seed — a shared
    checkpoint dir must never hand model "b" model "a"'s propensity
    model (wrong distribution, wrong string tables, wrong IPW)."""
    meta_path = os.path.join(path, METADATA_FILE)
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("version") != ARTIFACT_VERSION:
        return None
    if time.time() - meta.get("created_at", 0) > max_age_seconds:
        return None
    if model_name is not None and meta.get("model_name") != model_name:
        return None
    if model_seed is not None and meta.get("model_seed") != model_seed:
        return None
    try:
        return load_model(spark, path)
    except Exception:
        return None  # unreadable checkpoint == no checkpoint (retrain)


def publish_model(artifact_dir: str, repo_dir: str, model_name: str) -> str:
    """S13: publish a saved artifact to the model repository layout.

    Mirrors the reference's unpack step (reference:
    src/train/unpack_models.py:12-97): each artifact file is gzipped and
    written to ``models/archive/{model}/{created_at}/``, and
    ``models/latest/{model}`` is a symlink to the archive swapped by an
    atomic rename — a directory can't be replaced atomically on POSIX,
    a symlink can, so readers always resolve a complete publish (old or
    new, never absent or half-written). Returns the archive directory.

    The stamp carries microsecond precision, and an existing archive
    directory forces a ``-N`` de-collision suffix: two publishes of
    artifacts created within the same tick must land in distinct archive
    directories, not silently merge (the reference de-collides partition
    filenames the same way, with a uuid4 component — reference:
    src/ingest/partition.py:88-91).

    Driver-side by design: artifacts are capped driver-side structures
    (the reference publishes from a single Lambda for the same reason).
    """
    import gzip
    import shutil

    with open(os.path.join(artifact_dir, METADATA_FILE)) as f:
        created_at = json.load(f)["created_at"]
    stamp = time.strftime("%Y%m%dT%H%M%S", time.gmtime(created_at))
    stamp += f".{int(created_at * 1_000_000) % 1_000_000:06d}Z"

    base = os.path.join(repo_dir, "models", "archive", model_name, stamp)
    archive, suffix = base, 0
    while True:
        try:
            os.makedirs(archive)
            break
        except FileExistsError:
            # Same created_at tick (or a re-publish of the same artifact):
            # never merge into an existing archive dir — take the next
            # free "-N" suffix. makedirs without exist_ok is the atomic
            # claim, so two racing publishers cannot pick the same dir.
            suffix += 1
            archive = f"{base}-{suffix}"
    for root, _dirs, files in os.walk(artifact_dir):
        rel = os.path.relpath(root, artifact_dir)
        for fn in files:
            dst_dir = os.path.join(archive, rel) if rel != "." else archive
            os.makedirs(dst_dir, exist_ok=True)
            with open(os.path.join(root, fn), "rb") as src, gzip.open(
                os.path.join(dst_dir, fn + ".gz"), "wb"
            ) as dst:
                shutil.copyfileobj(src, dst)

    latest_dir = os.path.join(repo_dir, "models", "latest")
    os.makedirs(latest_dir, exist_ok=True)
    latest = os.path.join(latest_dir, model_name)
    tmp_link = os.path.join(latest_dir, f".{model_name}.tmp")
    try:
        os.remove(tmp_link)
    except OSError:
        pass
    os.symlink(os.path.relpath(archive, latest_dir), tmp_link)
    if os.path.isdir(latest) and not os.path.islink(latest):
        shutil.rmtree(latest)  # migrate a pre-symlink directory layout
    os.rename(tmp_link, latest)  # atomic swap over any previous symlink
    return archive
