"""Client-facing model export (M6): booster-attr metadata + CoreML.

Reference semantics (reference: src/trainer/code/model_utils.py:174-321):

- ``append_metadata_to_booster`` embeds one JSON attribute
  ``user_defined_metadata`` on the XGBoost booster carrying the
  ``ai.improve.*`` keys (model name, feature names, string tables, seed,
  created_at, version, optional mean_item_count);
- ``transform_model`` converts the booster to a CoreML regressor
  (``force_32bit_float``), writes the same metadata (string tables
  JSON-encoded, seed stringified) into the MLModel's
  ``user_defined_metadata``, and cross-checks that feature-name order is
  identical in the booster, its metadata, and the MLModel spec;
- the trainer then saves ``model.xgb`` + ``model.mlmodel``
  (reference: src/trainer/code/decision_trainer.py:30-36).

Neither ``xgboost`` nor ``coremltools`` ships in this container, so the
library touchpoints are import-gated: the metadata construction,
validation, and attach logic are pure / duck-typed (tested against
fakes), and the CoreML conversion raises a clear error when the package
is absent instead of failing deep inside an import.
"""

from __future__ import annotations

import json
from datetime import datetime

MODEL_NAME_METADATA_KEY = "ai.improve.model"
FEATURE_NAMES_METADATA_KEY = "ai.improve.features"
STRING_TABLES_METADATA_KEY = "ai.improve.string_tables"
MODEL_SEED_METADATA_KEY = "ai.improve.seed"
CREATED_AT_METADATA_KEY = "ai.improve.created_at"
VERSION_METADATA_KEY = "ai.improve.version"
MEAN_ITEM_COUNT_METADATA_KEY = "ai.improve.mean_item_count"
USER_DEFINED_METADATA_KEY = "user_defined_metadata"

# reference: src/trainer/code/config.py:9 — clients key on this string
REFERENCE_VERSION = "8.0.0"
MLMODEL_REGRESSOR_MODE = "regressor"


def _json_compact(obj) -> str:
    """orjson-compatible encoding (compact separators, insertion order) —
    the reference dumps metadata with orjson (model_utils.py:244)."""
    return json.dumps(obj, separators=(",", ":"))


def check_user_defined_metadata(meta: dict) -> None:
    """Reference validation (model_utils.py:130-171): required keys
    present, typed, created_at ISO-parseable; feature names, when
    present, a non-empty list."""
    required = [
        (MODEL_NAME_METADATA_KEY, str),
        (STRING_TABLES_METADATA_KEY, dict),
        (MODEL_SEED_METADATA_KEY, int),
        (CREATED_AT_METADATA_KEY, str),
        (VERSION_METADATA_KEY, str),
    ]
    for key, typ in required:
        val = meta.get(key)
        assert val is not None and isinstance(val, typ), (
            f"Bad metadata value: {val} stored under {key} key"
        )
        if key == CREATED_AT_METADATA_KEY:
            datetime.fromisoformat(val)
    if FEATURE_NAMES_METADATA_KEY in meta:
        names = meta[FEATURE_NAMES_METADATA_KEY]
        assert isinstance(names, list) and len(names) > 0, (
            f"Bad metadata value: {names} stored under {FEATURE_NAMES_METADATA_KEY} key"
        )


def build_booster_metadata(model_name: str, feature_names: list[str],
                           string_tables: dict, model_seed: int,
                           created_at: str,
                           mean_item_count: float | None = None) -> dict:
    """The booster-side metadata dict, key order identical to the
    reference's construction (model_utils.py:229-242) so the compact
    JSON encoding byte-matches reference-written attributes."""
    meta = {
        MODEL_NAME_METADATA_KEY: model_name,
        FEATURE_NAMES_METADATA_KEY: list(feature_names),
        STRING_TABLES_METADATA_KEY: string_tables,
        MODEL_SEED_METADATA_KEY: model_seed,
        CREATED_AT_METADATA_KEY: created_at,
        VERSION_METADATA_KEY: REFERENCE_VERSION,
    }
    check_user_defined_metadata(meta)
    if mean_item_count is not None:
        meta[MEAN_ITEM_COUNT_METADATA_KEY] = mean_item_count
    return meta


def append_metadata_to_booster(booster, model_name: str, string_tables: dict,
                               model_seed: int, created_at: str,
                               mean_item_count: float | None = None) -> None:
    """Attach the metadata JSON as a booster attribute
    (reference: model_utils.py:204-246). Duck-typed: anything exposing
    ``feature_names`` and ``set_attr(**kw)`` works (real xgboost.Booster
    in production, a fake in-container)."""
    assert booster.feature_names is not None and len(booster.feature_names) > 0
    meta = build_booster_metadata(
        model_name, list(booster.feature_names), string_tables, model_seed,
        created_at, mean_item_count,
    )
    booster.set_attr(**{USER_DEFINED_METADATA_KEY: _json_compact(meta)})


def mlmodel_user_metadata(model_name: str, string_tables: dict,
                          model_seed: int, created_at: str) -> dict:
    """The MLModel-side metadata (reference: model_utils.py:174-201):
    same keys, but string tables JSON-encoded and seed stringified —
    CoreML user metadata is a flat str→str map."""
    meta = {
        MODEL_NAME_METADATA_KEY: model_name,
        STRING_TABLES_METADATA_KEY: string_tables,
        MODEL_SEED_METADATA_KEY: model_seed,
        CREATED_AT_METADATA_KEY: created_at,
        VERSION_METADATA_KEY: REFERENCE_VERSION,
    }
    check_user_defined_metadata(meta)
    meta[STRING_TABLES_METADATA_KEY] = _json_compact(string_tables)
    meta[MODEL_SEED_METADATA_KEY] = str(model_seed)
    return meta


def convert_to_mlmodel(booster, model_name: str, string_tables: dict,
                       model_seed: int, created_at: str):
    """Booster → CoreML MLModel with embedded metadata
    (reference: model_utils.py:275-321 ``transform_model``).

    Raises ImportError with a clear message when coremltools is absent
    (this container) — callers treat that as "no .mlmodel artifact",
    exactly like the xgboost gate in trainer/train.py.
    """
    try:
        import coremltools as ct  # type: ignore
    except ImportError as exc:  # pragma: no cover - container lacks the lib
        raise ImportError(
            "coremltools is required for .mlmodel export; install it or "
            "consume the .xgb artifact instead"
        ) from exc

    feature_names = list(booster.feature_names)
    # reference nulls feature names before conversion to dodge an
    # XGBoost-JSON/coremltools interaction (model_utils.py:303-306)
    converted = booster.copy()
    converted.feature_names = None
    mlmodel = ct.converters.xgboost.convert(
        converted, mode=MLMODEL_REGRESSOR_MODE, feature_names=feature_names,
        force_32bit_float=True,
    )
    mlmodel.user_defined_metadata.update(
        mlmodel_user_metadata(model_name, string_tables, model_seed, created_at)
    )
    assert_feature_names_aligned(booster, mlmodel)
    return mlmodel


def assert_feature_names_aligned(booster, mlmodel) -> None:
    """Cross-check feature-name order across booster, its metadata
    attribute, and the MLModel spec (reference: model_utils.py:249-272)."""
    names = list(booster.feature_names)
    spec_names = [fn.name for fn in mlmodel.get_spec().description.input]
    assert names == spec_names, (names, spec_names)
    attr = booster.attr(USER_DEFINED_METADATA_KEY)
    assert attr is not None, "booster missing user_defined_metadata attr"
    meta_names = json.loads(attr)[FEATURE_NAMES_METADATA_KEY]
    assert names == meta_names, (names, meta_names)


def export_client_artifacts(booster, out_dir: str, model_name: str,
                            string_tables: dict, model_seed: int,
                            created_at: str | None = None,
                            mean_item_count: float | None = None,
                            feature_names: list[str] | None = None) -> dict:
    """Write the reference's client artifact pair into ``out_dir``:
    ``model.xgb`` always (metadata embedded first), ``model.mlmodel``
    when coremltools is importable. Returns {artifact: path} for what
    was actually written.

    ``feature_names``: set on the booster before export. REQUIRED for
    boosters trained through xgboost.spark — they train on one
    assembled vector column, so ``booster.feature_names`` is None and
    the export would otherwise fail (or, worse, embed f0..fN into
    ``ai.improve.features`` and every client would mis-decode)."""
    import os

    if feature_names is not None:
        booster.feature_names = list(feature_names)
    if created_at is None:
        from datetime import timezone

        created_at = datetime.now(timezone.utc).isoformat()
    os.makedirs(out_dir, exist_ok=True)
    append_metadata_to_booster(
        booster, model_name, string_tables, model_seed, created_at,
        mean_item_count,
    )
    written = {}
    xgb_path = os.path.join(out_dir, "model.xgb")
    booster.save_model(xgb_path)
    written["xgb"] = xgb_path
    try:
        mlmodel = convert_to_mlmodel(
            booster, model_name, string_tables, model_seed, created_at
        )
        ml_path = os.path.join(out_dir, "model.mlmodel")
        mlmodel.save(ml_path)
        written["mlmodel"] = ml_path
    except ImportError:
        pass  # documented gate: no coremltools in this container
    return written
