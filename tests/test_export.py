"""M6 client export: booster-attr metadata + CoreML conversion gates.

The metadata construction/validation/attach logic is pure and
duck-typed, so it is fully testable without xgboost/coremltools; the
golden-booster byte-parity test runs only where xgboost exists
(reference golden: tests/test_cases/data/model_utils/model_metadata_tests.xgb)."""

import json

import pytest

from tracker_trainer_spark.trainer.export import (
    CREATED_AT_METADATA_KEY,
    FEATURE_NAMES_METADATA_KEY,
    MEAN_ITEM_COUNT_METADATA_KEY,
    MODEL_NAME_METADATA_KEY,
    MODEL_SEED_METADATA_KEY,
    REFERENCE_VERSION,
    STRING_TABLES_METADATA_KEY,
    USER_DEFINED_METADATA_KEY,
    VERSION_METADATA_KEY,
    append_metadata_to_booster,
    assert_feature_names_aligned,
    build_booster_metadata,
    check_user_defined_metadata,
    convert_to_mlmodel,
    mlmodel_user_metadata,
)

CREATED = "2022-05-23T10:00:00"
TABLES = {"item.color": [3, 1, 2]}


class FakeBooster:
    """Just enough of xgboost.Booster for the duck-typed attach path."""

    def __init__(self, feature_names):
        self.feature_names = feature_names
        self._attrs = {}

    def set_attr(self, **kw):
        self._attrs.update(kw)

    def attr(self, key):
        return self._attrs.get(key)


def test_booster_metadata_keys_and_order():
    meta = build_booster_metadata(
        "greetings", ["item.a", "t"], TABLES, 42, CREATED, mean_item_count=3.5
    )
    assert list(meta) == [
        MODEL_NAME_METADATA_KEY, FEATURE_NAMES_METADATA_KEY,
        STRING_TABLES_METADATA_KEY, MODEL_SEED_METADATA_KEY,
        CREATED_AT_METADATA_KEY, VERSION_METADATA_KEY,
        MEAN_ITEM_COUNT_METADATA_KEY,
    ]
    assert meta[VERSION_METADATA_KEY] == REFERENCE_VERSION


def test_append_to_booster_roundtrip():
    b = FakeBooster(["context.x", "item.y", "t"])
    append_metadata_to_booster(b, "m", TABLES, 7, CREATED)
    raw = b.attr(USER_DEFINED_METADATA_KEY)
    # compact orjson-style encoding: no spaces after separators
    assert ": " not in raw and ", " not in raw
    meta = json.loads(raw)
    assert meta[FEATURE_NAMES_METADATA_KEY] == ["context.x", "item.y", "t"]
    assert meta[MODEL_SEED_METADATA_KEY] == 7          # int on booster side
    assert MEAN_ITEM_COUNT_METADATA_KEY not in meta    # None → omitted


def test_mlmodel_metadata_stringified():
    meta = mlmodel_user_metadata("m", TABLES, 7, CREATED)
    # CoreML user metadata is str→str: tables JSON-encoded, seed str
    assert meta[STRING_TABLES_METADATA_KEY] == '{"item.color":[3,1,2]}'
    assert meta[MODEL_SEED_METADATA_KEY] == "7"
    assert FEATURE_NAMES_METADATA_KEY not in meta      # booster-only key


def test_metadata_validation_rejects_bad_values():
    with pytest.raises(AssertionError):
        build_booster_metadata("m", [], TABLES, 7, CREATED)       # empty names
    with pytest.raises(AssertionError):
        build_booster_metadata("m", ["a"], TABLES, "7", CREATED)  # str seed
    with pytest.raises(ValueError):
        build_booster_metadata("m", ["a"], TABLES, 7, "not-a-date")
    with pytest.raises(AssertionError):
        check_user_defined_metadata({MODEL_NAME_METADATA_KEY: "m"})


def test_feature_name_cross_check():
    class Spec:
        class description:
            pass

    class FakeML:
        def __init__(self, names):
            self._names = names

        def get_spec(self):
            spec = Spec()
            spec.description = type(
                "D", (), {"input": [type("F", (), {"name": n})() for n in self._names]}
            )()
            return spec

    b = FakeBooster(["a", "b"])
    append_metadata_to_booster(b, "m", TABLES, 7, CREATED)
    assert_feature_names_aligned(b, FakeML(["a", "b"]))
    with pytest.raises(AssertionError):
        assert_feature_names_aligned(b, FakeML(["b", "a"]))


def test_convert_importerror_message():
    try:
        import coremltools  # noqa: F401
        pytest.skip("coremltools present; gate not reachable")
    except ImportError:
        pass
    b = FakeBooster(["a"])
    with pytest.raises(ImportError, match="coremltools is required"):
        convert_to_mlmodel(b, "m", TABLES, 7, CREATED)


def test_golden_booster_metadata_parity():
    """Byte-parity with the reference's golden booster where xgboost
    exists: rebuild the metadata JSON from the golden's own fields and
    compare to the stored attribute."""
    xgb = pytest.importorskip("xgboost")
    golden = "/root/reference/tests/test_cases/data/model_utils/model_metadata_tests.xgb"
    booster = xgb.Booster()
    booster.load_model(golden)
    raw = booster.attr(USER_DEFINED_METADATA_KEY)
    if raw is None:
        pytest.skip("golden booster carries no metadata attr")
    stored = json.loads(raw)
    rebuilt = build_booster_metadata(
        stored[MODEL_NAME_METADATA_KEY],
        stored[FEATURE_NAMES_METADATA_KEY],
        stored[STRING_TABLES_METADATA_KEY],
        stored[MODEL_SEED_METADATA_KEY],
        stored[CREATED_AT_METADATA_KEY],
        stored.get(MEAN_ITEM_COUNT_METADATA_KEY),
    )
    rebuilt[VERSION_METADATA_KEY] = stored[VERSION_METADATA_KEY]
    assert json.dumps(rebuilt, separators=(",", ":")) == raw
