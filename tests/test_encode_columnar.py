"""encode_to_vectors_columnar ≡ encode_to_vectors bit-parity.

The columnar path re-spells the generic per-row assembly UDF as JVM
array expressions + a vectorized per-feature string encode; this suite
pins the two implementations bit-identical over the tricky slot
semantics (str-overrides-num, extras-override-maps, misses → NaN,
empty-table xxh3 miss encode, NULL maps) so the columnar spelling can
carry the flagship encode without weakening the golden-parity chain
that anchors encode_to_vectors to the reference
(feature_encoder.py:138-226 via tests/test_trainer_encode.py)."""

import math

import pytest
from pyspark.sql import functions as F

from tracker_trainer_spark.trainer.encode import (
    TIMESTAMP_KEY,
    encode_to_vectors,
    encode_to_vectors_columnar,
)

ROWS_SCHEMA = (
    "decision_id string, t double, y double, w double, "
    "num_features map<string,double>, str_features map<string,string>"
)

# exercises: num-only key, str-only key, BOTH (str must win), key absent
# from maps (NULL: the generic UDF's np.nan prefill lands as null
# through the pandas→Arrow array<double> return), table hit, table miss
# (xxh3 band), feature with NO table (empty-table miss encode), a 't'
# entry in the num map that the extras column must override, NULL maps,
# and an unselected key that must not leak into any slot
ROWS = [
    ("a", 100.0, 1.0, 1.0,
     {"f.num": 2.5, "t": 999.0}, {"f.str": "alpha"}),
    ("b", 200.0, 0.0, 1.0,
     {"f.both": 7.0}, {"f.both": "beta", "f.notab": "gamma"}),
    ("c", 300.0, 1.0, 1.0, None, {"f.str": "unseen-value"}),
    ("d", 400.0, 0.0, 1.0, {"f.num": -1.25, "junk.key": 5.0}, None),
    ("e", 500.0, 1.0, 1.0, None, None),
]
SELECTED = ["f.num", "f.str", "f.both", "f.notab", "f.absent"]
# f.str gets a real 2-entry table; f.both a 1-entry table; f.notab none
from tracker_trainer_spark.hashing import string_hash  # noqa: E402

TABLES = {
    "f.str": sorted({string_hash("alpha", 9), string_hash("zzz", 9)}),
    "f.both": [string_hash("beta", 9)],
}
SEED = 9


def _collect(df):
    rows = df.orderBy("decision_id").select("decision_id", "features").collect()
    return [(r["decision_id"], list(r["features"])) for r in rows]


def _same(a, b):
    assert len(a) == len(b)
    for (ida, va), (idb, vb) in zip(a, b):
        assert ida == idb
        assert len(va) == len(vb)
        for x, y in zip(va, vb):
            if x is None or y is None:
                assert x is None and y is None, (ida, va, vb)
            elif math.isnan(x) or math.isnan(y):
                assert math.isnan(x) and math.isnan(y), (ida, va, vb)
            else:
                assert x == y, (ida, va, vb)  # bit-equal, not approx


def test_columnar_matches_generic(spark):
    df = spark.createDataFrame(ROWS, ROWS_SCHEMA).withColumnRenamed(
        "t", TIMESTAMP_KEY)
    gen = _collect(encode_to_vectors(df, SELECTED, TABLES, SEED))
    col = _collect(encode_to_vectors_columnar(df, SELECTED, TABLES, SEED))
    _same(gen, col)
    # sanity, not just cross-parity: str overrides num on f.both
    by_id = dict(col)
    i_both = SELECTED.index("f.both")
    assert by_id["b"][i_both] != 7.0
    # extras override the num map's own 't' entry
    i_t = len(SELECTED)
    assert by_id["a"][i_t] == 100.0
    # absent feature is NULL everywhere
    i_abs = SELECTED.index("f.absent")
    assert all(v[i_abs] is None for v in by_id.values())


def test_columnar_matches_generic_no_extras(spark):
    df = spark.createDataFrame(ROWS, ROWS_SCHEMA).withColumnRenamed(
        "t", TIMESTAMP_KEY)
    gen = _collect(encode_to_vectors(df, SELECTED, TABLES, SEED,
                                     extra_num_cols=()))
    col = _collect(encode_to_vectors_columnar(df, SELECTED, TABLES, SEED,
                                              extra_num_cols=()))
    _same(gen, col)


@pytest.mark.parametrize("n", [257])
def test_columnar_matches_generic_bulk(spark, n):
    """Volume parity: distinct-value dedup inside the vectorized encode
    must not change any value vs the per-row loop."""
    rows = []
    for i in range(n):
        num = {"f.num": float(i)} if i % 3 else None
        strs = {"f.str": f"v{i % 17}", "f.notab": f"m{i % 5}"} if i % 4 else None
        rows.append((f"id{i:04d}", float(i), 0.0, 1.0, num, strs))
    df = spark.createDataFrame(rows, ROWS_SCHEMA).withColumnRenamed(
        "t", TIMESTAMP_KEY)
    sel = ["f.num", "f.str", "f.notab"]
    _same(_collect(encode_to_vectors(df, sel, TABLES, SEED)),
          _collect(encode_to_vectors_columnar(df, sel, TABLES, SEED)))
