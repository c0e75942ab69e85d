"""The portability contract behind string tables and MinHash: the pure-
Python XXH64 kernel is bit-identical to Spark's JVM xxhash64 (seed 42)
on UTF-8 strings — driver-side table construction and executor-side
encoding can never disagree."""

from pyspark.sql import functions as F

from tracker_trainer_spark.hashing import masked_hash, xxh64

WORDS = [
    "", "a", "ab", "abc", "abcd",          # all small-input tails
    "hello world", "tracker-trainer",
    "x" * 31, "x" * 32, "x" * 33, "x" * 100,  # 32-byte block boundaries
    "日本語テキスト", "émoji 🎛️ mix",         # multi-byte UTF-8
]


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def test_python_xxh64_matches_spark_jvm(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "s string")
    got = {r.s: r.h for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for w in WORDS:
        assert _signed(xxh64(w, 42)) == got[w], repr(w)


def test_seed_changes_hash():
    assert xxh64("abc", 1) != xxh64("abc", 2)


def test_masked_hash_bit_width():
    for bits in (1, 7, 31, 62):
        h = masked_hash("value", bits, seed=9)
        assert 0 <= h < (1 << (bits + 1))


def test_string_hash_prefers_xxh3_when_available():
    """The string-table seam (reference: string_encoder.py:10 xxh3_64):
    with the xxhash package installed, string_hash IS xxh3_64_intdigest
    bit-for-bit; without it, the documented XXH64 fallback."""
    from tracker_trainer_spark.hashing import (
        HAS_XXH3,
        STRING_HASH_NAME,
        string_hash,
    )

    if HAS_XXH3:
        import xxhash

        assert STRING_HASH_NAME == "xxh3_64"
        for w in WORDS:
            for seed in (0, 1, 42, 2**31):
                assert string_hash(w, seed) == xxhash.xxh3_64_intdigest(w, seed)
    else:
        assert STRING_HASH_NAME == "xxh64"
        for w in WORDS:
            assert string_hash(w, 7) == xxh64(w, 7)


def test_artifact_refuses_cross_hash_tables(tmp_path, monkeypatch):
    """A metadata.json recording the OTHER hash algorithm must fail to
    load with a clear message, never decode tables to garbage."""
    import json

    import pytest

    from tracker_trainer_spark.trainer import artifacts

    meta = {"version": artifacts.ARTIFACT_VERSION, "created_at": 0,
            "string_hash": "definitely-not-" + artifacts.STRING_HASH_NAME,
            "feature_names": [], "string_tables": {}, "model_seed": 1,
            "mean_item_count": None, "metadata": {}, "backend": "spark-ml"}
    (tmp_path / "metadata.json").write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="string tables were built with"):
        artifacts.load_model(None, str(tmp_path))
