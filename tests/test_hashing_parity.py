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
