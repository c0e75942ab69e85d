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


def test_string_hash_is_xxh3_either_way():
    """The string-table seam (reference: string_encoder.py:10 xxh3_64)
    is ONE algorithm regardless of environment: the C
    xxh3_64_intdigest when the xxhash package exists, the bit-identical
    pure-Python port otherwise — artifacts interchange unconditionally
    (r6: closed the former environment-dependent xxh64 fallback)."""
    from tracker_trainer_spark.hashing import (
        HAS_XXH3,
        STRING_HASH_NAME,
        string_hash,
        xxh3_64,
    )

    assert STRING_HASH_NAME == "xxh3_64"
    for w in WORDS:
        for seed in (0, 1, 42, 2**31):
            assert string_hash(w, seed) == xxh3_64(w, seed)
    if HAS_XXH3:
        import xxhash

        for w in WORDS:
            for seed in (0, 1, 42, 2**31):
                assert string_hash(w, seed) == xxhash.xxh3_64_intdigest(w, seed)


# ---------------------------------------------------------------------------
# XXH3-64 golden vectors, generated from the canonical C implementation
# (XXH3_64bits_withSeed of the xxhash header vendored by Apache Arrow,
# compiled and executed on this box — not hand-transcribed).  They cover
# every length path of the algorithm: 0, 1-3, 4-8, 9-16, 17-128,
# 129-240, and the long/stripe path with 1..4 blocks, for seed 0 (default
# secret), small seeds, and 64-bit seeds (custom secret + seed mixing).
# The reference hashes strings exactly this way:
# src/trainer/code/string_encoder.py:99-101 `xxh3(string, seed) & mask`.
# ---------------------------------------------------------------------------

XXH3_STRINGS = [
    "", "a", "ab", "abc", "abcd", "song", "tempo12", "12345678",
    "123456789", "improve-ai-key16", "a-seventeen-bytes",
    "the quick brown fox jumps over the lazy dog",
    "0123456789abcdef" * 8,            # 128 B: top of the mix16 path
    "0123456789abcdef" * 8 + "X",      # 129 B: bottom of the midsize path
]
XXH3_SEEDS = [0, 1, 42, 1234567891011, 0xDEADBEEFCAFEBABE]
XXH3_GOLDEN: dict[tuple, int] = {}


def _load_golden():
    import os

    path = os.path.join(os.path.dirname(__file__), "data", "xxh3_golden.tsv")
    for line in open(path):
        key, seed, want = line.split()
        XXH3_GOLDEN[(key, int(seed))] = int(want)


_load_golden()


def test_xxh3_64_matches_c_reference_all_paths():
    from tracker_trainer_spark.hashing import xxh3_64

    checked = 0
    for (key, seed), want in XXH3_GOLDEN.items():
        if key == "X64":
            assert xxh64("hello world", 42) == want
        elif key.startswith("L"):
            assert xxh3_64(b"x" * int(key[1:]), seed) == want, (key, seed)
        else:
            assert xxh3_64(XXH3_STRINGS[int(key)], seed) == want, (key, seed)
        checked += 1
    assert checked >= 100


def test_xxh3_reference_masked_path():
    """The exact reference spelling: xxh3_64(s, seed) & ((1<<(bits+1))-1)
    (string_encoder.py:96-101) through masked_hash."""
    from tracker_trainer_spark.hashing import string_hash

    for (key, seed), want in XXH3_GOLDEN.items():
        if key in ("X64",) or key.startswith("L"):
            continue
        s = XXH3_STRINGS[int(key)]
        assert string_hash(s, seed) == want
        for bits in (7, 31, 62):
            mask = (1 << (bits + 1)) - 1
            assert masked_hash(s, bits, seed) == want & mask


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
