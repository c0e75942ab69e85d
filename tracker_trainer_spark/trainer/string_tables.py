"""String tables: ordinal target encoding of string features.

Reference pipeline (reference: src/trainer/code/string_encoder.py):
1. per (feature, string): weight += w, target += y*w, count += 1 (A5,
   :146-181);
2. prune count <= PRUNE_MIN_STRING_COUNT (20), cap at 10,000 strings per
   feature by weight (A7, :131-143);
3. sort surviving strings by prior-smoothed mean target desc (A6/A8,
   :104-128);
4. per feature, find the minimal bit width whose masked seeded hashes
   are collision-free and store the hash list (:80-93);
5. encode side maps reversed rank → value in [-1, 1]; misses hash into
   [-miss_width/2, +miss_width/2]
   (reference: src/trainer/code/feature_encoder.py:170-226).

Spark-first split: steps 1-3 are DataFrame aggregations + windows (the
full-data passes); step 4-5 finalize driver-side over the collected
per-feature string lists, which are bounded at 10k × #string-features by
construction. XXH64 substitutes for xxh3_64 (see hashing.py).
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..hashing import string_hash


@lru_cache(maxsize=1 << 16)
def _cached_hash(string: str, seed: int) -> int:
    """Encode-side memo: feature values repeat heavily within an Arrow
    batch (and across batches in one worker), and the pure-Python
    xxh3_64 costs ~2.5 µs per short string — the bounded LRU turns the
    hot path into a dict hit.  Table CONSTRUCTION keeps calling
    string_hash directly (each candidate string hashes once)."""
    return string_hash(string, seed)

MAX_STRINGS_PER_FEATURE = 10_000  # reference: src/trainer/code/config.py:96
PRUNE_MIN_STRING_COUNT = 20       # reference: src/trainer/code/config.py:18
DECISION_PRIOR_COUNT = 300        # reference: src/trainer/code/config.py:17


def string_stats(flat_df: DataFrame, weight_col: str = "w", target_col: str = "y",
                 str_col: str = "str_features") -> DataFrame:
    """A5: per (feature, value) → weight, target, count in one hash agg."""
    exploded = flat_df.select(
        F.explode(F.col(str_col)).alias("feature", "value"),
        F.col(weight_col).alias("w"),
        F.col(target_col).alias("y"),
    )
    return exploded.groupBy("feature", "value").agg(
        F.sum("w").alias("weight"),
        F.sum(F.col("y") * F.col("w")).alias("target"),
        F.count(F.lit(1)).alias("count"),
    )


def ranked_strings(stats: DataFrame, prior_mean: float = 0.0, prior_count: int = 0,
                   max_strings: int = MAX_STRINGS_PER_FEATURE,
                   prune_min_count: int = PRUNE_MIN_STRING_COUNT) -> DataFrame:
    """A6-A8: prune, cap, and rank strings per feature (all distributed)."""
    by_weight = Window.partitionBy("feature").orderBy(
        F.desc("weight"), F.asc("value")
    )
    kept = (
        stats.where(F.col("count") > prune_min_count)
        .withColumn("weight_rank", F.row_number().over(by_weight))
        .where(F.col("weight_rank") <= max_strings)
    )
    prior_weight = F.lit(prior_count) * F.col("weight") / F.col("count")
    smoothed = (F.col("target") + F.lit(prior_mean) * prior_weight) / (
        F.col("weight") + prior_weight
    )
    by_target = Window.partitionBy("feature").orderBy(
        F.desc("smoothed_mean"), F.asc("value")
    )
    return (
        kept.withColumn("smoothed_mean", smoothed)
        .withColumn("rank", F.row_number().over(by_target))
        .select("feature", "value", "weight", "target", "count", "smoothed_mean", "rank")
    )


def build_string_tables(stats: DataFrame, model_seed: int,
                        allowed_features: list[str] | None = None,
                        prior_mean: float = 0.0, prior_count: int = 0,
                        max_strings: int = MAX_STRINGS_PER_FEATURE,
                        prune_min_count: int = PRUNE_MIN_STRING_COUNT) -> dict[str, list[int]]:
    """Finalize {feature: [hash, ...]} tables (rank order, collision-free bits).

    The collect is bounded (≤ max_strings × #features); the bit-width
    search mirrors reference string_encoder.py:80-93.
    """
    ranked = ranked_strings(stats, prior_mean, prior_count, max_strings, prune_min_count)
    if allowed_features is not None:
        allowed = set(allowed_features)
        ranked = ranked.where(F.col("feature").isin(*allowed))
    rows = ranked.select("feature", "value", "rank").collect()
    by_feature: dict[str, list[tuple[int, str]]] = {}
    for r in rows:
        by_feature.setdefault(r["feature"], []).append((r["rank"], r["value"]))

    tables: dict[str, list[int]] = {}
    for feature, pairs in by_feature.items():
        values = [v for _, v in sorted(pairs)]
        if not values:
            continue
        import math

        hashes: list[int] = []
        for n_bits in range(max(int(math.log2(len(values))), 1), 64):
            mask = (1 << (n_bits + 1)) - 1
            hashes = [string_hash(v, model_seed) & mask for v in values]
            if len(set(hashes)) == len(values):
                break
        tables[feature] = hashes
    return tables


class StringTable:
    """Encode-side table: seeded hash → value in [-1, 1]; misses spread
    deterministically in a narrow band.

    Semantics parity with reference feature_encoder.py:170-226 (StringTable),
    hash algorithm per hashing.string_hash (xxh3_64 when
    importable, XXH64 fallback).
    """

    def __init__(self, hash_table: list[int], model_seed: int):
        if model_seed < 0:
            raise ValueError("model_seed must be a non-negative integer")
        self.model_seed = model_seed
        self.mask = self._mask_of(hash_table)
        max_position = len(hash_table) - 1
        self.miss_width = 1.0 if max_position < 1 else 2.0 / max_position
        self.value_table = {}
        for index, h in enumerate(reversed(hash_table)):
            self.value_table[h] = 1.0 if max_position == 0 else _scale(index / max_position)

    @staticmethod
    def _mask_of(hash_table: list[int]) -> int:
        if not hash_table:
            return 0
        top = max(hash_table)
        if top == 0:
            return 0
        return (1 << top.bit_length()) - 1

    def encode(self, string: str) -> float:
        h = _cached_hash(string, self.model_seed)
        value = self.value_table.get(h & self.mask)
        if value is not None:
            return value
        return _scale((h & 0xFFFFFFFF) * 2**-32, self.miss_width)


def _scale(val: float, width: float = 2.0) -> float:
    # [0, 1] → [-width/2, +width/2]
    return val * width - 0.5 * width
