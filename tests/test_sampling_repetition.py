"""Deterministic hash sampling + repetition metrics."""

import hashlib

from pyspark.sql import functions as F

from tracker_trainer_spark.functions.sampling import hash_bucket, hash_sample, hash_split
from tracker_trainer_spark.functions.text import (
    dup_ngram_fraction,
    tokens,
    top_token_fraction,
)


def _py_bucket(key, buckets=100):
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % buckets


def test_hash_bucket_matches_python_md5(spark):
    df = spark.range(0, 500).select(
        "id", hash_bucket("id").alias("b")
    )
    for r in df.collect():
        assert r["b"] == _py_bucket(r["id"])


def test_hash_split_fraction_and_stability(spark):
    df = spark.range(0, 2000).select(
        "id", hash_split("id", holdout_pct=10).alias("split")
    )
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # ~10% holdout, binomial tolerance
    assert 120 <= counts["holdout"] <= 280
    # membership is a pure function of the key: reordering/repartitioning
    # the input must not move any row between splits
    again = (
        spark.range(0, 2000)
        .repartition(7)
        .sort(F.desc("id"))
        .select("id", hash_split("id", holdout_pct=10).alias("split"))
    )
    assert {(r["id"], r["split"]) for r in df.collect()} == {
        (r["id"], r["split"]) for r in again.collect()
    }


def test_hash_sample_is_subset_closed_under_append(spark):
    # sampling an extended table keeps exactly the old sample + new-row
    # sample — no resampling drift on incremental appends
    small = hash_sample(spark.range(0, 1000), "id", pct=20)
    big = hash_sample(spark.range(0, 1500), "id", pct=20)
    s = {r["id"] for r in small.collect()}
    b = {r["id"] for r in big.collect()}
    assert s == {x for x in b if x < 1000}


def test_dup_ngram_fraction_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # bigrams: ab ba ab ba ab → 2 distinct of 5
            (2, "one two three"),    # all distinct
            (3, "single"),           # too short → 0.0
        ],
        "id long, text string",
    )
    got = {
        r["id"]: round(r["f"], 4)
        for r in df.select(
            "id", dup_ngram_fraction(tokens("text"), 2).alias("f")
        ).collect()
    }
    assert got == {1: round(1 - 2 / 5, 4), 2: 0.0, 3: 0.0}


def test_top_token_fraction_values(spark):
    df = spark.createDataFrame(
        [(1, "x x x y"), (2, "a b c d"), (3, "z")],
        "id long, text string",
    )
    got = {
        r["id"]: round(r["f"], 4)
        for r in df.select(
            "id", top_token_fraction(tokens("text")).alias("f")
        ).collect()
    }
    assert got == {1: 0.75, 2: 0.25, 3: 1.0}


def test_weighted_sample_favors_heavy_rows(spark):
    """A-ES inclusion probability ∝ weight: a 2-point weight mix (1 vs
    20) must over-select the heavy rows roughly in proportion."""
    from pyspark.sql import functions as F
    from tracker_trainer_spark.functions.sampling import weighted_sample

    rows = [(i, 20.0 if i % 10 == 0 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_sample(df, "id", "w", 200).collect()
    heavy = sum(1 for r in got if r.w == 20.0)
    # heavy rows: 200 of 2000 carry 20/(20*200+1800) = 69% of mass;
    # deterministic draw (measured 133/200) — assert well above the
    # 10% unweighted rate and below all-heavy
    assert 80 <= heavy <= 195, heavy


def test_weighted_sample_is_deterministic(spark):
    from pyspark.sql import functions as F
    from tracker_trainer_spark.functions.sampling import weighted_sample

    df = spark.range(500).select(
        F.col("id"), (F.lit(1.0) + F.col("id")).alias("w")
    )
    a = sorted(r.id for r in weighted_sample(df, "id", "w", 50).collect())
    b = sorted(r.id for r in weighted_sample(df, "id", "w", 50).collect())
    assert a == b and len(a) == 50
