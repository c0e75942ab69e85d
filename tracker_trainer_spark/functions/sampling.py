"""Deterministic, engine-portable sampling / splitting.

``df.sample()`` and ``rand(seed)`` are reproducible within Spark but not
across engines or row orderings — useless for a train/holdout contract
that an auditor should be able to recompute elsewhere. Hashing a stable
key is the standard fix (the same trick the reference uses for
per-feature string hashing, src/trainer/code/string_encoder.py): a row's
bucket is a pure function of its id, so membership survives reshuffles,
re-ingestion, engine swaps, and incremental appends (new rows land in
the same split forever — no resampling drift).

md5 (not xxhash64) because every engine in the oracle loop computes the
identical digest for the identical string; the first 8 hex chars give a
uniform 32-bit value. All column expressions — JVM-side, codegen, no
shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key, buckets: int = 100) -> Column:
    """Uniform deterministic bucket in [0, buckets) from a key column.

    Portable definition: ``int(md5(cast(key as string))[:8], 16) %
    buckets`` — byte-identical in any engine with md5 (DuckDB oracle:
    ``CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 8)) AS
    BIGINT) % buckets``).
    """
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
        % F.lit(buckets)
    )


def hash_split(
    key, holdout_pct: int = 10, buckets: int = 100, split_col_names=("train", "holdout")
) -> Column:
    """Label rows 'train'/'holdout' deterministically by key hash.

    NULL keys get a NULL label (not silently 'train'): a row with no id
    has no reproducible membership under the audit contract, and a bare
    ``otherwise`` would bias every such row into the train split while
    ``hash_sample`` drops them — callers decide the NULL policy
    explicitly."""
    train_name, holdout_name = split_col_names
    b = hash_bucket(key, buckets)
    return (
        F.when(b < F.lit(holdout_pct), F.lit(holdout_name))
        .when(b >= F.lit(holdout_pct), F.lit(train_name))
    )


def hash_sample(df: DataFrame, key, pct: int, buckets: int = 100) -> DataFrame:
    """Keep a deterministic ~pct% of rows by key hash (Bernoulli by
    bucket, NOT by position — stable under any ordering/partitioning)."""
    return df.where(hash_bucket(key, buckets) < F.lit(pct))


def weighted_sample_key(key, weight) -> Column:
    """Efraimidis–Spirakis (A-ES) weighted-sampling key: each row draws
    u ∈ (0,1) deterministically from its id hash and scores
    u^(1/w) — the top-k rows by this key are a weighted random sample
    without replacement (Efraimidis & Spirakis, IPL 2006), with
    inclusion probability proportional to weight.

    Deterministic + engine-portable: u = (first-8-hex-of-md5 + 0.5) /
    2^32, so the "random" draw is a pure function of the key — the same
    auditability contract as hash_bucket, and the top-k is reproducible
    in any engine with md5. Log-space spelling ln(u)/w avoids pow
    underflow for large weights; ordering is identical.
    """
    k = F.col(key) if isinstance(key, str) else key
    w = F.col(weight) if isinstance(weight, str) else weight
    u = (
        F.conv(F.substring(F.md5(k.cast("string")), 1, 8), 16, 10).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(2 ** 32))
    return F.log(u) / w


def weighted_sample(df: DataFrame, key: str, weight: str, n: int) -> DataFrame:
    """Top-n rows by the A-ES key — a weighted sample without
    replacement; plans as TakeOrdered (no global sort)."""
    return (
        df.withColumn("_es", weighted_sample_key(key, weight))
        .orderBy(F.desc("_es"))
        .limit(n)
        .drop("_es")
    )
