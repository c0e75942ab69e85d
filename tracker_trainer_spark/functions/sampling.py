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
    """Label rows 'train'/'holdout' deterministically by key hash."""
    train_name, holdout_name = split_col_names
    return F.when(
        hash_bucket(key, buckets) < F.lit(holdout_pct), F.lit(holdout_name)
    ).otherwise(F.lit(train_name))


def hash_sample(df: DataFrame, key, pct: int, buckets: int = 100) -> DataFrame:
    """Keep a deterministic ~pct% of rows by key hash (Bernoulli by
    bucket, NOT by position — stable under any ordering/partitioning)."""
    return df.where(hash_bucket(key, buckets) < F.lit(pct))
