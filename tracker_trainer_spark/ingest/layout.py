"""Z-order (Morton-curve) file clustering for multi-dimensional data
skipping — the lakehouse OPTIMIZE ZORDER BY maintenance operator
(Delta/Iceberg ship the same primitive; the reference's groom only
clusters on the single KSUID time axis, src/ingest/groom.py).

Why: parquet row-group min/max stats prune scans only along the sort
order. A timeline sorted by one key answers one predicate family; a
100 TB fact table queried by (user, value), (time, model), … needs its
row groups tight on SEVERAL columns at once. Interleaving the bits of
rank-bucketed column values puts rows close on the Morton curve exactly
when they are close on every dimension, so each file covers a small
hyper-box and a predicate on ANY clustered column skips most files.

Scale posture:
- Per-column bucket boundaries come from ``approxQuantile`` (the
  Greenwald-Khanna sketch: one pass, driver gets ≤2^bits scalars per
  column — never row data). Rank-bucketing, like Delta's
  range_partition_id, makes the curve skew-immune: a hot value owns
  many buckets of the curve instead of collapsing one cell.
- The z-value itself is a pure JVM expression tree (filter/size over a
  literal boundary array + shift/or bit interleave) — whole-stage
  codegen, no UDF, no shuffle.
- ``repartitionByRange`` on the z-value is the ONE shuffle; in-file
  ordering then rides sortWithinPartitions. AQE coalesces the range
  partitions to the target file count.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_BITS = 8  # 256 rank buckets per column — 2-3 clustered columns
# give a 16-24 bit curve, far finer than any practical file count


def _bucket(col: str, boundaries: list[float], bits: int) -> Column:
    """Value → rank bucket stretched over [0, 2^bits): count of
    boundaries ≤ value, rescaled so a LOW-cardinality column still owns
    the full bit range. Without the stretch, a k-distinct column only
    populates its low ⌈log2 k⌉ bits and every one of its curve bits
    sinks below every bit of a high-cardinality neighbor — the curve
    degenerates to a single-column sort (observed: 15 users × continuous
    value ⇒ pure value order, zero user pruning).

    NULLs sort to bucket 0 (they carry no skipping information either
    way: a NULL-heavy column keeps min/max stats per file regardless).
    """
    nb = len(boundaries)
    if nb == 0:  # constant column: no information, pin to 0
        return F.lit(0).cast("long")
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    n = F.size(F.filter(arr, lambda b: b <= F.col(col).cast("double")))
    top = (1 << bits) - 1
    # long, not int: the interleave shifts bucket bits up to position
    # n_cols*bits-1, which passes the int sign bit at 4 columns x 8 bits
    # (all-max buckets came back as z = -1) and wraps mod 32 beyond
    return F.floor(F.coalesce(n, F.lit(0)) * F.lit(top) / F.lit(nb)).cast("long")


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of bucket j → bit i*n_cols+j of the key."""
    n = len(buckets)
    if n * bits > 62:  # long sign bit + headroom: fail loudly, not wrapped
        raise ValueError(
            f"z-order key needs {n * bits} bits; max 62 "
            f"(reduce bits per column or cluster fewer columns)"
        )
    parts = [
        F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + j
        )
        for i in range(bits)
        for j, b in enumerate(buckets)
    ]
    return reduce(lambda a, c: a.bitwiseOR(c), parts).cast("long")


def zorder_key(df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS,
               rel_err: float = 0.001) -> Column:
    """Build the Morton key expression for ``cols`` on this frame.

    One approxQuantile pass per call computes the per-column rank
    boundaries (2^bits - 1 interior quantiles, sketched, driver-bounded);
    the returned Column is then a pure codegen expression usable in any
    select/repartition over the same distribution.
    """
    n_b = (1 << bits) - 1
    probs = [i / (n_b + 1) for i in range(1, n_b + 1)]
    casted = df.select(
        *[F.col(c).cast("double").alias(c) for c in cols]
    )
    all_bounds = casted.approxQuantile(cols, probs, rel_err)
    buckets = [
        _bucket(c, sorted(set(bs)), bits) for c, bs in zip(cols, all_bounds)
    ]
    return _interleave(buckets, bits)


def zorder_frame(df: DataFrame, cols: list[str], n_files: int,
                 bits: int = DEFAULT_BITS) -> DataFrame:
    """Cluster ``df`` along the Morton curve of ``cols``: range-partition
    into ``n_files`` curve segments and sort rows within each, so every
    output file covers a tight hyper-box in the clustered dimensions.
    Drop-in before ``.write.parquet`` (or ``write_timeline`` for
    clustering within dt partitions)."""
    key = zorder_key(df, cols, bits=bits)
    tmp = "_zkey"
    while tmp in df.columns:  # never clobber a user column
        tmp += "_"
    return (
        df.withColumn(tmp, key)
        .repartitionByRange(n_files, tmp)
        .sortWithinPartitions(tmp)
        .drop(tmp)
    )
