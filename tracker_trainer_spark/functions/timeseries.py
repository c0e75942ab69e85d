"""Time-series gap-filling: dense bucket grids + last-observation-
carried-forward interpolation.

The hypertable-rollup companion ops (TimescaleDB ``time_bucket_gapfill``
+ ``locf`` shape): a per-key aggregate leaves holes where no events
landed in a bucket; downstream consumers (charts, feature windows,
models expecting regular series) need the dense grid with a fill
policy.

Spark-native composition — no UDF anywhere:
1. bucket aggregate (one shuffle on (key, bucket));
2. per-key envelope min/max bucket (key-level agg — small);
3. ``sequence()`` + ``explode`` expands each key's envelope into its
   dense grid scan-side (narrow — the grid never shuffles as raw rows);
4. left join actuals back on (key, bucket);
5. LOCF = ``last(value, ignorenulls)`` over the key window in bucket
   order — the same running-carry primitive as the as-of join.

Scale: grid size is sum over keys of (active-span / step) — generated
distributed, never on the driver. The LOCF window rides the join's
(key)-compatible partitioning; state per key is one carried value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


_BUCKET_UNITS = {"1 day": "day", "1 hour": "hour", "1 minute": "minute"}


def time_bucket(ts_col, width: str = "1 day") -> Column:
    """Event-time → bucket start (timestamp floor at `width`). Unknown
    widths raise — silently coarsening to a default would corrupt every
    downstream gapfill/feature computation."""
    if width not in _BUCKET_UNITS:
        raise ValueError(
            f"unsupported bucket width {width!r}; one of {sorted(_BUCKET_UNITS)}"
        )
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.date_trunc(_BUCKET_UNITS[width], c)


def gapfill_locf(
    bucketed: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_col: str,
    step: str = "1 day",
    fill_col: str = "filled_value",
) -> DataFrame:
    """Expand `bucketed` (one row per (key, bucket) with `value_col`)
    into each key's dense bucket grid and carry the last observed value
    into the holes.

    Output: (key_cols..., bucket_col, value_col, fill_col,
    ``is_gap``) — `value_col` stays NULL on generated rows, `fill_col`
    is the LOCF value everywhere (NULL before a key's first
    observation, which gapfill deliberately does not invent).

    `bucketed` is cached here: it feeds BOTH the envelope aggregate and
    the grid join, and without the cache each consumer re-evaluates the
    lineage back to the fact scan (measured: 2 logical → 4 runtime
    scans; AQE does not dedupe the two subtrees). The cached relation
    is bucket-cardinality — the already-aggregated small side.
    """
    bucketed = bucketed.cache()
    env = bucketed.groupBy(*key_cols).agg(
        F.min(bucket_col).alias("_b0"), F.max(bucket_col).alias("_b1")
    )
    grid = env.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("_b0"), F.col("_b1"), F.expr(f"INTERVAL {step}"))
        ).alias(bucket_col),
    )
    joined = grid.join(bucketed, [*key_cols, bucket_col], "left_outer")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(bucket_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *key_cols,
        bucket_col,
        value_col,
        F.last(value_col, ignorenulls=True).over(w).alias(fill_col),
        F.col(value_col).isNull().alias("is_gap"),
    )
