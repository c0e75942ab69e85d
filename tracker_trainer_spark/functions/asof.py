"""As-of join: enrich each left row with the most recent right row at or
before it in event time, per key.

Spark has no native as-of join (reference has none either; this is a
training-data-pipeline extension — attributing an outcome event to the
latest preceding context event is the row-level shape of the reference's
reward→decision attribution, cf. /root/reference/src/ingest/partition.py
merge semantics, which attribute by explicit decision_id instead of by
time).

The naive formulations both collapse at scale: an inequality theta-join
(`l.ts >= r.ts`) is a quadratic nested-loop over each key group, and a
per-key `collect_list` + UDF materializes whole groups in memory. The
scalable composition used here: union both sides tagged, shuffle ONCE on
the key, and carry the latest right payload forward with a running
last-non-null window. Cost = one exchange + one in-partition sort —
identical to a groupBy on the key, independent of how far back matches
reach. Skewed keys degrade exactly like a skewed groupBy and respond to
the same AQE handling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of-backward join, inclusive (right.on <= left.on).

    Returns every left row with ``{prefix}{c}`` columns for each
    ``right_cols`` entry, NULL when no right row precedes it. Ties on
    ``on`` match (the right row sorts before the left row at equal
    timestamps), mirroring DuckDB/pandas ``ASOF JOIN`` / ``merge_asof``
    inclusive-backward semantics.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by_cols + [on]]

    payload = F.struct(*[F.col(c) for c in right_cols])
    left_side = left.select(
        *by_cols,
        F.col(on).alias("_on"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lpay"),
        F.lit(None).cast(
            right.select(payload.alias("_p")).schema["_p"].dataType
        ).alias("_rpay"),
    )
    right_side = right.select(
        *by_cols,
        F.col(on).alias("_on"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("_l")
            ).schema["_l"].dataType
        ).alias("_lpay"),
        payload.alias("_rpay"),
    )

    # one shuffle on the key; the running last-non-null carries the most
    # recent right payload onto every subsequent row in time order
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col("_on").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        left_side.unionByName(right_side)
        .withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    out_cols: list[Column] = [
        F.col(f"_lpay.{c}").alias(c) for c in left.columns
    ] + [F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_cols]
    return carried.select(*out_cols)
