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


def _on_numeric(df: DataFrame, on: str) -> Column:
    """Ordering/difference key for the `on` column: epoch microseconds
    for timestamps (NTZ normalized via TIMESTAMP cast — constant
    session-tz offset, cancels in differences), the raw value for
    numerics."""
    t = df.schema[on].dataType.simpleString()
    if t.startswith("timestamp"):
        return F.unix_micros(F.col(on).cast("timestamp"))
    return F.col(on)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """Left as-of join, inclusive, with direction and staleness bound.

    ``direction``:
    - ``'backward'`` (default): most recent right row with
      ``right.on <= left.on`` — DuckDB ``ASOF JOIN`` / kdb ``aj`` /
      pandas ``merge_asof`` default semantics;
    - ``'forward'``: earliest right row with ``right.on >= left.on``;
    - ``'nearest'``: whichever of the two is closer in time; exact ties
      resolve backward (pandas ``merge_asof(direction='nearest')``
      rule).

    ``tolerance``: maximum |left.on − match.on| for a match to count —
    in SECONDS when ``on`` is a timestamp, in the column's own units
    when numeric (same contract as pandas ``merge_asof(tolerance=…)``).
    Matches outside the bound become NULLs, not dropped rows.

    Returns every left row with ``{prefix}{c}`` columns for each
    ``right_cols`` entry, NULL when no right row qualifies. Ties on
    ``on`` match in both directions.

    Scale: all three directions ride ONE key shuffle. 'backward' and
    'forward' are each a single running last-non-null window; 'nearest'
    adds the opposite-direction window over the same exchange (an extra
    in-partition sort, no second shuffle). Tolerance is a post-window
    column comparison — no plan change.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by_cols + [on]]
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")

    tol_units = None
    if tolerance is not None:
        is_ts = left.schema[on].dataType.simpleString().startswith("timestamp")
        tol_units = tolerance * 1_000_000 if is_ts else tolerance

    # the match payload carries the right row's own `on` (as the numeric
    # ordering key) so tolerance and nearest-distance are computable
    # after the carry
    payload = F.struct(
        *[F.col(c) for c in right_cols], _on_numeric(right, on).alias("_ron")
    )
    left_side = left.select(
        *by_cols,
        _on_numeric(left, on).alias("_on"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lpay"),
        F.lit(None).cast(
            right.select(payload.alias("_p")).schema["_p"].dataType
        ).alias("_rpay"),
    )
    right_side = right.select(
        *by_cols,
        _on_numeric(right, on).alias("_on"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("_l")
            ).schema["_l"].dataType
        ).alias("_lpay"),
        payload.alias("_rpay"),
    )

    # one shuffle on the key; each direction's window carries the
    # closest right payload onto left rows in its time order. At equal
    # `on`, the right row sorts so the left row sees it (inclusive).
    unioned = left_side.unionByName(right_side)
    w_back = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col("_on").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col("_on").desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def _bounded(match: Column, lo: Column) -> Column:
        """Null out matches beyond the tolerance bound."""
        if tol_units is None:
            return match
        return F.when(
            F.abs(lo - match["_ron"]) <= F.lit(tol_units), match
        )

    if direction == "backward":
        carried = unioned.withColumn(
            "_match", F.last("_rpay", ignorenulls=True).over(w_back)
        )
    elif direction == "forward":
        carried = unioned.withColumn(
            "_match", F.last("_rpay", ignorenulls=True).over(w_fwd)
        )
    else:  # nearest: both windows over the same exchange, pick closer
        carried = (
            unioned.withColumn("_mb", F.last("_rpay", ignorenulls=True).over(w_back))
            .withColumn("_mf", F.last("_rpay", ignorenulls=True).over(w_fwd))
            .withColumn(
                "_match",
                F.when(F.col("_mb").isNull(), F.col("_mf"))
                .when(F.col("_mf").isNull(), F.col("_mb"))
                .when(
                    # tie → backward (pandas nearest rule)
                    (F.col("_on") - F.col("_mb")["_ron"])
                    <= (F.col("_mf")["_ron"] - F.col("_on")),
                    F.col("_mb"),
                )
                .otherwise(F.col("_mf")),
            )
        )
    carried = (
        carried.withColumn("_match", _bounded(F.col("_match"), F.col("_on")))
        .where(F.col("_side") == 1)
    )
    out_cols: list[Column] = [
        F.col(f"_lpay.{c}").alias(c) for c in left.columns
    ] + [F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_cols]
    return carried.select(*out_cols)
