"""Feature selection: top-N features by summed row weight.

Reference: a dask tree-reduction accumulating ``weights[feature] += w``
then a global sort (reference: src/trainer/code/feature_selection.py:5-41;
N=1000 code default / 300 deploy, src/trainer/code/config.py:94).

Spark-first: explode the flattened maps' key sets → one partial+final
hash agg → top-N. The returned list (≤N names) is the only driver-side
product, matching the reference's bounded string-table posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_FEATURES = 1000  # reference: src/trainer/code/config.py:94


def feature_weights(flat_df: DataFrame, weight_col: str = "w",
                    num_col: str = "num_features", str_col: str = "str_features") -> DataFrame:
    """DataFrame (feature, weight): summed row weight per observed feature."""
    keys = F.concat(F.map_keys(F.col(num_col)), F.map_keys(F.col(str_col)))
    return (
        flat_df.select(F.explode(keys).alias("feature"), F.col(weight_col).alias("w"))
        .groupBy("feature")
        .agg(F.sum("w").alias("weight"))
    )


def select_features(flat_df: DataFrame, max_features: int = MAX_FEATURES,
                    weight_col: str = "w", num_col: str = "num_features",
                    str_col: str = "str_features") -> list[str]:
    """Top ``max_features`` feature names by weight (desc, name-asc ties)."""
    top = (
        feature_weights(flat_df, weight_col, num_col, str_col)
        .orderBy(F.desc("weight"), F.asc("feature"))
        .limit(max_features)
        .collect()
    )
    return [r["feature"] for r in top]


def combined_feature_string_stats(
    flat_df: DataFrame, weight_col: str = "w", target_col: str = "y",
    num_col: str = "num_features", str_col: str = "str_features",
) -> DataFrame:
    """ONE pass over the flat relation serving BOTH selection (A4) and
    string stats (A5): rows keyed (feature, value) where ``value`` is
    NULL for numeric-feature occurrences and the string value otherwise.

    - A5 string stats = the ``value IS NOT NULL`` slice (same schema as
      :func:`~tracker_trainer_spark.trainer.string_tables.string_stats`).
    - A4 feature weights = ``groupBy(feature).sum(weight)`` over ALL
      rows — a re-aggregation of partials that is EXACT only when the
      row weights sum without rounding (the trainer's pre-IPW encode
      uses w=1.0; callers with fractional weights should keep the
      single-level :func:`feature_weights` to avoid reassociating a
      float sum — the q9/revenue_rollup lesson).

    Exists so the flagship encode's two driver aggregations share one
    scan of the cached flat relation instead of two (SURVEY §7.4 item 4;
    profiled r9: each extra pass is a full cache scan + a job)."""
    entries = F.concat(
        F.map_entries(F.col(str_col)),
        F.transform(
            F.map_keys(F.col(num_col)),
            lambda k: F.struct(
                k.alias("key"), F.lit(None).cast("string").alias("value")
            ),
        ),
    )
    ex = flat_df.select(
        F.explode(entries).alias("e"),
        F.col(weight_col).alias("w"),
        F.col(target_col).alias("y"),
    )
    return ex.groupBy(
        F.col("e.key").alias("feature"), F.col("e.value").alias("value")
    ).agg(
        F.sum("w").alias("weight"),
        F.sum(F.col("y") * F.col("w")).alias("target"),
        F.count(F.lit(1)).alias("count"),
    )
