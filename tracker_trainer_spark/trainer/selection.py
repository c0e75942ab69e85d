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
