"""Validated track records → rewarded-decision rows (pre-merge).

Reference semantics (reference: src/ingest/firehose_record.py:132-157):
- decision: decision_id ← message_id; item/context always JSON-encoded
  (absent → 'null' — ``json_dumps(None)``); sample encoded only when the
  key was present (set-null → 'null', absent → SQL NULL); count kept.
- reward: decision_id kept; rewards ← {message_id: reward}; all other
  columns NULL.

The in-flight `rewards` column is a typed map so the merge is a native
hash aggregation; it renders to a sorted-key JSON string only at the
storage boundary (see merge.finalize_for_storage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .validate import is_decision_col


def to_rewarded_decisions(valid: DataFrame, keep_model: bool = True) -> DataFrame:
    """Project validated records into REWARDED_DECISION_MAP_SCHEMA rows."""
    is_decision = is_decision_col()
    null_map = F.lit(None).cast("map<string,double>")
    cols = [
        F.when(is_decision, F.col("message_id")).otherwise(F.col("decision_id")).alias("decision_id"),
        F.when(is_decision, F.coalesce("item_json", F.lit("null"))).alias("item"),
        F.when(is_decision, F.coalesce("context_json", F.lit("null"))).alias("context"),
        F.col("count").cast("double").alias("count"),
        F.when(is_decision & F.col("has_sample"), F.coalesce("sample_json", F.lit("null"))).alias("sample"),
        F.when(~is_decision, F.create_map(F.col("message_id"), F.col("reward"))).otherwise(null_map).alias("rewards"),
    ]
    if keep_model:
        cols.insert(0, F.col("model"))
    return valid.select(*cols)
