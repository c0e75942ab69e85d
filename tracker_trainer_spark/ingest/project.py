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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .validate import is_decision_col


def wrap_primitive_json(col) -> Column:
    """P9 (reference: src/ingest/utils.py:80-95): JSON null → ``{}``, bare
    primitive → ``{"$value": <primitive>}``; dicts/lists pass through.

    NOTE: dead code in the reference v8's own ingest — its
    ``to_rewarded_decision_dict`` uses plain ``json_dumps``
    (src/ingest/firehose_record.py:137-157), so unwrapped persistence IS
    reference parity. Exposed behind ``to_rewarded_decisions(
    wrap_primitives=True)`` for timelines that carry the documented
    wrapped form (the reference's trainer goldens do; flatten handles
    both identically up to the ``.$value`` path suffix).
    """
    c = F.col(col) if isinstance(col, str) else col
    t = F.ltrim(c)
    return F.when(c.isNull() | (t == "null"), F.lit("{}")).otherwise(
        F.when(t.startswith("{") | t.startswith("["), c)
        .otherwise(F.concat(F.lit('{"$value":'), t, F.lit("}")))
    )


def to_rewarded_decisions(valid: DataFrame, keep_model: bool = True,
                          wrap_primitives: bool = False) -> DataFrame:
    """Project validated records into REWARDED_DECISION_MAP_SCHEMA rows."""
    is_decision = is_decision_col()
    null_map = F.lit(None).cast("map<string,double>")
    wrap = wrap_primitive_json if wrap_primitives else (lambda c: c)
    item = F.coalesce("item_json", F.lit("null"))
    context = F.coalesce("context_json", F.lit("null"))
    sample = F.coalesce("sample_json", F.lit("null"))
    cols = [
        F.when(is_decision, F.col("message_id")).otherwise(F.col("decision_id")).alias("decision_id"),
        F.when(is_decision, wrap(item)).alias("item"),
        F.when(is_decision, wrap(context)).alias("context"),
        F.col("count").cast("double").alias("count"),
        F.when(is_decision & F.col("has_sample"), wrap(sample)).alias("sample"),
        F.when(~is_decision, F.create_map(F.col("message_id"), F.col("reward"))).otherwise(null_map).alias("rewards"),
    ]
    if keep_model:
        cols.insert(0, F.col("model"))
    return valid.select(*cols)
