"""Canonical Spark schemas for the engine.

Derived from the reference's fixed 7-column rewarded-decision frame
(reference: src/ingest/firehose_record.py:32-40,
src/trainer/code/constants.py:18-26). Arbitrary nested JSON stays inside
string columns at rest (parity with the reference's data model); the
in-flight representation upgrades ``rewards`` to a typed map so the merge
aggregation is a native hash agg.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# Track-record scalar fields; item/context/sample are extracted as raw JSON
# substrings from the line (they are arbitrarily typed), see ingest.reader.
TRACK_FIELDS = [
    "message_id",  # KSUID; primary key of the record
    "model",       # model name
    "count",       # decisions only: number of candidates (>=1)
    "item",        # decisions only: chosen item, any JSON
    "context",     # decisions only: decision context, any JSON
    "sample",      # decisions only: unchosen sample; ABSENT vs null matters
    "decision_id", # rewards only: KSUID of the rewarded decision
    "reward",      # rewards only: numeric
]

# At-rest schema: one row per decision_id, parity with reference DF_SCHEMA.
REWARDED_DECISION_SCHEMA = StructType([
    StructField("decision_id", StringType()),
    StructField("item", StringType()),      # JSON string; NULL for orphaned rewards
    StructField("context", StringType()),   # JSON string; NULL for orphaned rewards
    StructField("count", DoubleType()),     # >= 1 or NULL (nullable-float trick)
    StructField("sample", StringType()),    # JSON string; 'null' != NULL
    StructField("rewards", StringType()),   # JSON dict {message_id: reward}; '{}'
    StructField("reward", DoubleType()),    # sum(rewards.values()); 0.0 when empty
])

# In-flight schema: rewards as a typed map for native aggregation.
REWARDED_DECISION_MAP_SCHEMA = StructType([
    StructField("decision_id", StringType()),
    StructField("item", StringType()),
    StructField("context", StringType()),
    StructField("count", DoubleType()),
    StructField("sample", StringType()),
    StructField("rewards", MapType(StringType(), DoubleType())),
])

MODEL_NAME_PATTERN = r"^[a-zA-Z0-9][\w\-.]{0,63}$"
