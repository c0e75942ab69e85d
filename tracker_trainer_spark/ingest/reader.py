"""Track-record scan: gzipped JSONL → parsed, typed DataFrame.

Reference semantics: line-by-line orjson parse of Firehose batches with
per-record validation and invalid-record counting
(reference: src/ingest/firehose_record.py:195-238).

Spark-first design: lines are read with the text source (gzip is
transparently decoded) and parsed JVM-side with Spark 4 VARIANT
(``try_parse_json``), which preserves exact JSON semantics — including
the absent-vs-null distinction for ``sample`` and arbitrary nesting —
without any Python UDF in the hot path. ``to_json`` on VARIANT emits
sorted object keys, matching the reference's ``orjson.OPT_SORT_KEYS``
canonical form (reference: src/ingest/utils.py:75-77).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Variant schema strings that denote a JSON integer / numeric value.
_INT_TYPE = "BIGINT"
_NUMERIC_TYPE_RE = r"^(BIGINT|DOUBLE|FLOAT|DECIMAL)"


def read_track_lines(spark: SparkSession, paths) -> DataFrame:
    """Raw line scan of JSONL(.gz) files; one `line` column."""
    return spark.read.text(paths).withColumnRenamed("value", "line")


def parse_track_records(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse raw JSON lines into typed track-record columns.

    Output columns:
      parsed         bool — line was syntactically valid JSON object
      message_id     string
      model          string
      count          long (null when absent/JSON-null/non-integer)
      count_type     variant schema string of the raw count (null = absent)
      item_json      canonical JSON string of `item` (null = absent)
      context_json   canonical JSON string of `context` (null = absent)
      sample_json    canonical JSON string of `sample` (null = absent OR set-null)
      has_sample     bool — `sample` key present (set-null included)
      sample_is_null bool — `sample` present and JSON null
      decision_id    string (reward records)
      reward         double (null when absent/non-numeric)
      reward_type    variant schema string of the raw reward
      has_reward     bool — `reward` key present and non-null
    """
    v = F.try_parse_json(F.col(line_col))

    def vget(path):
        return F.variant_get(v, path, "variant")

    count_v = vget("$.count")
    sample_v = vget("$.sample")
    reward_v = vget("$.reward")

    present = lambda c: c.isNotNull() & ~F.is_variant_null(c)  # noqa: E731

    return df.select(
        F.col(line_col),
        v.isNotNull().alias("parsed"),
        F.variant_get(v, "$.message_id", "string").alias("message_id"),
        F.variant_get(v, "$.model", "string").alias("model"),
        F.when(present(count_v), F.try_variant_get(count_v, "$", "long")).alias("count"),
        F.when(present(count_v), F.schema_of_variant(count_v)).alias("count_type"),
        F.to_json(vget("$.item")).alias("item_json"),
        F.to_json(vget("$.context")).alias("context_json"),
        F.when(present(sample_v), F.to_json(sample_v)).alias("sample_json"),
        sample_v.isNotNull().alias("has_sample"),
        (sample_v.isNotNull() & F.is_variant_null(sample_v)).alias("sample_is_null"),
        F.variant_get(v, "$.decision_id", "string").alias("decision_id"),
        F.when(present(reward_v), F.try_variant_get(reward_v, "$", "double")).alias("reward"),
        F.when(present(reward_v), F.schema_of_variant(reward_v)).alias("reward_type"),
        present(reward_v).alias("has_reward"),
    )
