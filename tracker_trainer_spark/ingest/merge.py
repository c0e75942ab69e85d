"""The core relational operator: reward ↔ decision merge.

Reference semantics (reference: src/ingest/partition.py:155-213):
grouped by ``decision_id`` —
- item/context/count/sample: first non-null value in the group;
- rewards: keyed union of all partial reward dicts, duplicate
  ``message_id`` deduped with dict-update semantics
  (reference: src/ingest/partition.py:202-210);
- reward = sum(rewards.values()); empty → ('{}', 0.0).

The merge is associative, commutative and idempotent (re-merging merged
output with new partials converges — "eventual consistency",
reference: src/ingest/partition.py:448-453,
tests/tracker/test_merge_rewarded_decisions.py:190-222).

Spark-first: a single ``groupBy(decision_id)`` hash aggregation — no
sort, no windowing. The reference's sorted-array group detection and
singleton fast path (src/ingest/partition.py:111-153,215-268) are
subsumed by Spark's hash agg + AQE skew handling. Map union relies on
``spark.sql.mapKeyDedupPolicy=LAST_WIN`` (set by session.get_spark).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERGE_VALUE_COLS = ("item", "context", "count", "sample")


def _union_rewards(col: str = "rewards") -> Column:
    """Aggregate expression: keyed union of reward maps within a group.

    LINEAR in group size: flatten all entries once, then ONE
    map_from_entries build (which applies LAST_WIN key dedup, same as
    map_concat under the session's mapKeyDedupPolicy). The natural
    fold — aggregate(collect_list, map_concat) — copies the accumulated
    map every step: O(n²) per group, which a 10⁶-partial hot key turns
    into ~10¹² operations on one reducer (measured: unbounded;
    scripts/skew_stress.py). collect_list skips nulls (decision rows
    carry no rewards map).
    """
    entries = F.flatten(
        F.transform(F.collect_list(col), lambda m: F.map_entries(m))
    )
    return F.map_from_entries(entries)


def sum_map_values(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(F.map_values(c), F.lit(0.0), lambda a, x: a + x)


def merge_rewarded_decisions(df: DataFrame, group_cols=("decision_id",),
                             salt_buckets: int | None = None) -> DataFrame:
    """groupBy(decision_id) merge; input/output in REWARDED_DECISION_MAP_SCHEMA.

    If `model` is a column and in ``group_cols``, the whole multi-model
    batch merges in one shuffle (replaces the reference's per-model
    ThreadPool fan-out, src/ingest/ingest_firehose.py:56-60).

    ``salt_buckets``: two-stage salted aggregation for hot keys — a
    viral decision accumulating millions of reward partials would
    otherwise put its whole group on one reducer. The merge is
    associative (first-non-null payload, keyed map union, recomputed
    sum), so partial-agg on (key, salt) then final-agg on key is exact.
    Hash agg already does map-side partial combining, and AQE splits
    skewed *join* partitions — but skewed *aggregation* keys still need
    salting; leave None unless key skew is real (it doubles shuffles).
    """
    # first(ignorenulls) picks SOME non-null group value — unordered, like
    # the reference's argmax-over-not-nan (src/ingest/partition.py:190-191)
    # after an unstable sort. Well-formed data has at most one distinct
    # non-null payload per decision_id (a decision is tracked once), so
    # the choice is unique in practice; same for LAST_WIN on duplicate
    # message_ids carrying the same reward. Conflicting payloads would be
    # producer corruption, where any-group-member is the documented pick.
    aggs = [F.first(c, ignorenulls=True).alias(c) for c in MERGE_VALUE_COLS]
    aggs.append(_union_rewards().alias("rewards"))
    if not salt_buckets:
        return df.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*group_cols, "_salt").agg(*aggs)
    return partial.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)


def json_number(col) -> Column:
    """Render a double as a minimal JSON number (int-valued → no '.0').

    Keeps the stored rewards JSON close to the reference's orjson output,
    where integer rewards serialize without a fractional part.
    """
    c = F.col(col) if isinstance(col, str) else col
    as_long = c.cast("long")
    return F.when(
        (c == as_long.cast("double")), as_long.cast("string")
    ).otherwise(c.cast("string"))


def rewards_map_to_json(col) -> Column:
    """map<string,double> → canonical JSON string with sorted keys.

    Sorted keys for parity with ``orjson.OPT_SORT_KEYS``
    (reference: src/ingest/utils.py:75-77); '{}' for empty/null.
    """
    c = F.col(col) if isinstance(col, str) else col
    entries = F.array_sort(F.map_entries(c))
    rendered = F.concat(
        F.lit("{"),
        F.array_join(
            F.transform(
                entries,
                lambda e: F.concat(
                    F.lit('"'), e["key"], F.lit('":'), json_number(e["value"])
                ),
            ),
            ",",
        ),
        F.lit("}"),
    )
    return F.coalesce(rendered, F.lit("{}"))


def finalize_for_storage(merged: DataFrame) -> DataFrame:
    """Map-schema merged rows → at-rest REWARDED_DECISION_SCHEMA.

    rewards → sorted-key JSON string; reward → sum of map values
    (0.0 when empty), matching reference DF_SCHEMA
    (src/ingest/firehose_record.py:32-40).
    """
    extra = [c for c in merged.columns
             if c not in ("decision_id", *MERGE_VALUE_COLS, "rewards")]
    return merged.select(
        *extra,
        "decision_id",
        "item",
        "context",
        F.col("count").cast("double").alias("count"),
        "sample",
        rewards_map_to_json("rewards").alias("rewards"),
        F.coalesce(sum_map_values("rewards"), F.lit(0.0)).alias("reward"),
    )


def parse_stored(df: DataFrame) -> DataFrame:
    """At-rest rows → map schema, for idempotent re-merge with new partials."""
    extra = [c for c in df.columns if c not in ("rewards", "reward")]
    return df.select(
        *extra,
        F.from_json("rewards", "map<string,double>").alias("rewards"),
    )
