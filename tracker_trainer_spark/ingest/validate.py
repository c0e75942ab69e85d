"""Record validation predicates.

Reference semantics (reference: src/ingest/firehose_record.py:57-121):
- every record: valid KSUID ``message_id`` (27-char base62, not future),
  valid ``model`` name (regex, length 1..64).
- ``count`` present ⇒ decision record: count must be a JSON integer >= 1;
  a present ``sample`` (even set-null) with count == 1 is invalid.
- ``count`` absent ⇒ reward record: valid KSUID ``decision_id`` and a
  numeric (non-bool, non-string) ``reward`` are required.

Everything is a column predicate; the only Python involved is the
vectorized KSUID timestamp check (Arrow batches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..ksuid import is_valid_ksuid_col
from ..schemas import MODEL_NAME_PATTERN
from .reader import _INT_TYPE, _NUMERIC_TYPE_RE


def is_decision_col() -> Column:
    """Decision iff a (valid-integer) count >= 1 is present.

    Invalid counts make the whole record invalid, so downstream of
    :func:`valid_record_predicate` this is simply `count IS NOT NULL`.
    """
    return F.col("count").isNotNull()


def valid_record_predicate(now_ts: float | None = None) -> Column:
    """Predicate over parse_track_records output: keep valid records."""
    base = (
        F.col("parsed")
        & is_valid_ksuid_col("message_id", now_ts)
        & F.col("model").isNotNull()
        & (F.length("model") <= 64)
        & F.col("model").rlike(MODEL_NAME_PATTERN)
    )
    # count present at all (any type) forces the decision-record rules
    count_present = F.col("count_type").isNotNull()
    valid_decision = (
        (F.col("count_type") == _INT_TYPE)
        & (F.col("count") >= 1)
        & ~(F.col("has_sample") & (F.col("count") == 1))
    )
    valid_reward = (
        is_valid_ksuid_col("decision_id", now_ts)
        & F.col("has_reward")
        & F.col("reward_type").rlike(_NUMERIC_TYPE_RE)
    )
    return base & F.when(count_present, valid_decision).otherwise(valid_reward)


def split_valid(parsed: DataFrame, now_ts: float | None = None) -> tuple[DataFrame, DataFrame]:
    """(valid, invalid) split in one pass each."""
    pred = valid_record_predicate(now_ts)
    return parsed.where(pred), parsed.where(~F.coalesce(pred, F.lit(False)))


def invalid_record_histogram(parsed: DataFrame, now_ts: float | None = None) -> DataFrame:
    """Count invalid records by coarse failure reason.

    Mirrors the reference's exception histogram
    (reference: src/ingest/firehose_record.py:223-232) as a groupBy.
    """
    pred = valid_record_predicate(now_ts)
    reason = (
        F.when(~F.col("parsed"), F.lit("unparseable"))
        .when(~is_valid_ksuid_col("message_id", now_ts), F.lit("invalid message_id"))
        .when(
            F.col("model").isNull()
            | (F.length("model") > 64)
            | ~F.col("model").rlike(MODEL_NAME_PATTERN),
            F.lit("invalid model"),
        )
        .when(
            F.col("count_type").isNotNull()
            & ((F.col("count_type") != _INT_TYPE) | (F.col("count") < 1)),
            F.lit("invalid count"),
        )
        .when(
            F.col("count_type").isNotNull() & F.col("has_sample") & (F.col("count") == 1),
            F.lit("invalid count of 1 with sample"),
        )
        .when(
            F.col("count_type").isNull() & ~is_valid_ksuid_col("decision_id", now_ts),
            F.lit("invalid decision_id"),
        )
        .otherwise(F.lit("invalid reward"))
    )
    return (
        parsed.where(~F.coalesce(pred, F.lit(False)))
        .groupBy(reason.alias("reason"))
        .count()
    )
