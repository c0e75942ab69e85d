"""Stream-stream watermarked join: decisions × rewards as two live streams.

The third Spark-native expression of the reference's reward↔decision
semantics (SURVEY §2.11), alongside (a) foreachBatch merge + groom
repair (ingest_stream.py) and (b) stateful in-stream merge
(stateful_merge.py). Here both sides are unbounded streams and Spark's
stream-stream join holds each side's state only as long as the other
side's watermark + the time-range condition require:

- a decision is held for ``max_delay`` past its timestamp (a reward
  arriving later than that can no longer match the range predicate);
- a reward is held until the decision watermark passes its timestamp;
- both evictions are computed by the engine FROM the join condition —
  no manual state TTL, no groom pass, state bounded regardless of
  stream age.

Trade-off vs the reference (same honesty as stateful_merge): rewards
later than the watermark+delay envelope are DROPPED, where the
reference's orphan-row + groom design eventually repairs them. That is
the price of a no-repair pipeline; the envelope is explicit in the two
knobs.

Scale: the join state is sharded by the equi-join keys across the
state-store partitions — per-executor state is (open decisions within
the delay window) / shuffle partitions, flat in stream age. The same
function body runs on batch frames (withWatermark is a no-op there and
the range predicate is an ordinary theta residual on the equi-join), so
the batch call IS the oracle for the streaming one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm_ts(df: DataFrame, col: str) -> DataFrame:
    """Parquet event times arrive TIMESTAMP_NTZ; watermarks require
    TIMESTAMP (same normalization + same non-timestamp guard as
    ingest_stream._normalize_event_time — a blind cast would read
    bigint nanos as seconds)."""
    from .ingest_stream import _normalize_event_time

    return _normalize_event_time(df, col)


def decisions_rewards_join(
    decisions: DataFrame,
    rewards: DataFrame,
    keys: tuple[str, ...] = ("model", "decision_id"),
    decision_ts: str = "decision_ts",
    reward_ts: str = "reward_ts",
    max_delay: str = "2 hours",
    decision_watermark: str = "30 minutes",
    reward_watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join each reward to its decision within the lateness envelope.

    Equi-join on ``keys`` plus the time-range residual
    ``decision_ts <= reward_ts <= decision_ts + max_delay`` — exactly
    the shape Spark requires to derive state eviction for stream-stream
    joins. ``how='leftOuter'`` additionally emits unmatched decisions
    (with null reward columns) once the reward watermark passes their
    eligibility window — the streaming spelling of the trainer's
    orphan-decision rows (reward null-filled later, P2).

    Works identically on batch frames: watermarks no-op, the residual
    becomes a plain post-join filter, and the batch result is the
    parity oracle for the drained stream.
    """
    d = _norm_ts(decisions, decision_ts)
    r = _norm_ts(rewards, reward_ts)
    if d.isStreaming:
        d = d.withWatermark(decision_ts, decision_watermark)
    if r.isStreaming:
        r = r.withWatermark(reward_ts, reward_watermark)
    cond = None
    for k in keys:
        c = d[k] == r[k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (r[reward_ts] >= d[decision_ts])
        & (r[reward_ts] <= d[decision_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    joined = d.join(r, cond, how)
    # project one copy of the key columns (both sides carry them)
    return joined.select(
        *[d[k].alias(k) for k in keys],
        d[decision_ts].alias(decision_ts),
        r[reward_ts].alias(reward_ts),
        *[
            r[c].alias(c)
            for c in r.columns
            if c not in keys and c != reward_ts
        ],
    )
