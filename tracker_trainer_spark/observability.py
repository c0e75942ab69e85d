"""Pipeline observability via Spark's ``observe()`` API.

At 100 TB the wrong way to count what a job did is a second aggregation
pass (another full scan); the right way is ``df.observe(...)`` — named
accumulator-backed metrics that ride the EXISTING action, collected on
the driver for free when the job finishes. This module packages the
engine's standard metric sets:

- ``merge_metrics``: rows, rewarded-row count, reward mass — the
  ingest-merge audit line the reference emits from its Lambda stats
  (reference: src/ingest/partition.py's merge accounting).
- ``training_metrics``: rows, orphan count, reward nulls — the
  load-path sanity line before a fit.

Batch usage::

    obs, df = merge_metrics(df)
    df.write.parquet(...)          # one action
    stats = obs.get                # no extra scan

Streaming: pass the same observed frame into ``writeStream``; metrics
surface per micro-batch on ``StreamingQueryListener`` progress events
(``observedMetrics[name]``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_frame(df: DataFrame, name: str, *exprs) -> tuple[Observation, DataFrame]:
    """Attach named aggregate metrics to the frame's next action."""
    obs = Observation(name)
    return obs, df.observe(obs, *exprs)


def merge_metrics(df: DataFrame, name: str = "merge_metrics"):
    """Ingest-merge audit metrics: total rows, rows holding at least one
    reward, and total reward mass."""
    return observe_frame(
        df,
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.count("reward").alias("n_rewarded"),
        F.coalesce(F.sum("reward"), F.lit(0.0)).alias("reward_sum"),
    )


def training_metrics(df: DataFrame, name: str = "training_metrics"):
    """Trainer load-path sanity metrics: rows, orphan rows (no item),
    and null-reward rows (pre null-fill)."""
    return observe_frame(
        df,
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("item").isNull(), 1)).alias("n_orphans"),
        F.count(F.when(F.col("reward").isNull(), 1)).alias("n_null_reward"),
    )
