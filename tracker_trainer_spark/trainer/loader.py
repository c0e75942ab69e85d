"""Trainer load path: recency-bounded, sampled, column-pruned timeline scan.

Reference (reference: src/trainer/code/parquet_io.py:18-132): newest-first
file listing with filename-derived row counts, stop after ``max_rows``,
optional file- or row-level Bernoulli sampling, orphan filtering pushed
to the parquet reader.

Spark-first: the timeline is partitioned by ``dt`` (see ingest.sink), so
the recency bound becomes *partition pruning* — a cheap count-per-dt
metadata scan picks the date cutoff driver-side (a list of dates, never
row data), and the real scan reads only pruned partitions with filters
and column pruning pushed down by Catalyst. File-level sampling loses its
reason to exist (row-level ``sample()`` distributes identically and
parallelizes better — SURVEY §2 L2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..errors import is_absent_table_error

TRAIN_COLUMNS = ["decision_id", "item", "context", "sample", "count", "reward"]


def load_training_frame(spark: SparkSession, path: str,
                        columns: list[str] | None = None,
                        max_rows: int | None = None,
                        sample: float | None = None,
                        drop_orphans: bool = True,
                        model: str | None = None,
                        seed: int = 0,
                        ignore_corrupt: bool = True) -> DataFrame:
    """Scan the rewarded-decision timeline for training.

    - ``model``: prunes the model= partition.
    - ``max_rows``: keeps the newest dt partitions whose cumulative row
      count (scaled by ``sample``) reaches the budget, then prunes.
    - ``sample``: row-level Bernoulli sample (seeded).
    - ``drop_orphans``: item/context IS NOT NULL, pushed to parquet scan
      (reference: src/trainer/code/parquet_io.py:167-188).
    - ``ignore_corrupt``: skip unreadable files instead of failing the
      job, the S8 semantics of the reference's read_parquet_safely
      (src/trainer/code/parquet_io.py:135-164) — a per-scan option, not
      a session-wide mutation.
    """
    reader = spark.read
    if ignore_corrupt:
        reader = reader.option("ignoreCorruptFiles", "true")
    try:
        df = reader.parquet(path)
    except Exception as e:  # AnalysisException: no files yet
        if not is_absent_table_error(e):
            raise
        # fresh deployment: train path sees an empty, correctly-typed
        # frame (the reference's loader likewise yields an empty DF on an
        # empty listing, src/trainer/code/parquet_io.py:40-44)
        from ..schemas import REWARDED_DECISION_SCHEMA

        df = spark.createDataFrame([], REWARDED_DECISION_SCHEMA)
        loaded_empty = True
    else:
        loaded_empty = False
    if model is not None and "model" in df.columns:
        df = df.where(F.col("model") == model)

    if max_rows is not None and not loaded_empty:
        # a real timeline without dt partitioning must fail loudly below
        # (groupBy("dt") raises), not silently skip the row budget
        frac = sample if sample else 1.0
        counts = df.groupBy("dt").count().orderBy(F.desc("dt")).collect()
        budget, keep_dts = 0.0, []
        for r in counts:
            keep_dts.append(r["dt"])
            budget += r["count"] * frac
            if budget >= max_rows:
                break
        if keep_dts:
            df = df.where(F.col("dt") >= min(keep_dts))

    if drop_orphans:
        df = df.where(F.col("item").isNotNull() & F.col("context").isNotNull())
    if sample:
        df = df.sample(fraction=sample, seed=seed)
    if columns:
        df = df.select(*[c for c in columns if c in df.columns])
    if "reward" in df.columns:
        df = df.fillna({"reward": 0.0})  # P2
    return df
