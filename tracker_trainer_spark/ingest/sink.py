"""Timeline sink: merged rewarded decisions → partitioned Parquet table.

Reference layout: one ZSTD Parquet file per ≤10,000-row chunk under
``rewarded_decisions/{model}/parquet/yyyy/mm/dd/`` with the key range
encoded in the filename (reference: src/ingest/partition.py:77-91,
432-458; limit src/ingest/config.py:13).

Spark-first redesign: a Hive-partitioned table
``model=<m>/dt=<yyyy-mm-dd>/`` where ``dt`` derives from the KSUID
timestamp **embedded in decision_id** — i.e. partitioning is by key
range, not arrival time. Consequences at scale:

- Late rewards for a decision land in the decision's own date partition,
  so the reference's overlapping-file repair loop collapses into simple
  per-partition compaction (see groom.py).
- Partition pruning replaces the filename-range trick: recency-bounded
  training loads prune on ``dt`` without listing file contents.
- ``maxRecordsPerFile`` + ``sortWithinPartitions`` keep the ≤10k-row
  sorted-file invariant (J1/G1) and give Parquet min/max footer stats on
  decision_id for row-group skipping. In-file order is guaranteed for a
  task writing ≤64 distinct ``(model, dt)`` combos (the concurrent-writer
  cap; a wider backfill falls back to the writer's own non-stable sort
  for the overflow) — ``groom`` rewrites repartitioned by partition and
  restores order for any partition it touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ksuid import ksuid_timestamp

MAX_RECORDS_PER_FILE = 10_000  # reference: src/ingest/config.py:13


# SQLConf is session-global: two threads save/set/restore-ing the same
# key interleave into a permanent leak (e.g. partitionOverwriteMode left
# 'dynamic' for every later write). One process-wide lock serializes the
# set→write→restore window; writes to one timeline are already serialized
# by timeline_lock, so this only gates cross-timeline concurrency.
_CONF_LOCK = __import__("threading").RLock()


class _conf:
    """Temporarily set a SQLConf around a write, restoring the prior value.

    Holds the process-wide conf lock for the whole with-block — conf
    mutations must not interleave across threads on a shared session.
    """

    def __init__(self, spark, key: str, value: str):
        self.spark, self.key, self.value = spark, key, value

    def __enter__(self):
        _CONF_LOCK.acquire()
        try:
            self.prev = self.spark.conf.get(self.key)
        except Exception:
            self.prev = None
        self.spark.conf.set(self.key, self.value)

    def __exit__(self, *exc):
        try:
            if self.prev is None:
                self.spark.conf.unset(self.key)
            else:
                self.spark.conf.set(self.key, self.prev)
        finally:
            _CONF_LOCK.release()


def with_partition_date(df: DataFrame, id_col: str = "decision_id") -> DataFrame:
    """Add `dt` (yyyy-MM-dd string) from the KSUID-embedded timestamp."""
    ts = ksuid_timestamp(F.col(id_col))
    return df.withColumn("dt", F.date_format(F.timestamp_seconds(ts), "yyyy-MM-dd"))


def write_timeline(df: DataFrame, path: str, partition_cols=("model", "dt"),
                   mode: str = "append",
                   max_records_per_file: int = MAX_RECORDS_PER_FILE,
                   lock: bool = True) -> None:
    """Write at-rest rewarded-decision rows into the partitioned table.

    ``lock=True`` serializes the append against a concurrent groom —
    groom's dynamic-partition overwrite rewrites whole partitions from a
    snapshot, so an unserialized append landing mid-groom would be
    replaced away (SURVEY §7.4 risk 6; see ingest/lock.py).
    """
    if "dt" in partition_cols and "dt" not in df.columns:
        df = with_partition_date(df)
    parts = [c for c in partition_cols if c in df.columns]

    def _write():
        # sort by (partition cols, decision_id) and write through the
        # concurrent-writers path: the default sort-based dynamic-
        # partition writer re-sorts on empty2null(partition cols) — an
        # expression our column ordering can never match — with a
        # non-stable sort that scrambles decision_id inside files.
        # Concurrent writers stream rows in arrival (= sorted) order,
        # keeping files sorted by decision_id (J1/O1 parity, reference:
        # src/ingest/partition.py:94-97). A task writing more distinct
        # partitions than the cap falls back to the sorting path for the
        # remainder — losing in-file order there, never correctness.
        with _conf(df.sparkSession,
                   "spark.sql.maxConcurrentOutputFileWriters", "64"):
            (
                df.sortWithinPartitions(*parts, "decision_id")
                .write.mode(mode)
                .option("maxRecordsPerFile", max_records_per_file)
                .partitionBy(*parts)
                .parquet(path)
            )

    if lock:
        from .lock import timeline_lock

        with timeline_lock(path):
            _write()
    else:
        _write()


def read_timeline(spark, path: str, columns=None) -> DataFrame:
    """Scan the timeline table (column-pruned when ``columns`` given)."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df
