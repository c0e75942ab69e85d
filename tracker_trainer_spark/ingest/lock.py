"""Advisory timeline lock: serialize groom against ingest appends.

SURVEY §7.4 risk 6: groom rewrites partitions with dynamic partition
overwrite computed from a snapshot — an append that lands between
groom's read and its commit would be replaced away. The reference avoids
this operationally (Step Function serializes groom; ingest appends are
new S3 keys merged later — src/ingest/partition.py:340-354). With plain
Parquet directories we serialize writers explicitly; a transactional
table format (Delta/Iceberg) would subsume this.

Mechanism, by filesystem:
- **local paths** (no scheme / ``file://``): atomic ``mkdir`` of
  ``<timeline>/_lock``;
- **schemed paths** (``hdfs://``, ``s3a://``, …): an exclusive-create
  marker file through the Hadoop FileSystem API
  (``create(path, overwrite=false)``) — atomic on HDFS; on S3A it is
  atomic only with conditional-create support (hadoop-aws ≥3.4.1,
  ``fs.s3a.create.conditional.enabled``), otherwise best-effort — for
  older S3 stacks use an external lock service or a transactional table
  format (Delta/Iceberg), which subsumes this module.

Stale locks older than ``stale_after`` seconds are broken — crashed
holders cannot wedge the pipeline forever.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from urllib.parse import urlparse

LOCK_DIR = "_lock"


class TimelineLockTimeout(RuntimeError):
    pass


def is_local_path(path: str) -> bool:
    return urlparse(path).scheme in ("", "file")


@contextmanager
def timeline_lock(timeline_path: str, timeout: float = 120.0,
                  stale_after: float = 3600.0, poll: float = 0.25):
    """Hold the exclusive writer lock for a timeline directory."""
    if not is_local_path(timeline_path):
        with _hadoop_lock(timeline_path, timeout, stale_after, poll):
            yield
        return
    # strip the scheme via urlparse whenever one is present — Hadoop
    # normalizes file URIs to the single-slash form (file:/tmp/x), which
    # a '://' substring test misses, sending the mkdir to a bogus
    # relative './file:/...' directory while a plain-path caller locks
    # the real one (two "exclusive" holders)
    parsed = urlparse(timeline_path)
    local = parsed.path if parsed.scheme else timeline_path
    os.makedirs(local, exist_ok=True)
    lock_path = os.path.join(local, LOCK_DIR)
    meta_path = os.path.join(lock_path, "holder.json")
    deadline = time.time() + timeout
    while True:
        try:
            os.mkdir(lock_path)  # atomic claim
            break
        except FileExistsError:
            if _is_stale(meta_path, lock_path, stale_after):
                _break_lock(lock_path, meta_path)
                continue
            if time.time() > deadline:
                raise TimelineLockTimeout(
                    f"could not acquire {lock_path} within {timeout}s"
                ) from None
            time.sleep(poll)
    try:
        with open(meta_path, "w") as f:
            json.dump({"pid": os.getpid(), "acquired_at": time.time()}, f)
        yield
    finally:
        _break_lock(lock_path, meta_path)


@contextmanager
def _hadoop_lock(timeline_path: str, timeout: float, stale_after: float,
                 poll: float):
    """Exclusive-create marker lock through the Hadoop FS API (the
    cross-FS leg of timeline_lock; see module docstring for atomicity
    per store). Needs an active SparkSession for the JVM gateway."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"locking {timeline_path} needs an active SparkSession "
            "(Hadoop FS access)"
        )
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    fs = HPath(timeline_path).getFileSystem(hconf)
    marker = HPath(f"{timeline_path.rstrip('/')}/{LOCK_DIR}")
    deadline = time.time() + timeout
    while True:
        try:
            out = fs.create(marker, False)  # exclusive create
            out.close()
            break
        except Exception as e:
            if "AlreadyExists" not in str(e) and "already exists" not in str(e):
                raise
            # EVERY contention path below re-checks the deadline and
            # sleeps before retrying — a persistent metadata-read failure
            # (throttling storm, expired credentials) must degrade into a
            # bounded TimelineLockTimeout, never an unthrottled busy loop
            if time.time() > deadline:
                raise TimelineLockTimeout(
                    f"could not acquire {marker} within {timeout}s"
                ) from None
            try:
                age = time.time() - fs.getFileStatus(marker).getModificationTime() / 1000.0
            except Exception:
                time.sleep(poll)
                continue  # marker vanished or unreadable — retry the claim
            if age > stale_after:
                fs.delete(marker, False)
                continue
            time.sleep(poll)
    try:
        yield
    finally:
        try:
            fs.delete(marker, False)
        except Exception:
            pass


def _is_stale(meta_path: str, lock_path: str, stale_after: float) -> bool:
    try:
        with open(meta_path) as f:
            acquired = json.load(f).get("acquired_at", 0)
    except (OSError, ValueError):
        # no metadata yet: fall back to the directory mtime
        try:
            acquired = os.stat(lock_path).st_mtime
        except OSError:
            return False  # lock vanished — retry the claim
    return time.time() - acquired > stale_after


def _break_lock(lock_path: str, meta_path: str) -> None:
    try:
        os.remove(meta_path)
    except OSError:
        pass
    try:
        os.rmdir(lock_path)
    except OSError:
        pass
