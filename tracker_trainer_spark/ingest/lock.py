"""Advisory timeline lock: serialize groom against ingest appends.

SURVEY §7.4 risk 6: groom rewrites partitions with dynamic partition
overwrite computed from a snapshot — an append that lands between
groom's read and its commit would be replaced away. The reference avoids
this operationally (Step Function serializes groom; ingest appends are
new S3 keys merged later — src/ingest/partition.py:340-354). With plain
Parquet directories we serialize writers explicitly; a transactional
table format (Delta/Iceberg) would subsume this.

Mechanism: atomic ``mkdir`` of ``<timeline>/_lock`` (works on any
Hadoop-compatible FS where directory creation is atomic; for object
stores swap in a conditional-PUT marker). Stale locks older than
``stale_after`` seconds are broken — crashed holders cannot wedge the
pipeline forever.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager

LOCK_DIR = "_lock"


class TimelineLockTimeout(RuntimeError):
    pass


@contextmanager
def timeline_lock(timeline_path: str, timeout: float = 120.0,
                  stale_after: float = 3600.0, poll: float = 0.25):
    """Hold the exclusive writer lock for a timeline directory."""
    os.makedirs(timeline_path, exist_ok=True)
    lock_path = os.path.join(timeline_path, LOCK_DIR)
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
