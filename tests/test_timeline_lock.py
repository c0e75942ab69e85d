"""Timeline writer lock: mutual exclusion, timeout, stale-lock recovery,
and groom-vs-append serialization."""

import json
import os
import threading
import time

import pytest

from tracker_trainer_spark.ingest.lock import (
    LOCK_DIR,
    TimelineLockTimeout,
    timeline_lock,
)


def test_mutual_exclusion(tmp_path):
    path = str(tmp_path / "tl")
    order = []

    def hold(name, hold_s):
        with timeline_lock(path, timeout=30):
            order.append((name, "in"))
            time.sleep(hold_s)
            order.append((name, "out"))

    t1 = threading.Thread(target=hold, args=("a", 0.5))
    t2 = threading.Thread(target=hold, args=("b", 0.1))
    t1.start(); time.sleep(0.1); t2.start()
    t1.join(); t2.join()
    assert order == [("a", "in"), ("a", "out"), ("b", "in"), ("b", "out")]


def test_timeout(tmp_path):
    path = str(tmp_path / "tl")
    os.makedirs(os.path.join(path, LOCK_DIR))
    json.dump({"pid": 0, "acquired_at": time.time()},
              open(os.path.join(path, LOCK_DIR, "holder.json"), "w"))
    with pytest.raises(TimelineLockTimeout):
        with timeline_lock(path, timeout=0.5):
            pass


def test_stale_lock_broken(tmp_path):
    path = str(tmp_path / "tl")
    os.makedirs(os.path.join(path, LOCK_DIR))
    json.dump({"pid": 0, "acquired_at": time.time() - 7200},
              open(os.path.join(path, LOCK_DIR, "holder.json"), "w"))
    with timeline_lock(path, timeout=5, stale_after=3600):
        pass  # acquired by breaking the stale lock
    assert not os.path.exists(os.path.join(path, LOCK_DIR))


def test_lock_released_on_error(tmp_path):
    path = str(tmp_path / "tl")
    with pytest.raises(ValueError):
        with timeline_lock(path):
            raise ValueError("boom")
    with timeline_lock(path, timeout=1):
        pass  # immediately re-acquirable


def test_append_waits_for_groom(spark, timeline):
    """A concurrent append blocks until groom releases the lock."""
    from tracker_trainer_spark.ingest.groom import groom

    events = []

    def do_groom():
        with timeline_lock(timeline, timeout=30):
            events.append("groom-start")
            time.sleep(1.0)
            events.append("groom-end")

    def do_append():
        time.sleep(0.2)
        df = spark.read.parquet(timeline).limit(1)
        from tracker_trainer_spark.ingest.sink import write_timeline
        write_timeline(df, timeline)
        events.append("append-done")

    t1 = threading.Thread(target=do_groom)
    t2 = threading.Thread(target=do_append)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert events.index("groom-end") < events.index("append-done")
    # repair the duplicate row we just appended; fixpoint still reachable
    groom(spark, timeline)
    assert groom(spark, timeline) == 0


def test_hadoop_lock_leg(spark, tmp_path):
    """The cross-FS marker lock (schemed paths route here): exclusive
    create claims, contention times out, stale markers break, release
    deletes the marker. Driven through the real Hadoop FS on file://."""
    import os

    import pytest as _pytest

    from tracker_trainer_spark.ingest.lock import (
        TimelineLockTimeout,
        _hadoop_lock,
        is_local_path,
    )

    uri = f"file://{tmp_path}/tl"
    os.makedirs(f"{tmp_path}/tl")
    assert is_local_path(uri) and not is_local_path("s3a://b/tl")

    with _hadoop_lock(uri, timeout=5, stale_after=3600, poll=0.05):
        assert os.path.exists(f"{tmp_path}/tl/_lock")
        # second claimant cannot acquire while held
        with _pytest.raises(TimelineLockTimeout):
            with _hadoop_lock(uri, timeout=0.5, stale_after=3600, poll=0.05):
                pass
    assert not os.path.exists(f"{tmp_path}/tl/_lock")  # released

    # stale marker (old mtime) is broken and the claim succeeds
    open(f"{tmp_path}/tl/_lock", "w").close()
    os.utime(f"{tmp_path}/tl/_lock", (1, 1))
    with _hadoop_lock(uri, timeout=5, stale_after=10, poll=0.05):
        pass
    assert not os.path.exists(f"{tmp_path}/tl/_lock")


def test_lock_normalizes_hadoop_single_slash_file_uri(tmp_path):
    """file:/path (Hadoop's normalized form) and the plain path must
    contend for the SAME lock — the scheme-stripping bug let both
    'exclusive' holders in simultaneously."""
    import pytest

    from tracker_trainer_spark.ingest.lock import (
        TimelineLockTimeout,
        timeline_lock,
    )

    tl = str(tmp_path / "tl")
    with timeline_lock(f"file:{tl}"):
        with pytest.raises(TimelineLockTimeout):
            with timeline_lock(tl, timeout=0.5):
                pass
    # released: the plain path can acquire now
    with timeline_lock(tl, timeout=0.5):
        pass
