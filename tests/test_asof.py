"""Unit semantics of the as-of join (functions/asof.py): inclusive
backward match, NULL when nothing precedes, per-key isolation — checked
against pandas merge_asof on random data as a differential oracle."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tracker_trainer_spark.functions.asof import asof_join
from tracker_trainer_spark.plans import count_shuffles


def _mk(spark, rows, cols):
    return spark.createDataFrame(pd.DataFrame(rows, columns=cols))


def test_basic_backward_inclusive(spark):
    left = _mk(spark, [(1, 10, "p1"), (1, 4, "p0"), (2, 7, "p2")],
               ["user_id", "ts", "pid"])
    right = _mk(spark, [(1, 9, "a"), (1, 10, "b"), (1, 2, "z"), (2, 8, "c")],
                ["user_id", "ts", "tag"])
    out = {r["pid"]: r["asof_tag"]
           for r in asof_join(left, right, on="ts", by="user_id").collect()}
    # ts=10 matches the equal-timestamp right row (inclusive), not ts=9
    assert out == {"p1": "b", "p0": "z", "p2": None}


def test_no_cross_key_leakage(spark):
    left = _mk(spark, [(1, 10, "p")], ["user_id", "ts", "pid"])
    right = _mk(spark, [(2, 5, "other")], ["user_id", "ts", "tag"])
    (row,) = asof_join(left, right, on="ts", by="user_id").collect()
    assert row["asof_tag"] is None


def test_single_shuffle_plan(spark):
    left = _mk(spark, [(1, 1, "p")], ["user_id", "ts", "pid"])
    right = _mk(spark, [(1, 1, "t")], ["user_id", "ts", "tag"])
    df = asof_join(left, right, on="ts", by="user_id")
    assert count_shuffles(df) <= 1


def test_differential_vs_pandas_merge_asof(spark):
    rng = np.random.default_rng(5)
    n_l, n_r = 300, 500
    lp = pd.DataFrame({
        "user_id": rng.integers(0, 20, n_l),
        "ts": rng.choice(np.arange(10_000), n_l, replace=False).astype("int64"),
        "pid": np.arange(n_l),
    })
    rp = pd.DataFrame({
        "user_id": rng.integers(0, 20, n_r),
        "ts": rng.choice(np.arange(10_000), n_r, replace=False).astype("int64"),
        "rid": np.arange(n_r),
    })
    got = (
        asof_join(spark.createDataFrame(lp), spark.createDataFrame(rp),
                  on="ts", by="user_id", right_cols=["rid"])
        .toPandas().sort_values("pid").reset_index(drop=True)
    )
    want = pd.merge_asof(
        lp.sort_values("ts"), rp.sort_values("ts"),
        on="ts", by="user_id", direction="backward",
    ).sort_values("pid").reset_index(drop=True)
    assert got["asof_rid"].fillna(-1).astype("int64").tolist() == \
        want["rid"].fillna(-1).astype("int64").tolist()


# ---------------------------------------------------------------------------
# direction / tolerance variants — differential vs pandas merge_asof
# ---------------------------------------------------------------------------

def _random_frames(seed):
    import numpy as np
    rng = np.random.default_rng(seed)
    import pandas as pd
    n_l, n_r = 60, 40
    left = pd.DataFrame({
        "user_id": rng.integers(0, 5, n_l),
        "ts": rng.integers(0, 1000, n_l).astype("int64"),
        "lval": rng.normal(size=n_l).round(3),
    })
    right = pd.DataFrame({
        "user_id": rng.integers(0, 5, n_r),
        "ts": rng.integers(0, 1000, n_r).astype("int64"),
        "rval": rng.normal(size=n_r).round(3),
    })
    # merge_asof forbids duplicate on-values ambiguity only for exact
    # reproducibility: dedupe (user_id, ts) on the right so "the" match
    # is well-defined in both implementations
    right = right.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)
    left = left.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 50.0])
def test_asof_directions_match_pandas(spark, direction, tolerance):
    import pandas as pd
    # fixed per-direction seeds: hash() is randomized per process, which
    # would make a failing draw irreproducible
    left, right = _random_frames(
        seed={"backward": 101, "forward": 202, "nearest": 303}[direction]
    )
    want = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable"),
        on="ts", by="user_id", direction=direction,
        tolerance=None if tolerance is None else int(tolerance),
    ).rename(columns={"rval": "asof_rval"})

    got = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="ts", by="user_id", right_cols=["rval"],
        direction=direction, tolerance=tolerance,
    ).toPandas()

    key = ["user_id", "ts", "lval"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want[key + ["asof_rval"]].sort_values(key).reset_index(drop=True)
    assert len(got) == len(want)
    g = got["asof_rval"].fillna(-9e9).to_numpy()
    w = want["asof_rval"].fillna(-9e9).to_numpy()
    assert (g == w).all(), (direction, tolerance,
                            got[g != w].head(), want[g != w].head())


def test_asof_nearest_single_shuffle(spark):
    """nearest must reuse the ONE key exchange for both direction
    windows — an extra sort is fine, a second shuffle is not."""
    from tracker_trainer_spark.plans import count_shuffles
    left, right = _random_frames(seed=7)
    df = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="ts", by="user_id", right_cols=["rval"], direction="nearest",
    )
    assert count_shuffles(df) == 1


def test_asof_timestamp_tolerance_in_seconds(spark):
    """tolerance is SECONDS for timestamp `on` columns (micros
    internally): a 3600s bound keeps the 30-min-old match and nulls
    the 2-hour-old one."""
    from datetime import datetime, timedelta
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, t0), (2, t0 + timedelta(hours=3))],
        "user_id int, ts timestamp",
    ).withColumn("user_id", F.lit(1))
    right = spark.createDataFrame(
        [(1, t0 - timedelta(minutes=30), "recent"),
         (1, t0 + timedelta(hours=1), "stale_for_second")],
        "user_id int, ts timestamp, tag string",
    )
    got = {
        r.ts: r.asof_tag
        for r in asof_join(left, right, on="ts", by="user_id",
                           right_cols=["tag"], tolerance=3600.0).collect()
    }
    assert got[t0] == "recent"              # 30 min old: within bound
    assert got[t0 + timedelta(hours=3)] is None  # best match 2h old: nulled
