"""Unit semantics of the as-of join (functions/asof.py): inclusive
backward match, NULL when nothing precedes, per-key isolation — checked
against pandas merge_asof on random data as a differential oracle."""

import numpy as np
import pandas as pd
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
