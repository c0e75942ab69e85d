"""functions/ranking.py: distributed rank/ntile/cumsum/prefix-max must
be BIT-IDENTICAL to the single-task builtin windows they replace, and
deterministic across repeated executions.

The determinism test is a regression guard for the design's one sharp
edge: the obvious spelling (``repartitionByRange`` +
``spark_partition_id()``) re-samples range boundaries per execution
(RangePartitioner seeds by RDD id), so the window branch and the
offset branch of the same plan can land DIFFERENT partition ids and
silently corrupt ranks — caught at sf0.01 by the oracle gate during
the r6 rewrite.  The literal-boundary bucket column makes both
branches share frozen split points, so results cannot depend on
execution count or sampling."""

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tracker_trainer_spark.functions.ranking import (
    range_boundaries,
    with_cumsum,
    with_global_rank,
    with_ntile,
    with_prefix_max,
)


@pytest.fixture(scope="module")
def df(spark):
    rng = random.Random(11)
    rows = [(i, rng.choice("abc"), rng.randint(0, 40), rng.randint(1, 9))
            for i in range(1013)]
    return spark.createDataFrame(rows, "id int, g string, v int, w int")


def _pairs(rows, a, b):
    return sorted((r[a], r[b]) for r in rows)


@pytest.mark.parametrize("buckets", [4, 10, 2000])
def test_ntile_global_matches_builtin(df, buckets):
    exp = df.withColumn("bin", F.ntile(buckets).over(
        Window.orderBy("v", "id"))).select("id", "bin").collect()
    got = with_ntile(df, buckets, [F.asc("v"), F.asc("id")],
                     bucket_key=F.col("v")).select("id", "bin").collect()
    assert _pairs(exp, "id", "bin") == _pairs(got, "id", "bin")


def test_ntile_partitioned_matches_builtin(df):
    exp = df.withColumn("bin", F.ntile(4).over(
        Window.partitionBy("g").orderBy("v", "id"))).select("id", "bin").collect()
    got = with_ntile(df, 4, [F.asc("v"), F.asc("id")], ["g"],
                     bucket_key=F.col("v")).select("id", "bin").collect()
    assert _pairs(exp, "id", "bin") == _pairs(got, "id", "bin")


def test_rank_desc_with_negated_bucket_key(df):
    exp = df.withColumn("r", F.row_number().over(
        Window.orderBy(F.desc("v"), F.asc("id")))).select("id", "r").collect()
    got = with_global_rank(df, [F.desc("v"), F.asc("id")],
                           bucket_key=-F.col("v"), rank_col="r") \
        .select("id", "r").collect()
    assert _pairs(exp, "id", "r") == _pairs(got, "id", "r")


def test_cumsum_partitioned_matches_builtin(df):
    exp = df.withColumn("cum", F.sum("w").over(
        Window.partitionBy("g").orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, 0))).select("id", "cum").collect()
    got = with_cumsum(df, F.col("w"), [F.asc("v"), F.asc("id")], ["g"],
                      bucket_key=F.col("v")).select("id", "cum").collect()
    assert _pairs(exp, "id", "cum") == _pairs(got, "id", "cum")


def test_prefix_max_on_histogram_matches_builtin(df):
    hist = df.groupBy("v").agg(F.max("w").alias("mx"))
    exp = hist.withColumn("pm", F.max("mx").over(
        Window.orderBy(F.desc("v"))
        .rowsBetween(Window.unboundedPreceding, -1))).select("v", "pm").collect()
    got = with_prefix_max(hist, F.col("mx"), [F.desc("v")],
                          bucket_key=-F.col("v"), out_col="pm") \
        .select("v", "pm").collect()
    assert _pairs(exp, "v", "pm") == _pairs(got, "v", "pm")


def test_deterministic_across_executions(df):
    """Two collects of the SAME plan must agree rank-for-rank — the
    repartitionByRange/spark_partition_id spelling fails this
    intermittently (per-execution boundary resampling desyncs the
    offset join)."""
    ranked = with_global_rank(df, [F.asc("v"), F.asc("id")],
                              bucket_key=F.col("v"), rank_col="r")
    a = _pairs(ranked.collect(), "id", "r")
    for _ in range(3):
        assert _pairs(ranked.collect(), "id", "r") == a
    # and ranks form the exact permutation 1..n
    assert sorted(r for _, r in a) == list(range(1, len(a) + 1))


def test_boundary_values_never_affect_results(df):
    """Any boundary set — skewed, duplicated, empty, absurd — yields
    identical ranks: split points decide balance only."""
    exp = _pairs(with_global_rank(df, [F.asc("v"), F.asc("id")],
                                  bucket_key=F.col("v"), rank_col="r")
                 .collect(), "id", "r")
    for bounds in ([], [20.0], [-5.0, 0.5, 0.5, 99.0], [1e18]):
        got = _pairs(with_global_rank(df, [F.asc("v"), F.asc("id")],
                                      bucket_key=F.col("v"), rank_col="r",
                                      boundaries=bounds).collect(), "id", "r")
        assert got == exp, bounds


def test_empty_input(df):
    empty = df.where(F.lit(False))
    assert with_ntile(empty, 4, [F.asc("v"), F.asc("id")],
                      bucket_key=F.col("v")).count() == 0


def test_range_boundaries_shape(df):
    b = range_boundaries(df, F.col("v"), 8)
    assert b == sorted(b)
    assert len(b) <= 7
    assert range_boundaries(df, F.col("v"), 1) == []


def test_no_single_task_window_in_plan(df):
    from tracker_trainer_spark.plans import single_task_windows, physical_plan
    out = with_ntile(df, 4, [F.asc("v"), F.asc("id")], bucket_key=F.col("v"))
    assert single_task_windows(out) == []
    # the only SinglePartition exchange feeds the TINY offset window
    # (below an aggregate), never the data window
    plan = physical_plan(out, "simple")
    assert plan.count("Exchange SinglePartition") <= 1
