"""Z-order clustering: multi-dimensional row-group pruning + fidelity."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tracker_trainer_spark.ingest.layout import zorder_frame, zorder_key


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "value")
        .where(F.col("value").isNotNull())
    )


def _write(df, path):
    df.write.mode("overwrite").parquet(path)
    return path


def _overlapping_groups(path, col, lo, hi):
    """(#row groups whose [min,max] for col intersects [lo,hi], total)."""
    hit = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col:
                    total += 1
                    st = c.statistics
                    if st is None or st.min is None:
                        hit += 1
                    elif not (st.max < lo or st.min > hi):
                        hit += 1
    return hit, total


def test_zorder_prunes_on_both_dimensions(spark, events, tmp_path):
    """Linear layout prunes only its sort column; the Morton layout must
    prune on BOTH clustered columns for narrow slices."""
    hi_u = events.approxQuantile("user_id", [0.9], 0.001)[0]
    hi_v = events.approxQuantile("value", [0.9], 0.001)[0]
    max_u = events.agg(F.max("user_id")).collect()[0][0]
    max_v = events.agg(F.max("value")).collect()[0][0]

    z = _write(zorder_frame(events, ["user_id", "value"], n_files=8),
               str(tmp_path / "z"))
    lin = _write(
        events.repartitionByRange(8, "user_id").sortWithinPartitions("user_id"),
        str(tmp_path / "lin"),
    )

    # slice on the NON-sort dimension: linear reads everything
    z_v, z_tot = _overlapping_groups(z, "value", hi_v, max_v)
    l_v, l_tot = _overlapping_groups(lin, "value", hi_v, max_v)
    assert l_v == l_tot  # linear layout: value stats are useless
    assert z_v <= z_tot // 2, (z_v, z_tot)  # curve localizes value

    # slice on the first dimension: z still prunes, but COARSER than a
    # layout sorted on that dimension (Morton interleaving scatters a
    # one-dim slice over more of the curve).  The bound is 3/4, not
    # 1/2: the range partitioner's boundary sampling shifts row-group
    # edges run to run, and a 10% slice landing on 5-of-8 groups is
    # within the curve's expected behavior — the property under test is
    # that SOME groups prune (a linear-on-user layout reads ≤ half; z
    # trades that for pruning on BOTH dimensions, asserted above).
    z_u, _ = _overlapping_groups(z, "user_id", hi_u, max_u)
    l_u, _ = _overlapping_groups(lin, "user_id", hi_u, max_u)
    assert l_u <= l_tot // 2
    assert z_u <= (3 * z_tot) // 4, (z_u, z_tot)


def test_zorder_roundtrip_preserves_rows(spark, events, tmp_path):
    path = _write(zorder_frame(events, ["user_id", "value"], n_files=4),
                  str(tmp_path / "rt"))
    got = spark.read.parquet(path)
    assert got.count() == events.count()
    assert (
        got.select(F.sum(F.hash("event_id")).alias("h")).collect()[0]["h"]
        == events.select(F.sum(F.hash("event_id")).alias("h")).collect()[0]["h"]
    )
    assert set(got.columns) == set(events.columns)  # helper key dropped


def test_zorder_key_is_codegen_expression(spark, events):
    """The Morton key must stay a pure JVM expression: no UDF, no extra
    shuffle beyond the single range partitioning."""
    from tracker_trainer_spark.plans import count_shuffles, physical_plan

    clustered = zorder_frame(events, ["user_id", "value"], n_files=4)
    plan = physical_plan(clustered)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert count_shuffles(clustered) == 1


def test_zorder_key_skew_immune(spark):
    """A hot value must spread across buckets via rank boundaries, not
    collapse the curve: keys on a 90%-constant column still take >1
    distinct z-value from the OTHER column's bits."""
    df = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7.0)).otherwise(F.col("id").cast("double")).alias("hot"),
        (F.col("id") % 97).cast("double").alias("uniform"),
    )
    key = zorder_key(df, ["hot", "uniform"])
    n = df.select(key.alias("z")).distinct().count()
    assert n > 50, n


def test_zorder_four_columns_no_sign_overflow(spark):
    """4 columns x 8 bits reaches bit 31: the key must be a LONG with
    the all-max row at 2^32-1, not wrapped into the int sign bit."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 7).cast("double").alias("a"),
        (F.col("id") % 11).cast("double").alias("b"),
        (F.col("id") % 13).cast("double").alias("c"),
        F.col("id").cast("double").alias("d"),
    )
    key = zorder_key(df, ["a", "b", "c", "d"])
    mn, mx = df.select(F.min(key), F.max(key)).first()
    assert mn >= 0, mn  # no negative keys anywhere
    assert mx > (1 << 30), mx  # high bits genuinely used


def test_zorder_rejects_over_wide_keys(spark):
    df = spark.range(10).select(
        *[(F.col("id") % (i + 2)).cast("double").alias(f"c{i}") for i in range(8)]
    )
    with pytest.raises(ValueError, match="max 62"):
        zorder_key(df, [f"c{i}" for i in range(8)])


def test_zorder_preserves_user_zkey_column(spark):
    df = spark.range(100).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2).alias("_zkey"),  # user column with the temp name
    )
    out = zorder_frame(df, ["x"], n_files=2)
    assert "_zkey" in out.columns
    assert out.agg(F.sum("_zkey")).first()[0] == sum(i * 2 for i in range(100))
