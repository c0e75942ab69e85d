"""r9: maintain_timeline's fused stats+quarantine scan — the single
pass must surface the same per-partition groom stats as plan_groom AND
the same invalid-file set as find_invalid_files (guide §1.2: one scan
for two same-keyed consumers)."""

from pyspark.sql import functions as F

from tracker_trainer_spark import ksuid
from tracker_trainer_spark.ingest.groom import (
    _plan_from_stats,
    _present_part_cols,
    _stats_df,
    plan_groom,
)
from tracker_trainer_spark.ingest.quarantine import find_invalid_files

TS = 1650000000


def _timeline(spark, tmp_path):
    path = str(tmp_path / "tl")
    good = [(ksuid.deterministic_ksuid(TS + i, i), float(i)) for i in range(20)]
    spark.createDataFrame(good, "decision_id string, reward double").coalesce(
        1
    ).write.parquet(path)
    bad = [(ksuid.deterministic_ksuid(TS + 100 + i, i), float(i)) for i in range(5)]
    bad.append(("not-a-ksuid!", 1.0))
    spark.createDataFrame(bad, "decision_id string, reward double").coalesce(
        1
    ).write.mode("append").parquet(path)
    return path


def test_fused_scan_matches_split_scans(spark, tmp_path):
    path = _timeline(spark, tmp_path)
    df = spark.read.parquet(path)
    part_cols = _present_part_cols(df)

    rows = _stats_df(df, part_cols, with_invalid_files=True).collect()

    # invalid-file set identical to the dedicated quarantine scan
    fused_bad = sorted({f for r in rows for f in r["bad_files"]})
    assert fused_bad == find_invalid_files(spark, path)
    assert len(fused_bad) == 1

    # groom plan identical to the dedicated planner scan
    fused_plan = _plan_from_stats(rows, part_cols, 10_000, 4)
    split_plan = plan_groom(spark, path)
    assert fused_plan.part_cols == split_plan.part_cols
    assert fused_plan.total_partitions == split_plan.total_partitions

    def _key(r):
        return tuple(r[c] for c in ("n_files", "n_rows", "n_ids"))

    assert sorted(map(_key, fused_plan.dirty)) == sorted(
        map(_key, split_plan.dirty))


def test_fused_scan_clean_timeline_has_empty_bad_sets(spark, tmp_path):
    path = str(tmp_path / "clean")
    good = [(ksuid.deterministic_ksuid(TS + i, i), float(i)) for i in range(8)]
    spark.createDataFrame(good, "decision_id string, reward double").coalesce(
        1
    ).write.parquet(path)
    df = spark.read.parquet(path)
    rows = _stats_df(df, _present_part_cols(df),
                     with_invalid_files=True).collect()
    assert all(r["bad_files"] == [] for r in rows)
    # future-KSUID guard threads through the fused scan exactly like
    # find_invalid_files(now_ts=...)
    rows_guarded = _stats_df(df, _present_part_cols(df),
                             with_invalid_files=True, now_ts=TS - 10**6
                             ).collect()
    assert sorted({f for r in rows_guarded for f in r["bad_files"]}) == \
        find_invalid_files(spark, path, now_ts=TS - 10**6)
    assert len({f for r in rows_guarded for f in r["bad_files"]}) == 1
