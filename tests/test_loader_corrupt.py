"""S8: corrupt files in the timeline are skipped, not fatal."""

import pyspark.sql.functions as F
import pytest

from tracker_trainer_spark.trainer.loader import load_training_frame


@pytest.fixture()
def timeline_with_corrupt_file(spark, tmp_path):
    path = str(tmp_path / "tl")
    spark.range(10).select(
        F.concat(F.lit("id"), F.col("id")).alias("decision_id"),
        F.lit('{"a":1}').alias("item"),
        F.lit("{}").alias("context"),
        F.lit(1.0).alias("count"),
        F.lit(None).cast("string").alias("sample"),
        F.lit("{}").alias("rewards"),
        F.lit(0.0).alias("reward"),
        F.lit("2024-01-01").alias("dt"),
    ).coalesce(1).write.partitionBy("dt").parquet(path)
    with open(f"{path}/dt=2024-01-01/zz-corrupt.parquet", "wb") as f:
        f.write(b"PAR1 this is not a parquet file")
    return path


def test_corrupt_file_skipped(spark, timeline_with_corrupt_file):
    df = load_training_frame(spark, timeline_with_corrupt_file)
    assert df.count() == 10


def test_corrupt_file_fatal_when_disabled(spark, timeline_with_corrupt_file):
    df = load_training_frame(spark, timeline_with_corrupt_file, ignore_corrupt=False)
    with pytest.raises(Exception):
        df.count()


def test_loader_empty_timeline(spark, tmp_path):
    """Fresh deployment: the trainer load path returns an empty typed
    frame instead of failing schema inference."""
    df = load_training_frame(spark, str(tmp_path / "never_written"),
                             max_rows=1000, sample=0.5)
    assert df.count() == 0
    assert "decision_id" in df.columns and "reward" in df.columns
