"""E2E two-phase train soak at sf0.1: build a timeline from events,
run ingest + both training phases, report records/s against the
reference envelope (>=1,100 rec/s end-to-end)."""
import os, sys, time, shutil
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from tracker_trainer_spark.session import get_spark, warm_python_workers
from tracker_trainer_spark import ksuid
from tracker_trainer_spark.ingest.merge import finalize_for_storage, merge_rewarded_decisions
from tracker_trainer_spark.ingest.sink import write_timeline
from tracker_trainer_spark.trainer.train import train_propensity_model, train_decision_model

spark = get_spark(master="local[32]", extra_conf={"spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")
warm_python_workers(spark)

ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
# synthesize rewarded-decision rows: one decision per non-purchase event,
# KSUID keyed by event time so dt partitioning engages
base_ts = 1650000000

@F.pandas_udf("string")
def mk_ksuid(ids):
    import pandas as pd
    return pd.Series([ksuid.deterministic_ksuid(base_ts + int(i) % 86400, int(i)) for i in ids])

dec = (
    ev.where(F.col("event_type") != "purchase")
    .select(
        mk_ksuid(F.col("event_id")).alias("decision_id"),
        F.col("props").alias("item"),
        F.to_json(F.struct(F.col("event_type").alias("et"), (F.col("user_id") % 50).alias("ub"))).alias("context"),
        F.lit(None).cast("string").alias("sample"),
        (F.col("value") % 5 + 2).cast("double").alias("count"),
        F.when(F.col("value") > 500, F.create_map(mk_ksuid(F.col("event_id") + 10_000_000), F.lit(1.0))).alias("rewards"),
    )
)
t0 = time.perf_counter()
merged = finalize_for_storage(merge_rewarded_decisions(dec))
tl = "/tmp/train_soak_tl"
shutil.rmtree(tl, ignore_errors=True)
write_timeline(merged, tl)
t_ingest = time.perf_counter() - t0
n = spark.read.parquet(tl).count()
print(f"ingest+write: {t_ingest:.1f}s rows={n} ({n/t_ingest:.0f} rows/s)")

t0 = time.perf_counter()
prop = train_propensity_model(spark, tl, model_seed=1, max_features=30)
t1 = time.perf_counter()
dec_model = train_decision_model(spark, tl, prop, model_seed=1, max_features=30)
t2 = time.perf_counter()
total = t2 - t0 + t_ingest
print(f"phase1: {t1-t0:.1f}s  phase2: {t2-t1:.1f}s")
print(f"E2E: {total:.1f}s for {n} records = {n/total:.0f} rec/s (reference envelope >=1100)")
spark.stop()
shutil.rmtree(tl, ignore_errors=True)
