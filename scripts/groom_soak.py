"""Groom soak: 2M-row timeline across ~100 (model, dt) partitions, a
third dirtied with duplicate-key partial rewards; reports plan + repair
wall time against the reference's <=30 x ~60 s Step-Function envelope."""
import os, shutil, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from tracker_trainer_spark.session import get_spark, warm_python_workers
from tracker_trainer_spark import ksuid as K
from tracker_trainer_spark.ingest.sink import write_timeline
from tracker_trainer_spark.ingest.groom import groom, plan_groom, assert_no_duplicate_keys

spark = get_spark(master="local[32]", extra_conf={"spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")
warm_python_workers(spark)
tl = "/tmp/groom_soak_tl"; shutil.rmtree(tl, ignore_errors=True)

ts0 = 1600000000
# 2M decision rows across 4 models x 30 days = 120 partitions
@F.pandas_udf("string")
def mk(ids):
    import pandas as pd
    return pd.Series([K.deterministic_ksuid(ts0 + int(i) % (30*86400), int(i)) for i in ids])

n = 2_000_000
base = spark.range(n).select(
    (F.col("id") % 4).cast("string").alias("model_n"),
    mk(F.col("id")).alias("decision_id"),
    F.lit('{"a":1}').alias("item"), F.lit("{}").alias("context"),
    F.lit(2.0).alias("count"), F.lit(None).cast("string").alias("sample"),
    F.lit("{}").alias("rewards"), F.lit(0.0).alias("reward"),
).withColumn("model", F.concat(F.lit("m"), F.col("model_n"))).drop("model_n")
t0 = time.perf_counter()
write_timeline(base, tl)
print(f"write {n} rows across 120 partitions: {time.perf_counter()-t0:.1f}s")

# dirty ~40 partitions with 200k duplicate-key partial rewards
dirt = spark.range(0, 400_000, 1).select(
    (F.col("id") % 2).cast("string").alias("model_n"),
    mk((F.col("id") * 3) % n).alias("decision_id"),
    F.lit(None).cast("string").alias("item"), F.lit(None).cast("string").alias("context"),
    F.lit(None).cast("double").alias("count"), F.lit(None).cast("string").alias("sample"),
    F.lit('{"x":1}').alias("rewards"), F.lit(1.0).alias("reward"),
).withColumn("model", F.concat(F.lit("m"), F.col("model_n"))).drop("model_n")
write_timeline(dirt, tl)

t0 = time.perf_counter()
plan = plan_groom(spark, tl)
t_plan = time.perf_counter() - t0
print(f"plan: {t_plan:.1f}s -> {len(plan.dirty)} dirty of {plan.total_partitions}")
t0 = time.perf_counter()
rewritten = groom(spark, tl)
t_groom = time.perf_counter() - t0
assert_no_duplicate_keys(spark, tl)
print(f"groom: {t_groom:.1f}s rewrote {rewritten} partitions; invariant holds "
      f"(reference envelope: <=30 x ~60s iterations)")
spark.stop(); shutil.rmtree(tl, ignore_errors=True)
