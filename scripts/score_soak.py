"""Streaming-inference soak: train a quick two-phase model, then drive
a 100k-candidate stream through score_stream and a ranking stream
through start_ranking_stream, reporting records/s for the online path.

The scoring pipeline is one narrow pass (flatten kernel + encode kernel
+ model transform), so streamed throughput should track batch scoring —
this soak proves it and gives the number.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tracker_trainer_spark import ksuid  # noqa: E402
from tracker_trainer_spark.ingest.merge import (  # noqa: E402
    finalize_for_storage,
    merge_rewarded_decisions,
)
from tracker_trainer_spark.ingest.sink import write_timeline  # noqa: E402
from tracker_trainer_spark.session import get_spark, warm_python_workers  # noqa: E402
from tracker_trainer_spark.streaming.score_stream import (  # noqa: E402
    score_stream,
    start_ranking_stream,
)
from tracker_trainer_spark.trainer.train import train_two_phase  # noqa: E402

spark = get_spark(master="local[32]", extra_conf={"spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")
warm_python_workers(spark)

BASE_TS = 1650000000
WORK = "/tmp/score_soak"
shutil.rmtree(WORK, ignore_errors=True)
os.makedirs(WORK)


@F.pandas_udf("string")
def mk_ksuid(ids):
    import pandas as pd
    return pd.Series([
        ksuid.deterministic_ksuid(BASE_TS + int(i) % 86400, int(i)) for i in ids
    ])


# --- train a quick model on an events-derived timeline (sf0.01 keeps the
# fit fast; the soak measures SCORING, not training) -----------------------
ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
dec = ev.where(F.col("event_type") != "purchase").select(
    mk_ksuid(F.col("event_id")).alias("decision_id"),
    F.col("props").alias("item"),
    F.to_json(F.struct(F.col("event_type").alias("et"),
                       (F.col("user_id") % 50).alias("ub"))).alias("context"),
    F.lit(None).cast("string").alias("sample"),
    (F.col("value") % 5 + 2).cast("double").alias("count"),
    F.when(
        F.col("value") > 500,
        F.create_map(mk_ksuid(F.col("event_id") + 10_000_000), F.lit(1.0)),
    ).alias("rewards"),
)
tl = f"{WORK}/tl"
write_timeline(finalize_for_storage(merge_rewarded_decisions(dec)), tl)
_, model = train_two_phase(spark, tl, model_seed=1, max_features=20, explore=False)

# --- candidate stream: 100k candidates, 20k decisions x 5 items -----------
N_DEC, N_ITEMS = 20_000, 5
cand = (
    spark.range(N_DEC * N_ITEMS)
    .select(
        (F.col("id") / N_ITEMS).cast("long").cast("string").alias("decision_id"),
        F.to_json(F.struct((F.col("id") % 97).alias("x"),
                           F.concat(F.lit("v"), (F.col("id") % 13)).alias("s"))).alias("item"),
        F.to_json(F.struct((F.col("id") % 50).alias("ub"))).alias("context"),
    )
)
src = f"{WORK}/cand"
cand.repartition(8).write.parquet(src)
n = N_DEC * N_ITEMS

stream = spark.readStream.schema(cand.schema).parquet(src)
t0 = time.perf_counter()
q = (
    score_stream(model, stream, now_ts=1.0)
    .writeStream.format("parquet")
    .option("path", f"{WORK}/scored")
    .option("checkpointLocation", f"{WORK}/ck1")
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination(600)
dt = time.perf_counter() - t0
n_scored = spark.read.parquet(f"{WORK}/scored").count()
print(json.dumps({"stage": "score_stream", "rows": n_scored,
                  "sec": round(dt, 1), "rec_s": int(n_scored / dt)}))
assert n_scored == n

stream2 = spark.readStream.schema(cand.schema).parquet(src)
t0 = time.perf_counter()
q2 = start_ranking_stream(model, stream2, f"{WORK}/winners", f"{WORK}/ck2",
                          now_ts=1.0)
q2.awaitTermination(600)
dt2 = time.perf_counter() - t0
n_win = spark.read.parquet(f"{WORK}/winners").count()
print(json.dumps({"stage": "ranking_stream", "candidates": n,
                  "winners": n_win, "sec": round(dt2, 1),
                  "cand_s": int(n / dt2)}))
assert n_win == N_DEC

spark.stop()
shutil.rmtree(WORK, ignore_errors=True)
