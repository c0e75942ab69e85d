"""Streaming soak: N gzipped micro-batch files -> AvailableNow stream ->
timeline; per-batch wall time vs the reference's single-digit-seconds
Lambda envelope (10k-row work units)."""
import gzip, json, os, shutil, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tracker_trainer_spark.session import get_spark, warm_python_workers
from tracker_trainer_spark import ksuid
from tracker_trainer_spark.streaming.ingest_stream import start_timeline_stream
from tracker_trainer_spark.ingest.groom import assert_no_duplicate_keys, groom

spark = get_spark(master="local[32]", extra_conf={"spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")
warm_python_workers(spark)

base = "/tmp/stream_soak"
shutil.rmtree(base, ignore_errors=True)
src, tl, ck = f"{base}/in", f"{base}/tl", f"{base}/ck"
os.makedirs(src)
ts0 = int(time.time()) - 30 * 86400
N_FILES, ROWS = 6, 10_000
for f in range(N_FILES):
    with gzip.open(f"{src}/batch{f}.jsonl.gz", "wt") as fh:
        for i in range(ROWS):
            gid = f * ROWS + i
            if i % 5 == 4:  # reward for an earlier decision (possibly prior file)
                target = max(0, gid - ROWS // 2 - 1)  # -1 shifts mod-5 class onto a decision
                rec = {"message_id": ksuid.deterministic_ksuid(ts0 + gid, 10**7 + gid),
                       "model": "m1", "decision_id": ksuid.deterministic_ksuid(ts0 + target, target),
                       "reward": 1.0}
            else:
                rec = {"message_id": ksuid.deterministic_ksuid(ts0 + gid, gid), "model": "m1",
                       "count": 3, "item": {"x": gid % 7}, "context": {"c": gid % 3}}
            fh.write(json.dumps(rec) + "\n")

t0 = time.perf_counter()
q = start_timeline_stream(spark, src, tl, checkpoint_path=ck, available_now=True,
                          max_files_per_trigger=1)
q.awaitTermination()
t = time.perf_counter() - t0
total = N_FILES * ROWS
n = spark.read.parquet(tl).count()
print(f"stream drain: {t:.1f}s for {N_FILES} x {ROWS}-row batches "
      f"= {t/N_FILES:.2f}s/batch ({total/t:.0f} rec/s); timeline rows={n}")
from pyspark.sql import functions as F
dups = spark.read.parquet(tl).groupBy("model", "dt", "decision_id").count().where(F.col("count") > 1).count()
print("duplicate keys pre-groom:", dups)
groomed = groom(spark, tl)
assert_no_duplicate_keys(spark, tl)
print(f"groom repaired {groomed} partitions; invariant holds")
spark.stop()
shutil.rmtree(base, ignore_errors=True)
