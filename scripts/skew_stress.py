"""Skew-stress: the places key skew could break the 100 TB story.

1. Hot-key merge — ONE decision_id receiving 10⁶ reward partials (viral
   decision / duplicate-delivery storm) on top of a normal background.
   Without salting the whole hot group lands on one reducer;
   ``merge_rewarded_decisions(salt_buckets=32)`` two-stage-aggregates it
   exactly (the merge is associative). Both variants run; both must
   return identical results; the report shows the salted plan holds.

2. LSH mega-bucket — thousands of near-identical boilerplate docs that
   share EVERY band bucket. Pair generation via bucket-collect streams
   O(bucket) state per row instead of materializing an O(bucket²) join
   side; the run proves the mega-bucket is enumerable without OOM and
   reports pairs/s.

Usage: python scripts/skew_stress.py [hot_partials] [mega_docs]
       (defaults 1_000_000 and 3_000)
Prints one JSON line per scenario.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tracker_trainer_spark import ksuid  # noqa: E402
from tracker_trainer_spark.functions.dedup import near_dup_candidates  # noqa: E402
from tracker_trainer_spark.ingest.merge import merge_rewarded_decisions  # noqa: E402
from tracker_trainer_spark.session import get_spark  # noqa: E402

TS = 1650000000
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def hot_key_merge(spark, hot_partials: int) -> dict:
    hot_id = ksuid.deterministic_ksuid(TS, "hot")
    n_background = 100_000
    distinct_hot_msgs = 10_000  # duplicate deliveries: 100 dupes per msg

    # background: normal decisions, one partial each
    bg = spark.range(n_background).select(
        F.concat(F.lit("bgid"), F.col("id").cast("string")).alias("decision_id"),
        F.to_json(F.struct(F.col("id").alias("x"))).alias("item"),
        F.lit(None).cast("string").alias("context"),
        F.lit(2.0).alias("count"),
        F.lit(None).cast("string").alias("sample"),
        F.lit(None).cast("map<string,double>").alias("rewards"),
    )
    # hot partials: 10⁶ reward rows, all for ONE decision_id
    hot = spark.range(hot_partials).select(
        F.lit(hot_id).alias("decision_id"),
        F.lit(None).cast("string").alias("item"),
        F.lit(None).cast("string").alias("context"),
        F.lit(None).cast("double").alias("count"),
        F.lit(None).cast("string").alias("sample"),
        F.create_map(
            F.concat(F.lit("m"), F.pmod(F.col("id"), F.lit(distinct_hot_msgs)).cast("string")),
            F.lit(1.0),
        ).alias("rewards"),
    )
    df = bg.unionByName(hot).repartition(64).cache()
    df.count()

    out = {}
    for label, salt in (("unsalted", None), ("salted", 32)):
        merged = merge_rewarded_decisions(df, group_cols=("decision_id",),
                                          salt_buckets=salt)
        # timed: ONE full aggregation pass (count); correctness checks
        # re-run the plan afterwards, outside the measurement
        t0 = time.perf_counter()
        rows = merged.count()
        dt = time.perf_counter() - t0
        hot_row = merged.where(F.col("decision_id") == hot_id).select(
            F.size("rewards").alias("n")).first()
        assert rows == n_background + 1, rows
        assert hot_row["n"] == distinct_hot_msgs, hot_row
        out[label] = {"s": round(dt, 2),
                      "rows_per_s": round((n_background + hot_partials) / dt)}
    df.unpersist()
    plan = merge_rewarded_decisions(df, salt_buckets=32)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan and "Expand" not in plan
    return {"scenario": "hot_key_merge", "hot_partials": hot_partials,
            "background_rows": n_background, **out}


def lsh_mega_bucket(spark, mega_docs: int) -> dict:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    n_real = docs.count()
    # IDENTICAL text ⇒ identical minhash signature ⇒ every band puts all
    # mega_docs in one bucket — the worst-case mega-bucket by design
    boiler = spark.range(mega_docs).select(
        (F.lit(10_000_000) + F.col("id")).alias("doc_id"),
        F.lit("standard boilerplate terms and conditions apply to this order "
              "including arbitration notices and liability waivers").alias("text"),
    )
    df = docs.unionByName(boiler).cache()
    df.count()

    cand = near_dup_candidates(df)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

    t0 = time.perf_counter()
    n_pairs = cand.count()
    dt = time.perf_counter() - t0
    # every boilerplate pair shares every band → all C(mega,2) pairs emit
    min_mega_pairs = mega_docs * (mega_docs - 1) // 2
    assert n_pairs >= min_mega_pairs, (n_pairs, min_mega_pairs)
    df.unpersist()
    return {"scenario": "lsh_mega_bucket", "real_docs": n_real,
            "mega_docs": mega_docs, "candidate_pairs": n_pairs,
            "s": round(dt, 2), "pairs_per_s": round(n_pairs / dt)}


def asof_hot_user(spark, hot_events: int) -> dict:
    """Third skew surface: the as-of join's running window partitions by
    user — a celebrity user with 10⁶ events puts one window partition on
    one task. The composition stays LINEAR per partition (sort + one
    running last-non-null pass), so the hot task is slow-but-bounded,
    never quadratic and never OOM (state is one payload struct)."""
    from tracker_trainer_spark.functions.asof import asof_join

    n_background_users = 50_000
    bg = spark.range(n_background_users).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("user_id"),
        (F.col("id") % 86_400).cast("timestamp").alias("ts"),
        F.lit("view").alias("event_type"),
        F.col("id").cast("double").alias("value"),
    )
    hot = spark.range(hot_events).select(
        F.lit("celebrity").alias("user_id"),
        (F.col("id") % 86_400).cast("timestamp").alias("ts"),
        F.when(F.pmod(F.col("id"), F.lit(50)) == 0, F.lit("purchase"))
        .otherwise(F.lit("view")).alias("event_type"),
        F.col("id").cast("double").alias("value"),
    )
    ev = bg.unionByName(hot).repartition(64).cache()
    n = ev.count()

    purchases = ev.where(F.col("event_type") == "purchase")
    prior = ev.where(F.col("event_type") != "purchase").select(
        "user_id", "ts", F.col("value").alias("prior_value"))
    joined = asof_join(purchases, prior, on="ts", by="user_id",
                       right_cols=["prior_value"])
    t0 = time.perf_counter()
    n_out = joined.count()
    dt = time.perf_counter() - t0
    matched = joined.where(F.col("asof_prior_value").isNotNull()).count()
    ev.unpersist()
    assert n_out == hot_events // 50, n_out
    return {"scenario": "asof_hot_user", "events": n,
            "hot_user_events": hot_events, "purchases": n_out,
            "matched": matched, "s": round(dt, 2),
            "events_per_s": round(n / dt)}


def anchored_hot_user(spark, hot_events: int) -> dict:
    """Fourth skew surface (r8): the ANCHORED interval join — the
    kernel multitouch_attribution / events_before_purchase ride.  A
    celebrity user with 10⁶ events against a fixed 1-hour lookback:
    the join key is (user, anchor_bin), so the hot user's timeline
    shards across ~|range|/W bins instead of fusing into one task,
    and the downstream per-purchase aggregate runs IN the join's own
    partitions (no purchase-keyed exchange to re-skew).  The run
    proves the hot user is bin-sharded (matches flow, no OOM, wall
    bounded) and that the exchange-free agg returns exactly one row
    per matching purchase."""
    from tracker_trainer_spark.functions.range_join import anchored_interval_join

    n_background_users = 50_000
    bg = spark.range(n_background_users).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("user_id"),
        (F.col("id") % 86_400).cast("timestamp").alias("ts"),
        F.lit("view").alias("event_type"),
    )
    hot = spark.range(hot_events).select(
        F.lit("celebrity").alias("user_id"),
        (F.col("id") % 86_400).cast("timestamp").alias("ts"),
        F.when(F.pmod(F.col("id"), F.lit(50)) == 0, F.lit("purchase"))
        .otherwise(F.lit("view")).alias("event_type"),
    )
    ev = (bg.unionByName(hot)
          .withColumn("event_id", F.monotonically_increasing_id())
          .repartition(64).cache())
    n = ev.count()

    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("p_ts"))
    intervals = purchases.withColumn(
        "w_start", F.col("p_ts") - F.expr("INTERVAL 1 HOURS"))
    touches = ev.where(F.col("event_type") != "purchase").select(
        "user_id", "ts", "event_id")
    matched = anchored_interval_join(
        touches, intervals, "ts", "w_start", "p_ts", on=["user_id"],
        bin_seconds=3600, num_partitions=64, prefer_shuffle_hash=True)
    agg = matched.groupBy("user_id", "_anchor_bin", "purchase_id").agg(
        F.count(F.lit(1)).alias("n_prior"))
    t0 = time.perf_counter()
    n_purch = agg.count()
    dt = time.perf_counter() - t0
    plan = agg._jdf.queryExecution().executedPlan().toString()
    no_requeue = "hashpartitioning(purchase_id" not in plan
    n_bins = matched.select("_anchor_bin").distinct().count()
    ev.unpersist()
    return {"scenario": "anchored_hot_user", "events": n,
            "hot_user_events": hot_events,
            "purchases_with_priors": n_purch, "anchor_bins": n_bins,
            "agg_in_join_partitions": no_requeue,
            "s": round(dt, 2), "events_per_s": round(n / dt)}


def main():
    hot = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mega = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="skew-stress", master=f"local[{cpus}]",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    from tracker_trainer_spark.session import warm_python_workers

    warm_python_workers(spark)
    print(json.dumps(hot_key_merge(spark, hot)), flush=True)
    print(json.dumps(lsh_mega_bucket(spark, mega)), flush=True)
    print(json.dumps(asof_hot_user(spark, hot)), flush=True)
    print(json.dumps(anchored_hot_user(spark, hot)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
