"""Dump .explain('formatted') for the r10-touched queries to plans/r10/.

Usage: python scripts/dump_r10_plans.py <suffix>   # suffix = before|after
Run at the r9 verdict commit (f9893e7) for 'before' and at r10 HEAD for 'after'.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tracker_trainer_spark.plans import physical_plan  # noqa: E402
from tracker_trainer_spark.queries import QUERIES  # noqa: E402
from tracker_trainer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.environ.get("R09_PLANS_DIR", "/root/repo/plans/r10")

TOUCHED = [
    "doc_unigram_logprob", "corpus_decontamination",
    "supplier_triangle_count", "train_e2e_metrics",
    "kmeans_embedding_clusters", "ann_ivfpq_topk", "ann_pq_topk",
    "stream_windowed_counts", "stream_session_stats",
    "stream_distinct_users", "stream_reward_join",
]


def main() -> None:
    suffix = sys.argv[1]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(master="local[8]", extra_conf={
        "spark.sql.shuffle.partitions": "8", "spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    for name in TOUCHED:
        if name not in QUERIES:
            print(f"SKIP {name}: not in registry")
            continue
        df = QUERIES[name](spark, SF_DIR)
        plan = physical_plan(df)
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan.rstrip() + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
