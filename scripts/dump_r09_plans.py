"""Dump .explain('formatted') for the r9-touched queries to plans/r09/.

Usage: python scripts/dump_r09_plans.py <suffix>   # suffix = before|after
Run at the r8 verdict commit for 'before' and at r9 HEAD for 'after'.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tracker_trainer_spark.plans import physical_plan  # noqa: E402
from tracker_trainer_spark.queries import QUERIES  # noqa: E402
from tracker_trainer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.environ.get("R09_PLANS_DIR", "/root/repo/plans/r09")

TOUCHED = [
    "propensity_explode_events", "ann_cosine_topk", "q7_volume_shipping",
    "train_encode_events", "doc_tfidf_top_terms", "doc_bigram_pmi",
    "doc_pii_scan", "mann_whitney_u", "embedding_top_pc",
    "basket_pair_lift", "weighted_median_price", "customer_rfm_segments",
    "propensity_training_weights", "decision_training_rows",
    "part_affinity_recs", "q9_product_profit", "supplier_cheapest_paths",
    "supplier_shared_parts", "bootstrap_mean_ci", "isotonic_calibration",
    "supplier_cosupply_bfs", "spearman_price_corr",
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
