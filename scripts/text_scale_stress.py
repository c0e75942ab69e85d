"""Text-pipeline scale-stress: replicate documents K× and measure the
TF-IDF ranking and incremental-dedup paths at each K.

Complements scale_stress.py (merge/encode) and skew_stress.py (hot
keys) with the text operators added in round 2. Replication multiplies
BOTH corpus size and duplicate-family size (every copy shares its
source row's fingerprint), so the incremental-dedup window sees groups
growing linearly with K — the worst honest case for the
lowest-id-per-fingerprint rule.

Usage: python scripts/text_scale_stress.py [K ...]   (default: 1 4 16)
Prints one JSON line per K.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tracker_trainer_spark.session import get_spark, warm_python_workers  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated_docs(spark, k: int):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = spark.range(k).select(F.col("id").alias("copy"))
    n0 = docs.count()
    return (
        docs.crossJoin(copies)
        .withColumn("doc_id", F.col("doc_id") + F.col("copy") * (n0 * 10))
        .drop("copy")
    )


def run(spark, k: int) -> dict:
    from tracker_trainer_spark.functions.sampling import hash_bucket

    docs = replicated_docs(spark, k).cache()
    n = docs.count()
    out = {"k": k, "rows": n}

    # TF-IDF: tokenize → TF (cached) → DF → join → top-3 window
    t0 = time.perf_counter()
    terms = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
    ).where(F.length("term") >= 4)
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).cache()
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql.window import Window
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    n_top = (
        tf.join(df_, "term")
        .withColumn("tfidf", F.col("tf") * F.log(F.lit(float(n)) / F.col("df")))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .count()
    )
    tf.unpersist()
    dt = time.perf_counter() - t0
    out["tfidf_s"] = round(dt, 2)
    out["tfidf_rows_s"] = int(n / dt)
    assert n_top > 0

    # incremental dedup: half the sources are "corpus", half "new"
    t0 = time.perf_counter()
    fp = F.md5(F.concat_ws(" ", F.slice(F.split(F.lower("text"), r"\s+"), 1, 8)))
    is_old = hash_bucket("source", 2) == 0
    old_fps = docs.where(is_old).select(fp.alias("fp")).distinct()
    new_docs = docs.where(~is_old).select("doc_id", fp.alias("fp"))
    from pyspark.sql.window import Window as W2
    surv = (
        new_docs.join(old_fps, "fp", "left_anti")
        .withColumn("rn", F.row_number().over(
            W2.partitionBy("fp").orderBy(F.asc("doc_id"))))
        .where(F.col("rn") == 1)
        .count()
    )
    dt = time.perf_counter() - t0
    out["incdedup_s"] = round(dt, 2)
    out["incdedup_rows_s"] = int(n / dt)
    out["survivors"] = surv
    docs.unpersist()
    return out


def main():
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark(app_name="text-scale-stress",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)
    for k in ks:
        print(json.dumps(run(spark, k)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
