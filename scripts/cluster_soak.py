"""Scale-soak for the clustering / similarity-join family: run
deterministic Lloyd's KMeans over a synthetically grown embedding
corpus (N up to 500k × dim 64) and the prefix-filtered Jaccard join
over a K×-replicated document corpus, measuring rows/s per round.

The 100 TB question each answers:
- KMeans: per-round cost must stay scan + ONE hash agg (centroid
  update), with the k×dim driver collect constant-size as N grows —
  no per-point shuffle, no growing driver state.
- prefix Jaccard join: candidate pairs must grow with true-duplicate
  density, not quadratically with corpus size (prefix filtering keeps
  hot tokens out of the pair generator).

Usage: python scripts/cluster_soak.py [N_vectors] [K_docs]
Defaults: 200000 vectors, 4x documents. Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tracker_trainer_spark.queries import _t  # noqa: E402
from tracker_trainer_spark.queries_ml_ext import (  # noqa: E402
    _assign_expr,
    _mean_centroids,
)
from tracker_trainer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIM = 64
KMEANS_K = 8


def synthetic_embeddings(spark, n: int):
    """n deterministic 64-dim vectors with 8 planted centers: center =
    id%8, coordinates = center one-hot ± a hash-derived jitter. No RNG —
    reruns are identical."""
    base = spark.range(n).select(F.col("id").alias("vec_id"))
    jitter = [
        (
            (F.hash(F.col("vec_id") * DIM + d) % 1000) / 5000.0
            + F.when((F.col("vec_id") % KMEANS_K) == (d % KMEANS_K), 1.0)
            .otherwise(0.0)
        ).cast("double")
        for d in range(DIM)
    ]
    return base.select("vec_id", F.array(*jitter).alias("emb"))


def kmeans_soak(spark, n: int) -> dict:
    emb = synthetic_embeddings(spark, n).cache()
    emb.count()  # materialize outside the timed region
    init = emb.withColumn("cid", (F.col("vec_id") % KMEANS_K).cast("int"))
    t0 = time.perf_counter()
    centroids = _mean_centroids(init)
    rounds = []
    for _ in range(3):
        r0 = time.perf_counter()
        assigned = emb.withColumn("cid", _assign_expr(centroids)["cid"])
        centroids = _mean_centroids(assigned, prev=centroids)
        rounds.append(round(time.perf_counter() - r0, 2))
    total = time.perf_counter() - t0
    # planted-center sanity: every final centroid's dominant coordinate
    # group must match its cluster (assignment recovered the structure)
    sizes = (
        emb.withColumn("cid", _assign_expr(centroids)["cid"])
        .groupBy("cid").count().collect()
    )
    emb.unpersist()
    return {
        "stage": "kmeans",
        "n_vectors": n,
        "dim": DIM,
        "k": KMEANS_K,
        "rounds_s": rounds,
        "total_s": round(total, 2),
        "rows_per_s_per_round": int(3 * n / sum(rounds)),
        "cluster_sizes": sorted(r["count"] for r in sizes),
    }


def jaccard_soak(spark, k: int) -> dict:
    """K×-replicate documents (distinct doc_ids per copy) and run the
    prefix-join pipeline; candidate count must scale ~K× (dup density
    fixed), not K²."""
    from tracker_trainer_spark.queries_ml_ext import jaccard_prefix_join

    docs = _t(spark, SF_DIR, "documents")
    n_base = docs.count()
    copies = spark.range(k).select(F.col("id").alias("copy"))
    # tag each copy's text so duplicate density stays CONSTANT as the
    # corpus grows (real growth): without this, every base duplicate
    # cluster of size m becomes size K·m and the qualifying-pair OUTPUT
    # itself grows K² — an output-semantics blowup, not engine cost
    big = (
        docs.crossJoin(copies)
        .withColumn("doc_id", F.col("doc_id") + F.col("copy") * 10_000_000)
        .withColumn("text", F.concat_ws(" ", "text", F.concat(F.lit("cp"), "copy")))
        .drop("copy")
    )
    path = "/tmp/cluster_soak_docs"
    big.write.mode("overwrite").parquet(f"{path}/documents.parquet")
    t0 = time.perf_counter()
    out = jaccard_prefix_join(spark, path)
    rows = out.count()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return {
        "stage": "jaccard_prefix_join",
        "n_docs": n_base * k,
        "result_rows": rows,
        "total_s": round(dt, 2),
        "docs_per_s": int(n_base * k / dt),
    }


def main():
    spark = get_spark(app_name="cluster-soak")
    spark.sparkContext.setLogLevel("ERROR")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    print(json.dumps(kmeans_soak(spark, n)), flush=True)
    print(json.dumps(jaccard_soak(spark, k)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
