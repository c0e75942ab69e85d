"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR and print one
JSON line {"metric": ..., "value": total_sec, "unit": "sec", "queries": ...}.

Each query is fully materialized so the measured time covers scan →
shuffle → action, not plan construction. Materialization is Arrow on BOTH
engines (Spark ``toPandas()``, DuckDB ``.df()``): row-object ``collect()``
/ ``fetchall()`` deserialization dominated wide results (propensity
explode: 0.95 s collect vs 0.43 s Arrow for identical engine work) and
measures the client protocol, not the engine.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tracker_trainer_spark.queries import ORACLES, QUERIES, release_caches  # noqa: E402
from tracker_trainer_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duckdb_timings(sf_dir: str, threads: str) -> dict[str, float]:
    """Best-of-3 runtime of each query's DuckDB oracle on the same
    parquet and thread budget — the single-node engine yardstick the
    Spark ratios are judged against (BASELINE.md 'within 2× of a tuned
    single-node engine'). Measured here, not argued in prose."""
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {int(threads)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    out: dict[str, float] = {}
    for name, sql in ORACLES.items():
        runs = []
        for _ in range(3):
            start = time.perf_counter()
            con.execute(sql).df()
            runs.append(time.perf_counter() - start)
        out[name] = min(runs)  # unrounded: sub-ms oracles must not
        # round to 0.0 and silently vanish from the ratio map
    con.close()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # 4 MB splits: the sf parquet files are all under the 128 MB
    # production split size, so with the default every first stage runs
    # on ONE core — a small-file artifact a 100 TB cluster (≥128 MB
    # files) never sees, and one DuckDB doesn't share (it parallelizes
    # row groups regardless of file size). Restoring scan parallelism
    # here measures the plans, not the local file layout.
    spark = get_spark(app_name="tts-bench", master=f"local[{cpus}]",
                      extra_conf={
                          "spark.ui.enabled": "false",
                          "spark.sql.files.maxPartitionBytes": "4194304",
                      })
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    # warm the JVM code paths and the per-core Python UDF worker pool so
    # per-query numbers measure steady state, not process startup
    from tracker_trainer_spark.session import warm_python_workers

    warm_python_workers(spark)
    QUERIES["events_type_stats"](spark, sf_dir).toPandas()
    QUERIES["dedup_minhash_candidates"](spark, "/root/testdata/sf0.001").toPandas()

    # best-of-3 per query: single-shot numbers on a shared box mix
    # scheduler noise into the measurement (observed 5-10x swings on
    # identical plans); the min of three runs reports steady-state engine
    # time while still executing every query end-to-end each time
    for name, fn in QUERIES.items():
        runs = []
        for _ in range(3):
            start = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            runs.append(time.perf_counter() - start)
            # r10 measurement-bug fix (VERDICT r9 item 1): the drains
            # used to run once per QUERY, after its three repeats — so
            # runs 2-3 of any query that persists an intermediate
            # (CacheManager matches canonicalized plans across repeat
            # constructions) or memoizes a training artifact skipped the
            # construction work, and min-of-3 reported a warm-cache time
            # the driver's single-shot runs never see.  Draining after
            # EVERY timed run (drain cost outside the timed region)
            # makes each repeat pay full construction:
            # - clearCache: pinned InMemoryRelations (shingles, vocab,
            #   baskets) must not leak into the next run/query
            # - release_caches: tracked-persist registry (ADVICE r8)
            #   + the trained_artifact session memo (VERDICT r9 item 1)
            # - gc.collect: localCheckpoint blocks release only when the
            #   dropped DataFrame's RDD is GC'd and the ContextCleaner
            #   drains (ADVICE r5)
            spark.catalog.clearCache()
            release_caches()
            gc.collect()
        timings[name] = round(min(runs), 3)

    # Measure Spark's fixed per-query floor on THIS box right now:
    # best-of-5 of the smallest registry-shaped query (scan the 5-row
    # region table → hash agg over a 32-partition shuffle → Arrow
    # fetch).  60+ registry queries finish in a few hundred ms where
    # DuckDB takes single-digit ms, so the aggregate Spark/DuckDB ratio
    # at sf0.1 is dominated by this constant — plan analysis + stage
    # scheduling + Arrow roundtrip — which amortizes to nothing at
    # cluster scale.  The decomposition makes the artifact say that
    # with data instead of prose: corrected = sum(max(t_q - floor, 0)).
    # (A bare spark.range(1) job measures ~0.02 s and understates the
    # floor 10×; the scan+shuffle+agg shape measures ~0.2 s, matching
    # the observed per-query constant.)
    from pyspark.sql import functions as _F

    floor_runs = []
    for _ in range(5):
        start = time.perf_counter()
        (spark.read.parquet(f"{sf_dir}/region.parquet")
         .groupBy("r_regionkey")
         .agg(_F.count(_F.lit(1)).alias("n")).toPandas())
        floor_runs.append(time.perf_counter() - start)
    job_floor = min(floor_runs)

    duck = duckdb_timings(sf_dir, cpus)
    ratios = {n: round(timings[n] / duck[n], 2)
              for n in timings if duck.get(n, 0) > 0}
    duck = {n: round(v, 4) for n, v in duck.items()}  # rounded for display

    total = round(sum(timings.values()), 3)
    duck_total = round(sum(duck.values()), 3)
    corrected_total = round(
        sum(max(t - job_floor, 0.0) for t in timings.values()), 3)

    # Engine-bound subset: queries whose DuckDB oracle itself does >=
    # 50 ms of work.  Below that, the oracle runs in microseconds and
    # the "ratio" measures nothing but Spark's fixed per-query constant
    # (the 2024-era single-node-engine comparison trap); above it, both
    # engines execute comparable work and the ratio reflects plan
    # quality.  Reported alongside the full aggregate, never instead.
    ENGINE_BOUND_MIN_DUCK_S = 0.05
    eb = [n for n in timings if duck.get(n, 0) >= ENGINE_BOUND_MIN_DUCK_S]
    eb_spark = sum(timings[n] for n in eb)
    eb_duck = sum(duck[n] for n in eb)
    eb_corr = sum(max(timings[n] - job_floor, 0.0) for n in eb)
    engine_bound = {
        "n_queries": len(eb),
        "min_duckdb_s": ENGINE_BOUND_MIN_DUCK_S,
        "spark_total_s": round(eb_spark, 3),
        "duckdb_total_s": round(eb_duck, 3),
        "ratio": round(eb_spark / eb_duck, 2) if eb_duck else None,
        "corrected_ratio": round(eb_corr / eb_duck, 2) if eb_duck else None,
    }

    # Full per-query maps (98 queries × 3 maps ≈ 9 KB) overflow the
    # driver's ~2 KB tail capture (BENCH_r02 came back parsed:null), so
    # they go to a sidecar file and the printed line stays compact: the
    # totals, ratio distribution, and the 10 slowest queries.
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "duckdb_s": duck,
        "spark_over_duckdb": ratios,
        "spark_job_floor_s": round(job_floor, 4),
        "overhead_corrected_total_s": corrected_total,
        "engine_bound": engine_bound,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    sorted_ratios = sorted(ratios.values())
    if sorted_ratios:
        mid = len(sorted_ratios) // 2
        median_ratio = round(
            sorted_ratios[mid] if len(sorted_ratios) % 2
            else (sorted_ratios[mid - 1] + sorted_ratios[mid]) / 2, 2)
    else:
        median_ratio = None
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": slowest,  # 10 slowest; full map in BENCH_DETAIL.json
        "n_queries": len(timings),
        "duckdb_total_s": duck_total,
        "spark_over_duckdb_median": median_ratio,
        "spark_over_duckdb_max": max(sorted_ratios) if ratios else None,
        # fixed per-job scheduling floor measured on this box (best-of-5
        # trivial job) and the aggregate with that constant removed from
        # each query — the scale-relevant engine-time comparison
        "spark_job_floor_s": round(job_floor, 4),
        "overhead_corrected_total_s": corrected_total,
        "corrected_over_duckdb": (
            round(corrected_total / duck_total, 2) if duck_total else None),
        # the plan-quality comparison: only queries where the DuckDB
        # oracle itself does >=50ms of work (sub-ms oracles measure
        # Spark's fixed constant, not the engine)
        "engine_bound": engine_bound,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "detail": "BENCH_DETAIL.json",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
