"""Scale soak for the r7 co-purchase pair shape (part_affinity_recs).

The r7 rewrite generates pairs from a shuffle-hash self-join of the
deduped co-partitioned (order, part) relation instead of exploding
collect_set basket arrays.  This soak pins the two properties that make
the shape 100 TB-safe, measured on real data at three scales
(sf0.01 → sf0.1 → sf1 when present):

1. LINEAR pair volume: generated a<b pairs grow ~linearly with input
   rows (baskets are bounded — TPC-H orders hold ≤7 lines, the
   replicated sf1 ≤17 — so the quadratic-in-basket term is a constant
   factor, not a scale term).  A super-linear drift would mean the
   join started pairing across orders.
2. AMORTIZING per-pair cost: wall/1M-pairs must be non-increasing as
   scale grows, within a 1.5× noise allowance per step (the fixed job
   floor dominates small scales, so the absolute spread downward is
   large and meaningless; what a regression looks like is a LARGER
   scale paying MORE per pair — the agg losing map-side combine, or
   the join falling back to a sort).

Also cross-checks the generator against a brute-force pandas
groupby-combinations count on sf0.01 (exact pair-multiset equality,
on both the packed-BIGINT and the wide-partkey fallback key paths).

Usage: python scripts/pair_soak.py [sf1_dir]   (default /tmp/sf1,
       skipped if absent)
"""

from __future__ import annotations

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tracker_trainer_spark.session import get_spark  # noqa: E402


def pair_counts(spark, sf_dir, pack: bool = True):
    """The SHIPPED pair-generation subtree — imported, not copied, so a
    shape change in the query is automatically what this soak
    certifies (review r7)."""
    from tracker_trainer_spark.queries_recs_ext import copurchase_pairs

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey")
    ob = (li.repartition("l_orderkey")
          .dropDuplicates(["l_orderkey", "l_partkey"]))
    return copurchase_pairs(ob, pack=pack)


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="pair-soak", master=f"local[{cpus}]",
                      extra_conf={
                          "spark.sql.shuffle.partitions": "32",
                          "spark.ui.enabled": "false",
                          "spark.sql.files.maxPartitionBytes": "4194304",
                      })
    spark.sparkContext.setLogLevel("ERROR")

    # -- exactness vs brute force on sf0.01, BOTH key paths -----------
    small = "/root/testdata/sf0.01"
    pdf = (spark.read.parquet(f"{small}/lineitem.parquet")
           .select("l_orderkey", "l_partkey").toPandas())
    want: dict[tuple, int] = {}
    for _, grp in pdf.groupby("l_orderkey")["l_partkey"]:
        for a, b in itertools.combinations(sorted(set(grp)), 2):
            want[(int(a), int(b))] = want.get((int(a), int(b)), 0) + 1
    for pack in (True, False):
        got = {(r["a"], r["b"]): r["co"]
               for r in pair_counts(spark, small, pack=pack).collect()}
        assert got == want, (
            f"pair multiset mismatch (pack={pack}): "
            f"{len(got)} spark vs {len(want)} brute")
    print(f"sf0.01 brute-force parity: {len(want)} distinct pairs exact "
          f"on both the packed and the wide-partkey fallback path")

    # -- linearity + flat per-pair cost across scales ------------------
    dirs = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    if os.path.isdir(sf1_dir):
        dirs.append(sf1_dir)
    stats = []
    for d in dirs:
        rows = (spark.read.parquet(f"{d}/lineitem.parquet")
                .select(F.count(F.lit(1))).collect()[0][0])
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            n_pairs = (pair_counts(spark, d)
                       .agg(F.sum("co")).collect()[0][0])
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        stats.append((d, rows, n_pairs, best))
        print(f"{d}: rows={rows} pairs={n_pairs} "
              f"pairs/row={n_pairs / rows:.2f} wall={best:.2f}s "
              f"s/1Mpairs={best * 1e6 / n_pairs:.3f}")

    ratios = [s[2] / s[1] for s in stats]
    assert max(ratios) / min(ratios) < 3, (
        f"pair volume is not ~linear in rows: pairs/row {ratios}")
    per_pair = [s[3] * 1e6 / s[2] for s in stats]
    # per-pair cost must not GROW with scale (1.5x noise allowance per
    # step — the strict-min form was both flaky under co-tenant noise
    # at the top scale and blind to a mid-scale blow-up; review r7)
    for prev, cur in zip(per_pair, per_pair[1:]):
        assert cur <= prev * 1.5, (
            f"per-pair cost grew with scale: {per_pair}")
    print(f"pair_volume_linear=true per_pair_amortizes=true "
          f"(pairs/row {[round(r, 2) for r in ratios]}, "
          f"s/1Mpairs {[round(p, 3) for p in per_pair]})")
    spark.stop()


if __name__ == "__main__":
    main()
