"""Stage-level profile of the pair/triple-mining family at sf1.

VERDICT r6 item 2 says profile BEFORE rewriting: measure where the
wall time goes — basket aggregation (collect_set), pair explode+agg,
or the scoring joins — per query, on the same local[32] session the
sf1 bench uses.  Each stage is timed by forcing it with a cheap
count()/noop write; stages nest, so stage N's marginal cost is
t(N) - t(N-1).

Usage: python scripts/profile_pairs.py [sf_dir]  (default /tmp/sf1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tracker_trainer_spark.session import get_spark  # noqa: E402


def t(label, action):
    t0 = time.time()
    out = action()
    dt = time.time() - t0
    print(f"  {label:55s} {dt:7.2f}s  {out}")
    return dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = get_spark(app_name="profile-pairs", master="local[32]",
                      extra_conf={"spark.sql.shuffle.partitions": "32",
                                  "spark.ui.enabled": "false"})
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey")

    print("== part_affinity_recs stages ==")
    t("lineitem scan (count)", lambda: li.count())
    baskets = (li.groupBy("l_orderkey")
               .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
               .where(F.size("ps") >= 2))
    t("baskets: collect_set agg", lambda: baskets.count())
    stats = baskets.select(
        F.count(F.lit(1)).alias("n_baskets"),
        F.sum(F.expr("size(ps)*(size(ps)-1)/2")).alias("n_pairs"),
        F.max(F.size("ps")).alias("max_basket"),
        F.avg(F.size("ps")).alias("avg_basket"))
    t("basket stats", lambda: stats.collect()[0].asDict())
    pairs = baskets.select(F.explode(F.expr(
        "flatten(transform(ps, (x, i) -> transform("
        "slice(ps, i + 2, size(ps)), y -> (CAST(x AS BIGINT) << 32) + y)))"
    )).alias("pk"))
    t("pairs: explode only (count)", lambda: pairs.count())
    half = (pairs.groupBy("pk").agg(F.count(F.lit(1)).alias("co"))
            .where(F.col("co") >= 3))
    t("pairs -> groupBy(pk) agg + support filter", lambda: half.count())

    # alternative shape A: self-join on orderkey (the DuckDB plan)
    ob = li.distinct()
    a = ob.alias("a"); b = ob.alias("b")
    sj = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                 & (F.col("a.l_partkey") < F.col("b.l_partkey")))
          .groupBy(F.col("a.l_partkey").alias("pa"),
                   F.col("b.l_partkey").alias("pb"))
          .agg(F.count(F.lit(1)).alias("co")).where(F.col("co") >= 3))
    t("ALT self-join shape: distinct+join+agg", lambda: sj.count())

    # alternative shape A': the shipped r7 shape — repartition(okey)
    # puts ONE exchange on the fact (serves the dedup AND both join
    # sides via AQE stage reuse; distinct's (okey,pkey) exchange above
    # does NOT satisfy the join and forces two more), and shuffle_hash
    # skips SortMergeJoin's two fact-side sorts.  Same-session A/B at
    # sf1 (bench conf): SMJ-on-distinct 5.2-6.1 s, this 2.6-2.9 s,
    # collect_set baskets 5.4-10.3 s.
    from tracker_trainer_spark.queries_recs_ext import copurchase_pairs

    ob2 = (li.repartition("l_orderkey")
           .dropDuplicates(["l_orderkey", "l_partkey"]))
    sj2 = copurchase_pairs(ob2).where(F.col("co") >= 3)
    t("ALT repart+SHJ self-join (shipped r7)", lambda: sj2.count())

    # alternative shape B: explode without array_sort (sort_array inside
    # collect_set output is only needed for a<b; try min/max pack instead)
    pairs_nosort = (li.groupBy("l_orderkey")
                    .agg(F.collect_set("l_partkey").alias("ps"))
                    .where(F.size("ps") >= 2)
                    .select(F.explode(F.expr(
                        "flatten(transform(ps, (x, i) -> transform("
                        "slice(ps, i + 2, size(ps)), "
                        "y -> (CAST(least(x,y) AS BIGINT) << 32)"
                        " + greatest(x,y))))")).alias("pk")))
    halfns = (pairs_nosort.groupBy("pk").agg(F.count(F.lit(1)).alias("co"))
              .where(F.col("co") >= 3))
    t("ALT no-array_sort least/greatest pack + agg", lambda: halfns.count())

    print("== full queries ==")
    from tracker_trainer_spark.queries import QUERIES
    for name in ("part_affinity_recs", "basket_pair_lift",
                 "frequent_brand_triples", "supplier_shared_parts",
                 "fk_integrity_audit", "multitouch_attribution"):
        df = QUERIES[name](spark, sf_dir)
        t(name, lambda d=df: d.count())
    spark.stop()


if __name__ == "__main__":
    main()
