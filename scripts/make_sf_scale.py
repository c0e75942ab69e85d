"""Scale the sf0.1 testdata to sfN by deterministic key-offset replication.

The driver's generator (seed=42) is not part of this repo, so a true sf1
regeneration is impossible — instead each table is replicated C times with
every key domain shifted by copy_index x (domain_max + 1).  Foreign keys
stay consistent because the SAME offset applies to a key domain everywhere
it appears (orderkey in orders+lineitem, custkey in customer+orders, ...),
so every copy is an internally-consistent shard and the union is a valid
database with C x the entities.  Dates, amounts and categorical columns
repeat across copies; group-bys see C x the rows per group and joins see
C x the matches — exactly the shape a bigger generated instance would
have, which is what an ENGINE-BOUND Spark-vs-DuckDB ratio needs (both
engines read the identical files; absolute query RESULTS differ from a
"real" sf1, but the workload does not).

documents/embeddings are NOT replicated: near-dup text copies would
inflate every dedup cluster quadratically and distort that family's
workload instead of scaling it — the sf1 bench (scripts/sf1_bench.py)
covers the relational + events families only and says so.

Usage: python scripts/make_sf_scale.py [copies] [out_dir]
         (defaults: 10 /tmp/sf1)
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"

# key domain -> [(table, column), ...]; every column in a domain gets the
# same offset so FK joins stay valid within each replica
DOMAINS = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
}

REPLICATED = ["customer", "supplier", "part", "orders", "lineitem", "events"]
FIXED = ["region", "nation"]  # true dims: never scale


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1")
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in REPLICATED + FIXED:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SRC}/{t}.parquet'")

    offsets: dict[tuple[str, str], int] = {}
    for domain, cols in DOMAINS.items():
        m = max(
            con.execute(f"SELECT max({c}) FROM {t}").fetchone()[0]
            for t, c in cols
        )
        for t, c in cols:
            offsets[(t, c)] = int(m) + 1

    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM {t}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied as-is")

    for t in REPLICATED:
        shifted = [(c, off) for (tt, c), off in offsets.items() if tt == t]
        replace = ", ".join(f"{c} + _c * {off} AS {c}" for c, off in shifted)
        con.execute(f"""
COPY (
  SELECT t.* REPLACE ({replace})
  FROM {t} t, range({copies}) r(_c)
) TO '{out}/{t}.parquet' (FORMAT PARQUET)
""")
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({copies} copies)")


if __name__ == "__main__":
    main()
