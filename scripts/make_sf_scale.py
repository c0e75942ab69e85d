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

documents/embeddings replicate with a PER-COPY PERTURBATION (r9,
VERDICT r8 item 6) instead of verbatim copies: verbatim text copies
would be exact cross-copy duplicates — every dedup cluster inflates
C× in membership (quadratically in pair volume), distorting the
family's workload instead of scaling it.  Perturbed copies scale it:

- documents: every 3rd token of copy c>0 gets a copy-specific suffix
  ("tok~c"), so cross-copy 3-gram Jaccard collapses to ~0.15 (below
  every dup threshold — copies are NOT near-dups of each other) while
  WITHIN-copy near-dup structure is preserved exactly (the same
  positional rewrite applies to both members of any near-dup pair, so
  their mutual shingle overlap is untouched).  n_chars is recomputed.
- embeddings: copy c>0 adds deterministic seeded N(0, 0.5·std) noise
  and keeps float32 — cross-copy cosine drops out of the near-dup
  band, within-copy geometry (cluster structure, neighbor ranks) is
  preserved up to the noise floor.
- doc_id and vec_id share ONE offset base (max of both domains) so
  equal-id cross-modal joins keep matching within every copy.

Workload effect: group-bys see C× groups, LSH bands see C× buckets of
the ORIGINAL size, ANN sees a C× corpus — linear scaling, no
quadratic dup inflation.  Absolute RESULTS differ from a "real" sf1
(as with the relational replicas); both engines read identical files,
which is what the engine-bound ratio needs.

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

    scale_text_tables(con, copies, out)


def scale_text_tables(con, copies: int, out: Path) -> None:
    """Perturbed replication of documents + embeddings (see module
    docstring): deterministic, pure pandas/numpy — no RNG leaks into
    repo code, only into this offline generator."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = con.execute(f"SELECT * FROM '{SRC}/documents.parquet'").df()
    embs = con.execute(f"SELECT * FROM '{SRC}/embeddings.parquet'").df()
    # one shared offset base keeps equal-id cross-modal joins aligned
    base = int(max(docs["doc_id"].max(), embs["vec_id"].max())) + 1

    def perturb_text(text: str, c: int) -> str:
        toks = text.split(" ")
        return " ".join(
            f"{t}~{c}" if i % 3 == 0 else t for i, t in enumerate(toks))

    doc_copies = []
    for c in range(copies):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + c * base
        if c > 0:
            d["text"] = d["text"].map(lambda s, c=c: perturb_text(s, c))
            d["n_chars"] = d["text"].str.len().astype("int64")
        doc_copies.append(d)
    all_docs = pd.concat(doc_copies, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(all_docs, preserve_index=False),
                   f"{out}/documents.parquet")
    print(f"documents: {len(all_docs)} rows ({copies} perturbed copies)")

    mat = np.stack(embs["embedding"].to_numpy()).astype(np.float64)
    sigma = 0.5 * float(mat.std())
    emb_copies = []
    for c in range(copies):
        e = embs.copy()
        e["vec_id"] = e["vec_id"] + c * base
        if c > 0:
            noise = np.random.default_rng(c).normal(0.0, sigma, mat.shape)
            pert = (mat + noise).astype(np.float32)
            e["embedding"] = list(pert)
        emb_copies.append(e)
    all_embs = pd.concat(emb_copies, ignore_index=True)
    tbl = pa.Table.from_pandas(all_embs, preserve_index=False)
    # keep the float32 list dtype of the source file
    idx = tbl.schema.get_field_index("embedding")
    tbl = tbl.set_column(
        idx, "embedding",
        tbl.column("embedding").cast(pa.list_(pa.float32())))
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print(f"embeddings: {len(all_embs)} rows ({copies} perturbed copies)")


if __name__ == "__main__":
    main()
