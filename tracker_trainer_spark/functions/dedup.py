"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

These extend the reference's surface (SURVEY §2.10 north-star
extensions — the reference has only the map-union dedup of reward
message_ids, src/ingest/partition.py:202-210). Everything here is
expressed with JVM-side higher-order functions over token/shingle
arrays, so signatures are computed scan-side with no shuffle; the only
shuffle is the band-bucket self-join, which moves (id, band-key) pairs —
never document bodies. Hash parameters are deterministic from a seed so
the DuckDB oracles embed identical literals.

Scale notes (100 TB posture):
- signature computation is narrow (per-row HOFs inside codegen);
- the LSH candidate join shuffles only ~bands rows of (long, string) per
  document, then semi-joins back for verification;
- nothing is collected to the driver (params are generated driver-side
  from a seed, not from data).
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from .text import HASH_BITS, HASH_PRIME, portable_token_hash, tokens, word_ngrams


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the min-id row per md5 content fingerprint.

    The 128-bit fingerprint (not the body) is what shuffles.
    """
    keep = (
        df.groupBy(F.md5(F.col(text_col)).alias("fingerprint"))
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep, id_col, "left_semi")


def minhash_params(num_hashes: int = 12, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the affine permutations
    h' = (a*h + b) mod HASH_PRIME. a*h < 2^59 — no BIGINT overflow in
    Spark or DuckDB."""
    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, HASH_PRIME), rnd.randrange(0, HASH_PRIME))
        for _ in range(num_hashes)
    ]


def shingle_hashes(text_col, n: int = 3) -> Column:
    """Distinct hashed word n-gram shingles of a text column."""
    return F.array_distinct(
        F.transform(word_ngrams(tokens(text_col), n), portable_token_hash)
    )


def minhash_signature(hashes_col, params: list[tuple[int, int]]) -> Column:
    """MinHash signature: per permutation, min over shingle hashes.

    Null (no shingles → empty array) yields HASH_PRIME sentinels so empty
    docs never collide with real content.
    """
    h = F.col(hashes_col) if isinstance(hashes_col, str) else hashes_col
    return F.array(
        *[
            F.coalesce(
                F.array_min(
                    F.transform(h, lambda x: (F.lit(a) * x + F.lit(b)) % HASH_PRIME)
                ),
                F.lit(HASH_PRIME),
            )
            for a, b in params
        ]
    )


def lsh_band_hashes(sig_col, bands: int, rows: int) -> Column:
    """Array of (band, key) structs; key is the '-'-joined band slice.

    Two docs land in the same bucket iff one full band of their
    signatures agrees (standard banding: P(candidate) = 1-(1-s^rows)^bands).
    """
    sig = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "-",
                    *[
                        F.element_at(sig, b * rows + j + 1).cast("string")
                        for j in range(rows)
                    ],
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )


def shingle_hashes_arrow(text_col, n: int = 3) -> Column:
    """Arrow-vectorized twin of shingle_hashes: identical output (md5
    first-7-hex → int, distinct, original first-occurrence order per
    array_distinct semantics), computed in a pandas UDF.

    The HOF version evaluates interpreted (transform+md5+conv run
    expression-tree-walking per shingle, outside whole-stage codegen);
    hashlib.md5 over Arrow batches measured ~3× faster end-to-end on the
    minhash pipeline and is the same "UDFs beat interpreted HOFs for
    CPU-dense kernels" trade the signature kernel already makes.
    """
    import hashlib
    import re

    # Java's \s is ASCII-only [ \t\n\x0B\f\r]; Python's \s is
    # unicode-aware. Spell out the Java class so tokenization stays
    # bit-identical to the HOF/split expression (and the DuckDB oracle)
    ws = re.compile(r"[ \t\n\x0B\f\r]+")

    @F.pandas_udf(ArrayType(LongType()))
    def _sh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = ws.split(t) if t is not None else []
            seen: dict[int, None] = {}
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n]).encode("utf-8", "surrogatepass")
                h = int(hashlib.md5(g).hexdigest()[:7], 16)
                if h not in seen:
                    seen[h] = None
            out.append(list(seen.keys()))
        return pd.Series(out)

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _sh(c)


def doc_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    parallelism: int | None = None,
) -> DataFrame:
    """(id, hashes) rows: distinct hashed n-gram shingles per doc.

    Shingle hashing is CPU-bound but the documents table is byte-small,
    so a file scan can land on far fewer partitions than cores
    (maxPartitionBytes governs splits by *bytes*). ``parallelism``
    repartitions the cheap raw rows first so the expensive narrow stage
    uses every core — at real scale input splits already provide this
    and the repartition is a no-op to skip.

    The short-doc filter deliberately tests *token count* (cheap split),
    not shingle-array size: a filter on the hash array would be pushed
    below the repartition exchange by Catalyst and drag the whole hash
    computation into the narrow pre-shuffle scan stage (measured 10×
    slowdown), besides computing it twice. Hashing itself runs in the
    Arrow kernel (shingle_hashes_arrow) — bit-identical to the HOF
    expression, ~3× faster.
    """
    # cheap predicate, evaluated scan-side (pushed below the exchange —
    # that's desirable here: it shrinks the shuffle)
    df = df.where(F.size(tokens(text_col)) >= n)
    if parallelism:
        from ..session import spread

        df = spread(df, parallelism)
    # token_count >= n ⟹ at least one shingle, so no empty-array filter
    # is needed above the exchange
    return df.select(F.col(id_col), shingle_hashes_arrow(text_col, n).alias("hashes"))


def minhash_signature_arrow(hashes_col, params: list[tuple[int, int]]) -> Column:
    """Arrow-vectorized MinHash signature over precomputed shingle
    hashes (numpy affine-min per row) — bit-identical to
    ``minhash_signature``'s HOF expression but ~10× faster: Spark's
    higher-order functions evaluate interpreted, outside whole-stage
    codegen. int64 is safe: a < 2^31, h < 2^28 ⇒ a*h + b < 2^60."""
    a = np.array([p[0] for p in params], dtype=np.int64)[:, None]
    b = np.array([p[1] for p in params], dtype=np.int64)[:, None]
    num_hashes = len(params)

    @F.pandas_udf(ArrayType(LongType()))
    def sig_udf(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            if h is None or len(h) == 0:
                # empty/no shingles → HASH_PRIME sentinels, matching
                # minhash_signature's coalesce and fused_minhash_signature
                # (a zero-size numpy min has no identity and raises)
                out.append(np.full(num_hashes, HASH_PRIME, dtype=np.int64))
                continue
            hv = np.asarray(h, dtype=np.int64)[None, :]
            out.append(((a * hv + b) % HASH_PRIME).min(axis=1))
        return pd.Series(out)

    c = F.col(hashes_col) if isinstance(hashes_col, str) else hashes_col
    return sig_udf(c)


def candidates_from_shingles(
    sh: DataFrame,
    id_col: str = "doc_id",
    hashes_col: str = "hashes",
    num_hashes: int = 12,
    bands: int = 4,
    rows: int = 3,
    seed: int = 7,
) -> DataFrame:
    """LSH banding over precomputed shingle hashes → candidate pairs.

    Signatures come from the Arrow kernel (``minhash_signature_arrow``)
    rather than per-row array HOFs or explode+agg: the HOF route is
    interpreted (~10× slower) and the explode route additionally paid a
    pathological Generate cost.
    """
    assert bands * rows == num_hashes
    params = minhash_params(num_hashes, seed)
    mh = sh.select(
        F.col(id_col),
        minhash_signature_arrow(hashes_col, params).alias("sig"),
    )
    return pairs_from_signatures(mh, id_col, bands, rows)


def pairs_from_signatures(
    mh: DataFrame, id_col: str, bands: int, rows: int
) -> DataFrame:
    """(id, sig) → distinct candidate pairs via band bucketing.

    Public for callers that precompute signatures once and reuse them
    (e.g. the MinHash estimator-audit query); the shingle-to-candidates
    convenience wrappers above compose it."""
    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws(
                "-",
                *[
                    F.element_at("sig", bi * rows + j + 1).cast("string")
                    for j in range(rows)
                ],
            ).alias("key"),
        )
        for bi in range(bands)
    ]
    buckets = mh.select(
        id_col, F.explode(F.array(*band_structs)).alias("b")
    ).select(id_col, F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    # Bucket-collect instead of a bucket self-join: a self-join evaluates
    # the whole scan→shingle→signature pipeline once PER SIDE (the plan
    # showed two ArrowEvalPython subtrees), and one side shuffles twice.
    # Collecting ids per (band, key) runs the expensive pipeline once and
    # generates in-bucket pairs JVM-side with HOFs. Output volume is the
    # same as the join's (pairs within a bucket); mega-bucket skew hits
    # both shapes equally.
    grouped = (
        buckets.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .where(F.size("ids") > 1)
    )
    # two chained Generates stream the pairs: posexplode yields one row
    # per (i, a), then each row explodes only its own suffix slice. Peak
    # per-row memory is O(bucket), never the O(bucket^2) a single
    # flatten-of-pair-arrays value would materialize before exploding —
    # a 70k-id boilerplate bucket stays write-able instead of building a
    # ~2.4e9-element array in one row.
    return (
        grouped.select(F.posexplode("ids").alias("_i", "a"), F.col("ids"))
        .select(
            "a",
            F.explode(
                F.slice("ids", F.col("_i") + F.lit(2), F.size("ids"))
            ).alias("b"),
        )
        .select(F.col("a").alias(f"{id_col}_a"), F.col("b").alias(f"{id_col}_b"))
        .distinct()
    )


def fused_minhash_signature(
    text_col, n: int = 3, num_hashes: int = 12, seed: int = 7
) -> Column:
    """text → MinHash signature in ONE Arrow kernel (tokenize + shingle
    + md5 + affine-min), bit-identical to shingle_hashes_arrow ∘
    minhash_signature.

    When the consumer needs only signatures (the LSH candidate path),
    fusing skips materializing + Arrow-round-tripping the per-doc hash
    array between two chained pandas UDFs — measured ~20% off the whole
    candidate pipeline. doc_shingles stays separate for consumers that
    need the hash arrays themselves (exact Jaccard verification).
    """
    import hashlib
    import re

    params = minhash_params(num_hashes, seed)
    a = np.array([p[0] for p in params], dtype=np.int64)[:, None]
    b = np.array([p[1] for p in params], dtype=np.int64)[:, None]
    ws = re.compile(r"[ \t\n\x0B\f\r]+")  # Java \s, see shingle_hashes_arrow

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = ws.split(t) if t is not None else []
            hs = {
                int(
                    hashlib.md5(
                        " ".join(toks[i : i + n]).encode("utf-8", "surrogatepass")
                    ).hexdigest()[:7],
                    16,
                )
                for i in range(len(toks) - n + 1)
            }
            if hs:
                hv = np.fromiter(hs, dtype=np.int64, count=len(hs))[None, :]
                out.append(((a * hv + b) % HASH_PRIME).min(axis=1))
            else:
                out.append(np.full(num_hashes, HASH_PRIME, dtype=np.int64))
        return pd.Series(out)

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _sig(c)


def near_dup_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    rows: int = 3,
    seed: int = 7,
    parallelism: int | None = None,
) -> DataFrame:
    """MinHash+LSH near-duplicate candidate pairs (id_a < id_b, distinct).

    shingle→minhash→band→bucket-collect: the fused Arrow kernel emits
    signatures in one narrow pass; only (id, band, key) rows shuffle.
    """
    assert bands * rows == num_hashes
    sub = df.where(F.size(tokens(text_col)) >= n)
    if parallelism:
        from ..session import spread

        sub = spread(sub, parallelism)
    mh = sub.select(
        F.col(id_col),
        fused_minhash_signature(text_col, n, num_hashes, seed).alias("sig"),
    )
    return pairs_from_signatures(mh, id_col, bands, rows)


def jaccard(a_col, b_col) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays."""
    a = F.col(a_col) if isinstance(a_col, str) else a_col
    b = F.col(b_col) if isinstance(b_col, str) else b_col
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def simhash(tokens_col, bits: int = HASH_BITS) -> Column:
    """SimHash fingerprint of a token array.

    Per bit j: sum over token hashes of +1/-1 by bit value; sign(sum)>=0
    sets bit j. One narrow HOF pass; 2^j via pow() stays exact in doubles
    (bits <= 28 << 53).
    """
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    hashes = F.transform(t, portable_token_hash)
    seq = F.sequence(F.lit(0), F.lit(bits - 1))
    counters = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                seq,
                lambda j: F.when(
                    F.floor(h / F.pow(F.lit(2.0), j)).cast("long") % 2 == 1,
                    F.lit(1),
                )
                .otherwise(F.lit(-1))
                .cast("long"),
            ),
            lambda a, b: a + b,
        ),
    )
    return F.aggregate(
        F.zip_with(
            counters,
            seq,
            lambda c, j: F.when(c >= 0, F.pow(F.lit(2.0), j).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


# --------------------------------------------------------------------------
# Connected components: candidate pairs → transitive duplicate clusters
# --------------------------------------------------------------------------

def _cc_large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every neighbor v > u links to min(Γ(u) ∪ {u})."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least("_mv", "u").alias("m"))
    )
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _cc_small_star(e: DataFrame) -> DataFrame:
    """Small-star round: every neighbor v < u (and u itself) links to
    the minimum of u's smaller neighborhood."""
    canon = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = canon.groupBy("u").agg(F.min("v").alias("m"))
    return (
        canon.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select("u", F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _union_find_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find with min-id labels (path compression +
    union by attaching the larger root to the smaller)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def connected_components(
    edges: DataFrame,
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    max_iterations: int = 25,
    small_graph_threshold: int = 100_000,
) -> DataFrame:
    """Undirected edge list → (node, component) labels, component id =
    minimum node id in the component.

    Alternating large-star / small-star rounds (the published MapReduce
    connected-components scheme of Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC 2014): each round is one groupBy-min
    plus one key-equi-join — no all-pairs anything — and the edge set
    converges to per-component stars in O(log n) rounds, vs. graph
    diameter for plain min-label propagation (a 1M-doc chain of
    boilerplate near-dups would need 1M propagation rounds but ~20 star
    rounds). Per round the frame is locally checkpointed: iterative
    lineage would otherwise grow the plan exponentially and re-run every
    prior round per action.

    Convergence is detected by an (edge-count, xor-of-edge-hashes)
    checksum — one tiny action per round; a false-equal requires a
    colliding xor of 64-bit hashes (xor, not sum: ANSI mode makes a
    long sum overflow). Extends the LSH candidate generator:
    candidates are *pairs*, but dedup policy needs *clusters* (keep one
    survivor per transitive group), which is exactly this operator.
    """
    e = (
        edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    # Small-graph fast path: LSH candidate sets on already-curated
    # corpora are usually far smaller than the corpus; below the
    # threshold a driver union-find beats O(log n) distributed rounds
    # of fixed scheduling cost (measured ~5 s -> <1 s at sf0.1's 261
    # edges). ONE take(threshold+1) both tests the size and fetches the
    # rows — bounded driver memory by construction, and no separate
    # count() pass re-evaluating the expensive candidate lineage (the
    # 100 TB posture: above threshold the sentinel row is found early
    # and the distributed iteration proceeds with no full extra pass).
    # Results are identical: min-id labels either way.
    head = e.take(small_graph_threshold + 1)
    if len(head) <= small_graph_threshold:
        labels = _union_find_components([(r["u"], r["v"]) for r in head])
        spark = edges.sparkSession
        schema = e.select(
            F.col("u").alias("node"), F.col("u").alias("component")
        ).schema
        return spark.createDataFrame(
            list(labels.items()) or [], schema=schema
        )
    prev = None
    converged = False
    for _ in range(max_iterations):
        e = _cc_small_star(_cc_large_star(e)).localCheckpoint()
        chk = e.agg(
            F.count(F.lit(1)).alias("n"), F.bit_xor(F.xxhash64("u", "v")).alias("h")
        ).first()
        if prev == (chk["n"], chk["h"]):
            converged = True
            break
        prev = (chk["n"], chk["h"])
    if not converged:
        # a non-fixpoint edge set can label one node with MULTIPLE
        # components — silently wrong dedup downstream. The star rounds
        # converge in O(log n); 25 rounds covers any realistic graph, so
        # exhaustion means something is broken — fail loudly.
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "star-contraction rounds — raise max_iterations or inspect "
            "the edge distribution"
        )
    # fixpoint: every edge is (member, component-min); centers label
    # themselves so each node appears exactly once
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .union(e.select(F.col("v").alias("node"), F.col("v").alias("component")))
        .distinct()
    )
