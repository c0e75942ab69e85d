"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and a random-hyperplane
LSH bucketed variant as the scale path. All vector math is JVM-side
higher-order functions (zip_with / aggregate) — no Python in the loop;
the probe vector is the one legitimate driver-side literal (a single row
by construction). Hyperplanes are deterministic Rademacher (+/-1)
vectors from a seed so DuckDB oracles can embed identical literals.

Scale notes: brute force is a single narrow scan + top-k (TakeOrdered —
per-partition heaps, no global sort); the LSH variant prunes the scan to
one bucket, which at 1000 executors means bucket pruning happens before
the shuffleless heap.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Dot product of two array columns (JVM-side fold)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_as_double(a), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _lit_vec(vals: list[float]) -> Column:
    # ONE true ArrayType Literal via py4j's NumpyArrayConverter — NOT
    # F.lit(list), which classic PySpark unrolls right back into
    # array(*[lit(x) ...]) (one py4j round-trip per element; measured
    # 3.4× slower to construct at dim=64). Bit-identical to the
    # unrolled spelling (float64 in, Literal doubles out — pinned by
    # tests/test_plan_quality.py::test_lit_vec_bit_identity); Catalyst
    # constant-folds the unrolled CreateArray to this same Literal
    # anyway, so only driver-side construction time differs.
    return F.lit(np.asarray([float(x) for x in vals], dtype=np.float64))


def cosine_to_literal(vec_col, probe: list[float]) -> Column:
    """Cosine similarity of a vector column against a literal probe.

    Vectorized Arrow kernel: one matrix-vector product per batch. This
    is the hot loop of every brute-force ANN scan — the JVM
    higher-order-fold alternative evaluates an interpreted lambda per
    array element and measures ~1.4x slower at 500k x 64 dims.
    """
    q = np.asarray(probe, dtype=np.float64)
    nq = float(np.linalg.norm(q))

    @F.pandas_udf("double")
    def cos(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="float64")
        V = np.asarray(v.tolist(), dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            return pd.Series((V @ q) / (np.linalg.norm(V, axis=1) * nq))

    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return cos(v)


def brute_force_topk(
    df: DataFrame, probe: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: narrow scan + TakeOrdered (no global sort)."""
    return (
        df.select(id_col, cosine_to_literal(vec_col, probe).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


from pyspark.sql.types import DoubleType  # noqa: E402


@F.pandas_udf(DoubleType())
def pair_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine between two array columns (Arrow batches).

    For pair-heavy workloads (bucketed self-joins) this beats the
    zip_with/aggregate fold: Spark HOFs evaluate interpreted, the numpy
    kernel runs one BLAS-shaped pass per batch.
    """
    A = np.asarray(a.tolist(), dtype=np.float64)
    B = np.asarray(b.tolist(), dtype=np.float64)
    num = (A * B).sum(axis=1)
    den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
    return pd.Series(np.where(den > 0, num / den, 0.0))


def hyperplanes(num_planes: int, dim: int, seed: int = 11) -> list[list[int]]:
    """Deterministic Rademacher hyperplanes (+/-1 entries)."""
    rnd = random.Random(seed)
    return [[rnd.choice((-1, 1)) for _ in range(dim)] for _ in range(num_planes)]


def hyperplane_bucket(vec_col, planes: list[list[int]]) -> Column:
    """LSH bucket id: bit p set iff dot(v, plane_p) >= 0.

    All plane projections happen in ONE Arrow-batched matrix product.
    The per-plane alternative (a JVM higher-order fold per plane) costs
    len(planes) interpreted passes over every vector — the lambda is
    evaluated per element, outside whole-stage codegen — and loses
    badly as planes grow; the sign-bit pack is one numpy matmul here.
    """
    P = np.asarray(planes, dtype=np.float64)                  # (p, d)
    bits = (1 << np.arange(P.shape[0])).astype(np.int64)

    @F.pandas_udf("int")
    def bucket(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        V = np.asarray(v.tolist(), dtype=np.float64)          # (n, d)
        return pd.Series(((V @ P.T >= 0) * bits).sum(axis=1).astype("int32"))

    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return bucket(v)


def _seq_fold_sq_dists(V: "np.ndarray", C: "np.ndarray") -> "np.ndarray":
    """(n, k) squared L2 distances computed with the EXACT left-to-right
    association of the JVM fold ``aggregate(zip_with(v, c, (x-y)*(x-y)),
    0.0, acc+x)``: one IEEE double sub/mul/add per element in index
    order (numpy elementwise kernels neither fuse nor reassociate), so
    every distance is bit-equal to the HOF spelling."""
    n, k = V.shape[0], C.shape[0]
    out = np.empty((n, k), dtype=np.float64)
    for j in range(k):
        acc = np.zeros(n, dtype=np.float64)
        for t in range(C.shape[1]):
            diff = V[:, t] - C[j, t]
            acc = acc + diff * diff
        out[:, j] = acc
    return out


def l2_assign_exact(vec_col, cid_vec_pairs: list[tuple[int, list[float]]]) -> Column:
    """Nearest-centroid cid over (cid, vector) pairs (ascending cid),
    BIT-IDENTICAL to the interpreted HOF spelling
    ``array_min(array(struct(aggregate(zip_with(v, lit(c),
    (x-y)*(x-y)), 0.0, acc+x) AS dist, lit(cid))))["cid"]``:
    distances use the same left-fold association
    (:func:`_seq_fold_sq_dists`), distances are sums of squares so
    never -0.0, and ``np.argmin``'s first-minimum tiebreak equals the
    lexicographic struct min over ascending-cid candidates.  Exists
    because the HOF spelling evaluates interpreted per element AND its
    k×dim literal tree is re-analyzed every training round (guide
    §4.2) — this kernel is one Arrow pass per batch."""
    cids = np.asarray([c for c, _ in cid_vec_pairs], dtype=np.int32)
    C = np.asarray([v for _, v in cid_vec_pairs], dtype=np.float64)

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        V = np.asarray(v.tolist(), dtype=np.float64)
        d2 = _seq_fold_sq_dists(V, C)
        return pd.Series(cids[d2.argmin(axis=1)])

    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return assign(v)


def ivf_assign_exact(vec_col, centroids: list[list[float]]) -> Column:
    """Expanded-form (|c|² − 2·v·c) nearest-centroid id, BIT-IDENTICAL
    to the HOF spelling ``lit(float(sum(c*c))) − 2.0 *
    aggregate(zip_with(v, lit(c), x*y), 0.0, acc+x)`` with
    ties-to-lowest-cid: |c|² is the same Python float sum the lit
    carried, the dot product folds left-to-right (one IEEE mul/add per
    element, numpy does not reassociate), and the final
    ``csq − 2.0·acc`` is one sub per cell.  The training twin of
    :func:`ivf_assign` (which computes the same argmin via matmul —
    fine for serving, but a matmul reassociates the sum, and training
    feeds the result back into the next round's means where the oracle
    replays the fold spelling)."""
    csq = np.asarray([float(sum(v * v for v in c)) for c in centroids],
                     dtype=np.float64)
    C = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        V = np.asarray(v.tolist(), dtype=np.float64)
        n, k = V.shape[0], C.shape[0]
        d2 = np.empty((n, k), dtype=np.float64)
        for j in range(k):
            acc = np.zeros(n, dtype=np.float64)
            for t in range(C.shape[1]):
                acc = acc + V[:, t] * C[j, t]
            d2[:, j] = csq[j] - 2.0 * acc
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return assign(v)


def pq_encode_exact(vec_col, codebooks: list[list[list[float]]]) -> Column:
    """Per-subspace nearest-code ids, BIT-IDENTICAL to the HOF spelling
    ``array_min(array(struct(aggregate(zip_with(slice(v, s·d+1, d),
    lit(book[s][j]), (x-y)*(x-y)), 0.0, acc+x), lit(j))))["cid"]`` per
    subspace: direct-form distances via the exact left-fold
    (:func:`_seq_fold_sq_dists`), first-minimum tiebreak = lowest code.
    The training twin of :func:`pq_encode` (same direct form; that
    kernel's broadcast-subtract ``.sum(axis=2)`` reassociates, which is
    fine for serving but training means feed the oracle-replayed
    fold)."""
    B = np.asarray(codebooks, dtype=np.float64)          # (m, k, d)
    m, _, d = B.shape

    @F.pandas_udf("array<int>")
    def enc(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        X = np.asarray(vs.tolist(), dtype=np.float64)
        out = np.empty((X.shape[0], m), dtype=np.int32)
        for s in range(m):
            d2 = _seq_fold_sq_dists(X[:, s * d:(s + 1) * d], B[s])
            out[:, s] = d2.argmin(axis=1)
        return pd.Series([list(map(int, r)) for r in out])

    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return enc(c)


def pq_sub_assign_exact(sv_col, sub_col, books: list[list[list[float]]]) -> Column:
    """Nearest-code id for exploded (subspace, subvector) rows,
    BIT-IDENTICAL to the per-subspace when-chain of interpreted HOF
    candidates (direct (x−y)² left-fold per code, array_min ties to the
    lowest code — see :func:`_seq_fold_sq_dists`).  The training twin of
    the lloyd_pq_codebooks round expression: same arithmetic, one Arrow
    pass per batch, no m×k literal tree re-analyzed per round."""
    B = np.asarray(books, dtype=np.float64)              # (m, k, d)

    @F.pandas_udf("int")
    def assign(sv: pd.Series, sub: pd.Series) -> pd.Series:
        if len(sv) == 0:
            return pd.Series([], dtype="int32")
        subs = sub.to_numpy()
        SV = np.asarray(sv.tolist(), dtype=np.float64)
        out = np.zeros(len(subs), dtype=np.int32)
        for s in range(B.shape[0]):
            mask = subs == s
            if mask.any():
                out[mask] = _seq_fold_sq_dists(SV[mask], B[s]).argmin(axis=1)
        return pd.Series(out)

    svc = F.col(sv_col) if isinstance(sv_col, str) else sv_col
    sbc = F.col(sub_col) if isinstance(sub_col, str) else sub_col
    return assign(svc, sbc)


def ivf_assign(vec_col, centroids: list[list[float]]) -> Column:
    """IVF coarse quantizer: nearest-centroid cell id per vector.

    Vectorized pandas kernel (one matrix product per Arrow batch);
    ties break to the lowest cell id via argmin. Centroids are a small
    driver-side list — the IVF "trained" structure (here: caller-chosen
    deterministic rows or k-means output; both are ≤k×dim floats).
    """
    C = np.asarray(centroids, dtype=np.float64)          # (k, d)
    c_sq = (C * C).sum(axis=1)                           # |c|^2

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        V = np.asarray(v.tolist(), dtype=np.float64)     # (n, d)
        # argmin_c |v-c|^2 = argmin_c |c|^2 - 2 v.c   (|v|^2 constant per row)
        d2 = c_sq[None, :] - 2.0 * (V @ C.T)
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return assign(v)


def train_ivf_centroids(df: DataFrame, k: int = 8, seed: int = 11,
                        vec_col: str = "embedding",
                        max_iter: int = 20) -> list[list[float]]:
    """Train IVF coarse centroids with Spark ML KMeans (distributed
    Lloyd iterations — the iterative, non-SQL-expressible path).

    Returns plain python lists so the quantizer (`ivf_assign`) and the
    probe path stay backend-free. k×dim floats to the driver — the IVF
    structure is small by definition.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = df.select(
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(vecs)
    return [list(map(float, c)) for c in model.clusterCenters()]


def lloyd_centroids(df: DataFrame, k: int = 8, iters: int = 2,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id",
                    dim: int | None = None,
                    probe_id: int | None = None):
    """Deterministic distributed Lloyd training for the oracle-checked
    IVF query: init cells = id % k, then ``iters`` rounds of
    (per-cell/per-dim mean → reassign to nearest centroid, ties to the
    lowest cell).

    Deterministic BY CONSTRUCTION (no RNG): a DuckDB oracle reproduces
    the identical training in pure SQL, which a seeded Spark-ML KMeans
    cannot (KMeans|| init draws library-internal randomness). The
    persistent-index path (``build_ivf_index``) uses real KMeans; this
    is the oracle-checkable trained quantizer.

    Scale: each round is ONE hash aggregation producing k×dim partial
    means (map-side combined), and only the k×dim centroid floats ever
    reach the driver; reassignment is the vectorized ``ivf_assign``
    kernel. Rounds are O(iters) passes over the data — iters stays
    small (2) by design.

    Per-round means are quantized to 6 decimals before becoming
    assignment inputs: Spark's partial-sum avg depends on partition
    split order, so an UNROUNDED mean can differ between runs by an
    ulp and nondeterministically flip a knife-edge cell assignment
    against the fixed DuckDB oracle (observed once in ann_ivfpq_topk
    at sf0.001 before this guard). Both engines round identically.

    With ``probe_id`` set, returns ``(cents, probe)`` — the probe
    vector rides round 1's aggregation (see the fused-round-0 comment
    below) so no separate probe action runs.
    """
    start = 0
    cents: list[list[float]] = []
    probe: list[float] | None = None
    if probe_id is not None:
        # FUSED round 0: the probe vector and the corpus dim ride the
        # first mean aggregation as extra (cell=-1) rows — in the
        # exploded (cell, pos) shape, which needs no dim up front —
        # eliminating the separate probe first() action.  avg of the
        # single probe row is the exact value; only TRAINING means
        # quantize to 6 decimals (the probe must stay exact, same
        # contract as _fused_ivfpq_training's piggyback).
        dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        # probe sentinel is NULL, not a negative int: Spark's % keeps
        # the dividend sign, so negative ids produce genuine negative
        # cells that a -1 sentinel would collide with (and that must
        # flow into cents exactly as the non-fused path keeps them)
        x = df.select(
            (F.col(id_col) % k).cast("int").alias("cell"),
            F.posexplode(dbl).alias("pos", "v"),
        ).unionAll(
            df.where(F.col(id_col) == probe_id).select(
                F.lit(None).cast("int").alias("cell"),
                F.posexplode(dbl).alias("pos", "v"),
            )
        )
        rows = (
            x.groupBy("cell", "pos")
            .agg(F.avg("v").alias("raw"))
            .select(
                "cell", "pos",
                F.when(F.col("cell").isNull(), F.col("raw"))
                .otherwise(F.round("raw", 6)).alias("m"),
            )
            .collect()
        )
        pvals = {r["pos"]: r["m"] for r in rows if r["cell"] is None}
        if not pvals:
            raise ValueError(f"probe {id_col}={probe_id} not found")
        probe = [pvals[i] for i in range(len(pvals))]
        dim = len(probe)
        cmap: dict = {}
        for r in rows:
            if r["cell"] is not None:
                cmap.setdefault(r["cell"], [0.0] * dim)[r["pos"]] = r["m"]
        if len(cmap) != k:
            # same loud-failure contract as _fused_ivfpq_training: an
            # emptied init cell would silently shift every higher cell
            # down one position against the oracle's preserved cell ids
            raise ValueError(
                f"fused round-0 produced {len(cmap)} cells, expected {k}"
                f" — id%k init left a cell empty; use the non-fused path")
        cents = [cmap[c] for c in sorted(cmap)]
        start = 1
    elif dim is None:
        # pass dim when already known (e.g. from a fetched probe) —
        # each saved first() is ~0.3-0.5 s of fixed per-action floor
        dim = len(df.select(vec_col).first()[0])
    mean_cols = [
        F.round(F.avg(F.col("v")[i].cast("double")), 6).alias(f"c{i}")
        for i in range(dim)
    ]
    if start == 0:
        assigned = df.select(
            F.col(vec_col).alias("v"),
            (F.col(id_col) % k).cast("int").alias("cell"),
        )
    else:
        assigned = df.select(
            F.col(vec_col).alias("v"),
            ivf_assign(vec_col, cents).alias("cell"),
        )
    for _ in range(start, iters):
        rows = assigned.groupBy("cell").agg(*mean_cols).collect()
        # sort by cell id: list position tracks ascending cell id, so the
        # argmin tie-break (first minimum) == SQL's ORDER BY dist, cid.
        # If a cell EMPTIES, later positions shift down one — harmless
        # for oracle parity: position i ↔ the i-th smallest surviving
        # cid is an order-preserving bijection, so per-cell means,
        # distances, argmin ranks, and inverted-list MEMBERSHIP all
        # correspond across rounds (the labels differ, the partition of
        # vectors does not); the trained index just has < k live cells.
        cents = [[float(r[f"c{i}"]) for i in range(dim)]
                 for r in sorted(rows, key=lambda r: r["cell"])]
        assigned = df.select(
            F.col(vec_col).alias("v"),
            ivf_assign(vec_col, cents).alias("cell"),
        )
    return (cents, probe) if probe_id is not None else cents


def ann_ivf_topk(
    df: DataFrame, probe: list[float], centroids: list[list[float]],
    k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """IVF (nprobe=1) approximate top-k: prune the scan to the probe's
    coarse cell, exact cosine inside. The inverted-file analogue of
    ann_lsh_topk — at rest, partitionBy(cell) makes the prune a
    partition-pruned scan rather than a filter."""
    C = np.asarray(centroids, dtype=np.float64)
    p = np.asarray(probe, dtype=np.float64)
    probe_cell = int(((C * C).sum(axis=1) - 2.0 * (C @ p)).argmin())
    return brute_force_topk(
        df.where(ivf_assign(vec_col, centroids) == probe_cell),
        probe, k, vec_col, id_col,
    )


def ann_lsh_topk(
    df: DataFrame, probe: list[float], planes: list[list[int]], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: prune to the probe's hyperplane bucket, then
    exact cosine within the bucket. Same-bucket recall is the standard
    SimHash-LSH trade-off; multiprobe = union over neighbor buckets."""
    probe_bucket = 0
    for p, plane in enumerate(planes):
        if sum(float(a) * b for a, b in zip(probe, plane)) >= 0:
            probe_bucket |= 1 << p
    return brute_force_topk(
        df.where(hyperplane_bucket(vec_col, planes) == probe_bucket),
        probe, k, vec_col, id_col,
    )


def ann_lsh_multiprobe_topk(
    df: DataFrame, probe: list[float], planes: list[list[int]], k: int = 10,
    hamming: int = 1, vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Multi-probe LSH top-k (Lv et al., VLDB 2007): widen the search to
    every bucket within `hamming` bit flips of the probe's bucket — the
    recall knob for hyperplane LSH. A near neighbor lost to one
    hyperplane's sign flip sits in a Hamming-1 bucket; probing those
    recovers it at (1 + n_planes) buckets of cost instead of doubling
    the table count the single-probe recall fix would need.

    The predicate is ``bit_count(bucket XOR probe_bucket) <= hamming``
    — one codegen expression, still a scan-side prune before any
    shuffle; at rest with bucket partitioning it is partition pruning
    over the (n_planes choose <=hamming) cells.
    """
    probe_bucket = 0
    for p, plane in enumerate(planes):
        if sum(float(a) * b for a, b in zip(probe, plane)) >= 0:
            probe_bucket |= 1 << p
    b = hyperplane_bucket(vec_col, planes)
    near = F.bit_count(b.bitwiseXOR(F.lit(probe_bucket))) <= hamming
    return brute_force_topk(df.where(near), probe, k, vec_col, id_col)


# --------------------------------------------------------------------------
# Persistent IVF index: build once, partition-pruned probes forever
# --------------------------------------------------------------------------

def build_ivf_index(df: DataFrame, path: str, k: int = 8, seed: int = 11,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    max_iter: int = 20) -> list[list[float]]:
    """Materialize an IVF index: KMeans centroids + vectors written
    partitioned by inverted-list id.

    This is the 100 TB shape of `ann_ivf_topk`: quantization runs once
    at build time, and every probe afterward is a *partition-pruned*
    scan of nprobe/k of the data — no per-query KMeans, no per-query
    assignment pass, no full-table read. Layout:

        <path>/centroids.json       k×dim floats (the trained structure)
        <path>/lists/list_id=<c>/   vectors of inverted list c
    """
    import json as _json
    import os as _os

    centroids = train_ivf_centroids(df, k, seed, vec_col, max_iter)
    (
        df.withColumn("list_id", ivf_assign(vec_col, centroids))
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(f"{path}/lists")
    )
    _os.makedirs(path, exist_ok=True)
    with open(f"{path}/centroids.json", "w") as f:
        _json.dump(centroids, f)
    return centroids


def load_ivf_centroids(path: str) -> list[list[float]]:
    import json as _json

    with open(f"{path}/centroids.json") as f:
        return _json.load(f)


def ivf_index_topk(spark, path: str, probe: list[float], k: int = 10,
                   nprobe: int = 1, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """Probe a persisted IVF index: rank inverted lists by centroid
    distance driver-side (k×dim floats — no data scan), read only the
    nearest ``nprobe`` lists via partition pruning, exact cosine inside.

    nprobe=k degenerates to exact brute force over the whole index, so
    recall is tunable per query without rebuilding.
    """
    centroids = load_ivf_centroids(path)
    C = np.asarray(centroids, dtype=np.float64)
    p = np.asarray(probe, dtype=np.float64)
    order = ((C * C).sum(axis=1) - 2.0 * (C @ p)).argsort()
    cells = [int(c) for c in order[:nprobe]]
    lists = spark.read.parquet(f"{path}/lists")
    return brute_force_topk(
        lists.where(F.col("list_id").isin(cells)).drop("list_id"),
        probe, k, vec_col, id_col,
    )


def build_ivfpq_index(df: DataFrame, path: str, n_cells: int = 8,
                      m: int = 4, k: int = 16, iters: int = 2,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      dim: int | None = None) -> None:
    """Materialize a compressed IVF-PQ index: deterministic-Lloyd coarse
    cells + PQ codebooks + the (id, code) rows written partitioned by
    inverted-list id.

    This is the at-rest shape of ``ann_ivfpq_topk``: quantization runs
    once at build time; every probe afterwards is a PARTITION-PRUNED
    scan of nprobe/n_cells of an index whose rows are (id, m small
    ints) — a billion 64-dim float vectors compress to a few GB while
    the raw vectors stay wherever they were. Layout:

        <path>/meta.json            centroids + codebooks (the trained
                                    structures; k×dim + m×k×(dim/m) floats)
        <path>/codes/cell=<c>/      PQ codes of inverted list c
    """
    import json as _json
    import os as _os

    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    centroids = lloyd_centroids(df, k=n_cells, iters=iters,
                                vec_col=vec_col, id_col=id_col, dim=dim)
    books = lloyd_pq_codebooks(df, m=m, k=k, iters=iters, vec_col=vec_col,
                               id_col=id_col, dim=dim)
    (
        df.select(
            id_col,
            ivf_assign(vec_col, centroids).alias("cell"),
            pq_encode(vec_col, books).alias("pq_code"),
        )
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/codes")
    )
    _os.makedirs(path, exist_ok=True)
    with open(f"{path}/meta.json", "w") as f:
        _json.dump({"centroids": centroids, "codebooks": books}, f)


def ivfpq_index_topk(spark, path: str, probe: list[float], k: int = 10,
                     nprobe: int = 1, id_col: str = "vec_id",
                     order_decimals: int | None = None) -> DataFrame:
    """Probe a persisted IVF-PQ index: rank inverted lists by centroid
    distance driver-side (metadata floats only — no data scan), read
    the nearest ``nprobe`` lists via partition pruning, ADC-rank their
    codes. ``nprobe=n_cells`` degenerates to plain ADC over the whole
    index, so recall is tunable per query without rebuilding."""
    import json as _json

    with open(f"{path}/meta.json") as f:
        meta = _json.load(f)
    C = np.asarray(meta["centroids"], dtype=np.float64)
    p = np.asarray(probe, dtype=np.float64)
    # expanded |c|^2 - 2 x.c, the SAME algebraic form the index build's
    # assignment used (ivf_assign / _fused_ivfpq_training) — the direct
    # (C-p)^2 form can order two near-tied cells differently and prune
    # a different cell than the one the neighbors were assigned to
    order = np.argsort((C * C).sum(axis=1) - 2.0 * (C @ p),
                       kind="stable")[:nprobe]
    cells = [int(c) for c in order]
    codes = spark.read.parquet(f"{path}/codes")
    return pq_adc_topk(
        codes.where(F.col("cell").isin(cells)).drop("cell"),
        probe, meta["codebooks"], k=k, id_col=id_col,
        order_decimals=order_decimals,
    )


def bucket_pair_cosines(df: DataFrame, planes: list[list[int]],
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """All within-bucket pair cosines (id_a < id_b) in ONE pass.

    The self-join shape ships each embedding into Python once PER PAIR
    (quadratic Arrow transfer) and scans the table twice. Grouping by
    bucket and computing the pairwise cosine matrix per group moves each
    embedding exactly once (linear transfer, one shuffle) and does the
    quadratic part as a single BLAS product in numpy. Pair volume —
    and therefore mega-bucket skew — is identical to the join shape;
    more/finer hyperplanes is the lever that bounds bucket size.
    """
    bucketed = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        hyperplane_bucket(vec_col, planes).alias("_bucket"),
    )

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        order = pdf["_id"].to_numpy().argsort()
        ids = pdf["_id"].to_numpy()[order]
        V = np.asarray(pdf["_vec"].tolist(), dtype=np.float64)[order]
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0] = 1.0
        C = (V @ V.T) / np.outer(norms, norms)
        ia, ib = np.triu_indices(n, 1)
        return pd.DataFrame(
            {"id_a": ids[ia], "id_b": ids[ib], "cosine": C[ia, ib]}
        )

    return (
        bucketed.groupBy("_bucket")
        .applyInPandas(pairs, "id_a long, id_b long, cosine double")
        .withColumnRenamed("id_a", f"{id_col}_a")
        .withColumnRenamed("id_b", f"{id_col}_b")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed vectors + asymmetric distance
# ---------------------------------------------------------------------------

def train_pq_codebooks(df: DataFrame, m: int = 8, k: int = 16, seed: int = 11,
                       vec_col: str = "embedding",
                       max_iter: int = 10) -> list[list[list[float]]]:
    """Train product-quantization codebooks: the vector splits into `m`
    contiguous subvectors and each subspace gets its own KMeans(k)
    codebook (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011).

    The 100 TB memory story: a 64-dim float64 vector is 512 bytes; its
    PQ code is `m` small ints (m log2(k) bits of information) — a
    50-100× compression that lets a billion-vector index sit in executor
    memory while the exact vectors stay on disk for optional re-ranking.

    Training is m independent distributed KMeans fits over narrow
    subvector slices (each fit sees dim/m columns); only the m×k×(dim/m)
    codebook floats reach the driver — structurally tiny.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dim = len(df.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    books: list[list[list[float]]] = []
    for i in range(m):
        sub = df.select(
            array_to_vector(
                F.transform(
                    F.slice(F.col(vec_col), i * d + 1, d),
                    lambda x: x.cast("double"),
                )
            ).alias("features")
        )
        model = KMeans(k=k, seed=seed + i, maxIter=max_iter).fit(sub)
        books.append([list(map(float, c)) for c in model.clusterCenters()])
    return books


def lloyd_pq_codebooks(df: DataFrame, m: int = 4, k: int = 4,
                       iters: int = 2, vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       quantize: int = 6,
                       dim: int | None = None,
                       probe_id: int | None = None):
    """Deterministic distributed PQ codebook training — the
    oracle-checkable sibling of ``train_pq_codebooks`` (which uses
    Spark-ML KMeans and its library-internal init randomness, so no SQL
    oracle can reproduce it). Same construction as ``lloyd_centroids``:
    init code = vec_id % k in EVERY subspace, then ``iters`` rounds of
    (per-(subspace, code, dim) mean → reassign to nearest entry, ties
    to the lowest code).

    All m subspaces train in ONE pass per round: rows explode to
    (id, sub, subvector) scan-side, each round is a single
    (sub, cid, pos) hash aggregation (map-side combined) and only the
    m×k×(dim/m) codebook floats reach the driver. Per-round means are
    quantized to ``quantize`` decimals before becoming assignment
    literals — the same ulp-proofing as the kmeans registry query: both
    engines round identically, so argmin inputs match by construction.

    Returns ``books[sub][cid][pos]`` — directly consumable by
    ``pq_encode`` / ``pq_adc_topk``. Raises if any code empties (cannot
    happen under mod-k init on non-degenerate data; the dense m×k shape
    the kernels need would silently break otherwise). Pass ``dim`` when
    already known to skip the ``first()`` probe action, or
    ``probe_id`` to have the probe vector AND the dim ride round 1's
    aggregation as extra (sub=-2) rows (probe unquantized — only
    training means round; returns ``(books, probe)`` in that mode).
    """
    if dim is None and probe_id is None:
        dim = len(df.select(vec_col).first()[0])
    if dim is not None:
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        d_expr = F.lit(dim // m)
    else:
        # per-row subspace width — identical to the literal for a
        # fixed-dim corpus, available without a driver action
        d_expr = (F.size(F.col(vec_col)) / m).cast("int")
    sv = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array(*[
            F.struct(
                F.lit(s).alias("sub"),
                F.transform(
                    F.slice(F.col(vec_col), F.lit(s) * d_expr + 1, d_expr),
                    lambda x: x.cast("double"),
                ).alias("sv"),
            )
            for s in range(m)
        ])).alias("x"),
    ).select("_id", F.col("x.sub").alias("sub"), F.col("x.sv").alias("sv"))

    def assign_expr(books):
        expr = None
        for s in range(m):
            cands = [
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            F.col("sv"),
                            _lit_vec(c),
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("dist"),
                    F.lit(j).alias("cid"),
                )
                for j, c in enumerate(books[s])
            ]
            am = F.array_min(F.array(*cands))["cid"]
            cond = F.col("sub") == s
            expr = F.when(cond, am) if expr is None else expr.when(cond, am)
        return expr

    assigned = sv.withColumn("cid", (F.col("_id") % k).cast("int"))
    books: list[list[list[float]]] = []
    probe: list[float] | None = None
    for rnd in range(iters):
        keyed = assigned.select(
            "sub", "cid", F.posexplode("sv").alias("pos", "v"))
        if rnd == 0 and probe_id is not None:
            keyed = keyed.unionAll(
                df.where(F.col(id_col) == probe_id).select(
                    F.lit(-2).alias("sub"), F.lit(0).alias("cid"),
                    F.posexplode(
                        F.transform(F.col(vec_col), lambda x: x.cast("double"))
                    ).alias("pos", "v"),
                )
            )
        rows = (
            keyed.groupBy("sub", "cid", "pos")
            .agg(F.avg("v").alias("raw"))
            .select(
                "sub", "cid", "pos",
                F.when(F.col("sub") == -2, F.col("raw"))
                .otherwise(F.round("raw", quantize)).alias("m"),
            )
            .collect()
        )
        if rnd == 0 and probe_id is not None:
            pvals = {r["pos"]: r["m"] for r in rows if r["sub"] == -2}
            if not pvals:
                raise ValueError(f"probe {id_col}={probe_id} not found")
            probe = [pvals[i] for i in range(len(pvals))]
            dim = len(probe)
            if dim % m != 0:
                raise ValueError(f"dim {dim} not divisible by m={m}")
        d = dim // m
        books = [[[0.0] * d for _ in range(k)] for _ in range(m)]
        seen = set()
        for r in rows:
            if r["sub"] < 0:
                continue
            books[r["sub"]][r["cid"]][r["pos"]] = r["m"]
            seen.add((r["sub"], r["cid"]))
        if len(seen) != m * k:
            raise ValueError(
                f"PQ training emptied a code: {m * k - len(seen)} missing")
        if rnd + 1 < iters:
            # the post-final-round assignment is never aggregated —
            # building its m×k candidate expression is pure driver cost.
            # r10: reassignment runs the exact-fold Arrow kernel — bit-
            # identical to assign_expr's interpreted when-chain (see
            # pq_sub_assign_exact) without re-analyzing the m×k literal
            # tree per round; assign_expr remains the reference spelling
            # (tests pin the kernel against it).
            assigned = sv.withColumn(
                "cid", pq_sub_assign_exact("sv", "sub", books))
    return (books, probe) if probe_id is not None else books


def pq_encode(vec_col, codebooks: list[list[list[float]]]) -> Column:
    """Vector → array<int> of `m` codebook indices (nearest centroid per
    subspace, squared-L2). One Arrow kernel pass: the (m, k, d) codebook
    tensor broadcasts into each batch; per batch the assignment is one
    vectorized broadcast-subtract per subspace — no shuffle, no per-row
    Python.

    Distances use the DIRECT sum((s-c)²) form, not the expanded
    |c|² − 2 s·c: the direct form is what the SQL oracles compute, and
    the expanded form's catastrophic cancellation could flip an argmin
    between engines when two codebook entries sit ulps apart in
    distance. The (batch, k, d) temporary is a few MB per subspace."""
    B = np.asarray(codebooks, dtype=np.float64)          # (m, k, d)
    m, k, d = B.shape

    @F.pandas_udf("array<int>")
    def enc(vs: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if len(X) == 0:
            return pd.Series([], dtype=object)
        out = np.empty((X.shape[0], m), dtype=np.int32)
        for i in range(m):
            S = X[:, i * d:(i + 1) * d]                   # (n, d)
            D = ((S[:, None, :] - B[i][None, :, :]) ** 2).sum(axis=2)
            out[:, i] = D.argmin(axis=1)
        return pd.Series([list(map(int, r)) for r in out])

    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return enc(c)


def pq_adc_topk(codes_df: DataFrame, probe: list[float],
                codebooks: list[list[list[float]]], k: int = 10,
                code_col: str = "pq_code", id_col: str = "vec_id",
                order_decimals: int | None = None) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC): the
    probe stays exact, each database vector is its PQ reconstruction.
    dist²(probe, x) ≈ Σ_i lut[i][code_i] where the (m, k) lookup table
    of per-subspace squared distances is built once on the driver and
    broadcast into an Arrow kernel — scoring touches ONLY the m-int
    codes, never the raw vectors, and TakeOrdered avoids a global sort.

    ``order_decimals`` ranks by ROUND(adc, n) with an id tiebreak
    instead of the raw double. PQ ties are STRUCTURAL — every vector
    sharing a code has exactly-equal ADC in exact arithmetic, while
    each engine's floating sums differ in the last ulp — so an
    unrounded ORDER BY at the limit boundary is decided by summation
    order, not by data. Oracle-checked callers pass the oracle's output
    rounding (4); latency-sensitive callers leave it None.
    """
    B = np.asarray(codebooks, dtype=np.float64)           # (m, k, d)
    m, _, d = B.shape
    p = np.asarray(probe, dtype=np.float64)
    lut = np.stack([
        ((B[i] - p[i * d:(i + 1) * d]) ** 2).sum(axis=1) for i in range(m)
    ])                                                    # (m, k)

    @F.pandas_udf("double")
    def adc(codes: pd.Series) -> pd.Series:
        C = np.asarray([np.asarray(c, dtype=np.int64) for c in codes])
        if len(C) == 0:
            return pd.Series([], dtype=float)
        return pd.Series(lut[np.arange(m), C].sum(axis=1))

    key = (F.round(F.col("adc_dist"), order_decimals)
           if order_decimals is not None else F.col("adc_dist"))
    return (
        codes_df.select(id_col, adc(F.col(code_col)).alias("adc_dist"))
        .orderBy(F.asc(key), F.asc(id_col))
        .limit(k)
    )


def ivf_pq_topk(codes_df: DataFrame, probe: list[float],
                centroids: list[list[float]],
                codebooks: list[list[list[float]]], k: int = 10,
                cell_col: str = "cell", code_col: str = "pq_code",
                id_col: str = "vec_id", nprobe: int = 1,
                order_decimals: int | None = None) -> DataFrame:
    """IVF-PQ: the billion-scale composition — coarse IVF cells prune
    the candidate set (partition pruning at rest), then ADC ranks the
    survivors touching only their PQ codes. The index row is
    (id, cell, m ints): for a billion vectors ≈ a few GB in executor
    memory, with raw vectors left on disk for optional exact re-rank.

    ``nprobe`` widens the search to the n nearest coarse cells — the
    recall/latency knob (IVF's cell-edge misses recover as nprobe
    grows, cost grows linearly in scanned cells).
    """
    C = np.asarray(centroids, dtype=np.float64)
    p = np.asarray(probe, dtype=np.float64)
    # SAME algebraic form as ivf_assign (|c|^2 - 2 x.c), NOT the direct
    # (C-p)^2: mixing forms within the IVF chain reintroduces the
    # cancellation-magnitude divergence — a near-tie between two cells
    # could prune a different cell than assignment/oracle selected.
    near = np.argsort((C * C).sum(axis=1) - 2.0 * (C @ p),
                      kind="stable")[:nprobe]
    pruned = codes_df.where(F.col(cell_col).isin(*[int(c) for c in near]))
    return pq_adc_topk(pruned, probe, codebooks, k=k,
                       code_col=code_col, id_col=id_col,
                       order_decimals=order_decimals)


def sq8_encode(vec_col) -> Column:
    """Scalar quantization to int8: per-vector symmetric quantizer
    code_i = round(127 · x_i / max|x|), stored with its scale — the
    4×-compression little sibling of PQ (8× for float64 at rest) that
    keeps per-dimension resolution instead of subspace codebooks, with
    NO training step. One Arrow pass, no shuffle.

    Output struct: (codes array<tinyint>... stored int smallest Spark
    type is byte; scale double). Empty/zero vectors get scale 0 and
    all-zero codes.
    """
    @F.pandas_udf("struct<codes: array<tinyint>, scale: double>")
    def enc(vs: pd.Series) -> pd.DataFrame:
        codes, scales = [], []
        for v in vs:
            x = np.asarray(v, dtype=np.float64)
            amax = float(np.abs(x).max()) if x.size else 0.0
            if amax == 0.0:
                codes.append([0] * len(x))
                scales.append(0.0)
            else:
                q = np.clip(np.rint(x * (127.0 / amax)), -127, 127)
                codes.append([int(c) for c in q])
                scales.append(amax / 127.0)
        return pd.DataFrame({"codes": codes, "scale": scales})

    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return enc(c)


def sq8_topk(codes_df: DataFrame, probe: list[float], k: int = 10,
             sq_col: str = "sq", id_col: str = "vec_id",
             order_decimals: int | None = None) -> DataFrame:
    """Approximate cosine top-k over int8-quantized vectors: the probe
    stays exact float64; each database vector reconstructs as
    codes·scale. One Arrow kernel computes the int8·float dot as a
    single matmul per batch (the int8 matrix upcasts once, not per
    row); ranking is TakeOrdered. Same structural-tie guard as PQ:
    pass ``order_decimals`` when the ranking feeds an oracle compare.
    """
    p = np.asarray(probe, dtype=np.float64)
    pn = float(np.linalg.norm(p)) or 1.0

    @F.pandas_udf("double")
    def score(codes: pd.Series, scale: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype=float)
        C = np.asarray([np.asarray(c, dtype=np.float64) for c in codes])
        s = scale.to_numpy(dtype=np.float64)
        dots = (C @ p) * s
        norms = np.linalg.norm(C, axis=1) * s
        norms[norms == 0] = 1.0
        return pd.Series(dots / (norms * pn))

    scored = codes_df.select(
        id_col,
        score(F.col(f"{sq_col}.codes"), F.col(f"{sq_col}.scale"))
        .alias("cosine"),
    )
    key = (F.round(F.col("cosine"), order_decimals)
           if order_decimals is not None else F.col("cosine"))
    return scored.orderBy(F.desc(key), F.asc(id_col)).limit(k)


def random_projection(vec_col, out_dim: int, in_dim: int,
                      seed: int = 11) -> Column:
    """Johnson–Lindenstrauss random projection: vector → `out_dim`
    floats via a seeded Gaussian matrix, preserving pairwise distances
    within (1±ε) w.h.p. — the cheap dimensionality cut applied BEFORE
    expensive similarity passes (LSH bucketing, PQ training, brute
    cosine) when embeddings are wider than the task needs.

    The (in_dim, out_dim) matrix is generated deterministically from
    the seed on each executor (no broadcast needed — ~64×32 floats) and
    applied as one Arrow matmul per batch; a narrow map, no shuffle.
    """
    @F.pandas_udf("array<double>")
    def proj(vs: pd.Series) -> pd.Series:
        rng = np.random.default_rng(seed)
        R = rng.standard_normal((in_dim, out_dim)) / np.sqrt(out_dim)
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if len(X) == 0:
            return pd.Series([], dtype=object)
        Y = X @ R
        return pd.Series([list(map(float, r)) for r in Y])

    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return proj(c)


# Live corpus broadcasts created by knn_join, oldest first.  Spark only
# reclaims a broadcast when its Python handle is GC'd AND the driver
# runs the cleaner, so a long session issuing many knn joins would pin
# one normalized float64 corpus per call on every executor.  Callers
# (and the registry queries) release them via release_knn_broadcasts()
# once the consuming action has run.
_KNN_BROADCASTS: list = []


def release_knn_broadcasts() -> int:
    """Unpersist every corpus broadcast created by ``knn_join`` so far.

    Safe to call between actions; any knn_join DataFrame not yet
    executed must be re-created afterwards. Returns the number of
    broadcasts released.
    """
    n = 0
    while _KNN_BROADCASTS:
        bc = _KNN_BROADCASTS.pop()
        try:
            bc.unpersist(blocking=False)
            n += 1
        except Exception:
            pass  # session already stopped; nothing to reclaim
    return n


def knn_join(queries: DataFrame, corpus: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_self: bool = False) -> DataFrame:
    """Exact k-NN JOIN: every query row gets its top-k corpus neighbors
    by cosine — the batched many-queries complement of the single-probe
    APIs above (a retrieval pipeline ranks a stream of queries, not one).

    Distribution strategy is the broadcast-hash-join analogue for
    vectors: the corpus (the dimension side — embeddings for a corpus
    that fits executor memory, same contract as any broadcast join)
    ships once per executor as a normalized float64 matrix; queries
    stream through ``mapInPandas`` and each Arrow batch does ONE BLAS
    matmul (b×d @ d×n) plus an argpartition top-k — no pair explosion,
    no shuffle, wall-clock linear in |queries| with n/executors
    parallelism. Past broadcast size, compose the hyperplane-bucket path
    instead (``hyperplane_bucket`` both sides + this kernel per bucket —
    the `bucket_pair_cosines` shape).

    Ranking is by unrounded cosine with an id tiebreak (the registry
    convention); rank is emitted 1..k per query. Ties beyond the
    argpartition pad (16) would need exactly-equal cosines from >16
    duplicate vectors — out of scope by corpus contract.

    NOTE: building the broadcast index runs a Spark job HERE, at
    DataFrame-construction time (the same eager seam as the probe
    collect in the ann_* queries) — callers composing lazy plans should
    construct this last. The corpus lands via Arrow (toPandas — no
    Python Row objects) and is normalized in place, so the driver holds
    one float64 copy, the broadcast-side contract.
    """
    cdf = corpus.select(id_col, vec_col).toPandas()
    ids = cdf[id_col].to_numpy(dtype=np.int64)
    matn = np.array(cdf[vec_col].tolist(), dtype=np.float64)
    del cdf
    if matn.ndim != 2 or matn.shape[0] == 0:
        # empty corpus: no neighbors for anyone, keep the output schema
        empty = queries.sparkSession.createDataFrame(
            [], "query_id long, rank long, neighbor_id long, cosine double"
        )
        return empty
    norms = np.linalg.norm(matn, axis=1)
    norms[norms == 0] = 1.0
    matn /= norms[:, None]
    bc = queries.sparkSession.sparkContext.broadcast((ids, matn))
    _KNN_BROADCASTS.append(bc)
    pad = 16

    def gen(batches):
        c_ids, c_mat = bc.value
        n = len(c_ids)
        m = min(k + (1 if exclude_self else 0) + pad, n)
        for pdf in batches:
            if pdf.empty:
                continue
            Q = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            qn = np.linalg.norm(Q, axis=1)
            qn[qn == 0] = 1.0
            sims = (Q / qn[:, None]) @ c_mat.T
            qids = pdf[id_col].to_numpy()
            part = np.argpartition(-sims, m - 1, axis=1)[:, :m]
            out_q, out_r, out_n, out_c = [], [], [], []
            for i, qid in enumerate(qids):
                cand = part[i]
                sl = sims[i, cand]
                order = np.lexsort((c_ids[cand], -sl))  # cos desc, id asc
                rank = 0
                for j in order:
                    nid = int(c_ids[cand[j]])
                    if exclude_self and nid == qid:
                        continue
                    rank += 1
                    if rank > k:
                        break
                    out_q.append(int(qid)); out_r.append(rank)
                    out_n.append(nid); out_c.append(float(sl[j]))
            yield pd.DataFrame({"query_id": pd.Series(out_q, dtype="int64"),
                                "rank": pd.Series(out_r, dtype="int64"),
                                "neighbor_id": pd.Series(out_n, dtype="int64"),
                                "cosine": pd.Series(out_c, dtype="float64")})

    return queries.select(id_col, vec_col).mapInPandas(
        gen, "query_id long, rank long, neighbor_id long, cosine double"
    )


def lsh_knn_join(queries: DataFrame, corpus: DataFrame, k: int = 5,
                 planes: list[list[int]] | None = None,
                 multiprobe_bits: int = 1,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 exclude_self: bool = False) -> DataFrame:
    """k-NN join past broadcast size: the LSH-bucketed scale path for
    ``knn_join``. Both sides hyperplane-bucket scan-side; query rows
    multiprobe (expand to every bucket within ``multiprobe_bits``
    Hamming distance — the ann_lsh_multiprobe recall lever); one equi-
    join on bucket id; the per-bucket cogroup runs the same blocked
    matmul kernel; a final per-query window merges bucket-local top-ks.

    Approximate by construction (recall < 1 when a true neighbor shares
    no probed bucket — more planes bound bucket size, more probe bits
    recover recall; any radius up to the plane count is honored, radius
    = n_planes probes every bucket = exact). Returned cosines are exact;
    per-bucket candidate selection carries the same 16-tie pad and
    (cos desc, id asc) ordering as ``knn_join`` so duplicate-vector ties
    resolve deterministically before the merge window.

    Shuffle budget (plan-pinned in tests): 4 exchanges — the cogroup
    shuffles both sides on bucket, the multiprobe-overlap dedup
    re-keys on (query, neighbor), and the top-k window re-keys on
    query. Only (id, bucket, vector) rows and bucket-local top-ks ever
    move — never candidate pairs. Mega-bucket skew behaves exactly like
    bucket_pair_cosines: plane count is the lever.

    When ``planes`` is omitted, the vector dimension is read from one
    corpus row (a tiny eager job, same seam as knn_join's index build)
    instead of assuming a magic default.
    """
    from itertools import combinations

    if planes is None:
        first = corpus.select(vec_col).first()
        if first is None:
            return queries.sparkSession.createDataFrame(
                [], "query_id long, rank long, neighbor_id long, cosine double"
            )
        planes = hyperplanes(num_planes=4, dim=len(first[0]))
    n_bits = len(planes)
    base = hyperplane_bucket(vec_col, planes)

    probe_masks = [0]
    for r in range(1, min(multiprobe_bits, n_bits) + 1):
        probe_masks += [
            sum(1 << b for b in bits) for bits in combinations(range(n_bits), r)
        ]
    q = (
        queries.select(
            F.col(id_col).alias("_qid"),
            F.col(vec_col).alias("_qvec"),
            base.alias("_b0"),
        )
        .withColumn(
            "_bucket",
            F.explode(
                F.array(*[
                    F.col("_b0").bitwiseXOR(F.lit(m)) for m in probe_masks
                ])
            ),
        )
        .drop("_b0")
    )
    c = corpus.select(
        F.col(id_col).alias("_cid"),
        F.col(vec_col).alias("_cvec"),
        base.alias("_bucket"),
    )

    def topk_per_bucket(key, qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if qpdf.empty or cpdf.empty:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cosine": []}
            ).astype({"query_id": "int64", "neighbor_id": "int64",
                      "cosine": "float64"})
        Q = np.asarray(qpdf["_qvec"].tolist(), dtype=np.float64)
        C = np.asarray(cpdf["_cvec"].tolist(), dtype=np.float64)
        qn = np.linalg.norm(Q, axis=1); qn[qn == 0] = 1.0
        cn = np.linalg.norm(C, axis=1); cn[cn == 0] = 1.0
        sims = (Q / qn[:, None]) @ (C / cn[:, None]).T
        c_ids = cpdf["_cid"].to_numpy()
        m = min(k + (1 if exclude_self else 0) + 16, sims.shape[1])  # tie pad
        part = np.argpartition(-sims, m - 1, axis=1)[:, :m] if m < sims.shape[1] \
            else np.tile(np.arange(sims.shape[1]), (len(Q), 1))
        out_q, out_n, out_c = [], [], []
        for i, qid in enumerate(qpdf["_qid"].to_numpy()):
            cand = part[i]
            sl = sims[i, cand]
            order = np.lexsort((c_ids[cand], -sl))  # cos desc, id asc
            kept = 0
            for j in order:
                nid = int(c_ids[cand[j]])
                if exclude_self and nid == qid:
                    continue
                kept += 1
                if kept > k:
                    break
                out_q.append(int(qid)); out_n.append(nid)
                out_c.append(float(sl[j]))
        return pd.DataFrame({"query_id": pd.Series(out_q, dtype="int64"),
                             "neighbor_id": pd.Series(out_n, dtype="int64"),
                             "cosine": pd.Series(out_c, dtype="float64")})

    from pyspark.sql.window import Window

    local = (
        q.groupBy("_bucket")
        .cogroup(c.groupBy("_bucket"))
        .applyInPandas(topk_per_bucket,
                       "query_id long, neighbor_id long, cosine double")
        .dropDuplicates(["query_id", "neighbor_id"])  # multiprobe overlap
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        local.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k)
        .select("query_id", F.col("_r").alias("rank"), "neighbor_id", "cosine")
    )
