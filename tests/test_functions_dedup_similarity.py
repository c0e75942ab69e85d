"""Unit tests for the dedup / similarity function library (the pieces not
already oracle-checked through the query registry)."""

import math

import pytest
from pyspark.sql import functions as F

from tracker_trainer_spark.functions import (
    brute_force_topk,
    connected_components,
    exact_dedup,
    jaccard,
    near_dup_candidates,
)
from tracker_trainer_spark.functions.similarity import ann_lsh_topk, hyperplanes


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),   # near dup of 0
        (3, "completely different text about spark engines"),
        (4, "tiny"),                                          # < 3 tokens: no shingles
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_keeps_min_id(docs):
    kept = sorted(r.doc_id for r in exact_dedup(docs).collect())
    assert kept == [0, 2, 3, 4]


def test_exact_dedup_idempotent(docs):
    once = exact_dedup(docs)
    twice = exact_dedup(once)
    assert sorted(r.doc_id for r in once.collect()) == sorted(
        r.doc_id for r in twice.collect()
    )


def test_near_dup_candidates_finds_exact_dup_excludes_short(docs):
    pairs = {(r.doc_id_a, r.doc_id_b) for r in near_dup_candidates(docs).collect()}
    assert (0, 1) in pairs  # identical docs always collide in every band
    assert not any(4 in p for p in pairs)  # shingle-less doc never pairs


def test_jaccard_column(spark):
    df = spark.createDataFrame([([1, 2, 3], [2, 3, 4])], ["a", "b"])
    (val,) = df.select(jaccard("a", "b")).first()
    assert val == pytest.approx(2 / 4)
    (empty,) = spark.createDataFrame([([], [])], "a array<int>, b array<int>") \
        .select(jaccard("a", "b")).first()
    assert empty == 0.0


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
        (4, [0.7, 0.7, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_topk_exact(vectors):
    got = brute_force_topk(vectors, [1.0, 0.0, 0.0, 0.0], k=3).collect()
    assert [r.vec_id for r in got] == [0, 1, 4]
    assert got[0].cosine == pytest.approx(1.0)
    assert got[1].cosine == pytest.approx(0.9 / math.hypot(0.9, 0.1))


def test_ann_lsh_contains_probe_and_orders_by_cosine(vectors):
    planes = hyperplanes(num_planes=2, dim=4, seed=3)
    got = ann_lsh_topk(vectors, [1.0, 0.0, 0.0, 0.0], planes, k=5).collect()
    ids = [r.vec_id for r in got]
    assert ids[0] == 0  # the probe itself is in its own bucket, cosine 1.0
    cosines = [r.cosine for r in got]
    assert cosines == sorted(cosines, reverse=True)
    # approximate ⊆ exact: every returned id must appear in brute-force top-5
    exact_ids = {r.vec_id for r in brute_force_topk(
        vectors, [1.0, 0.0, 0.0, 0.0], k=5).collect()}
    assert set(ids) <= exact_ids


def test_minhash_similarity_monotone(spark):
    """Higher true Jaccard → (weakly) more matching signature slots."""
    base = "w%d " * 50
    a = (base % tuple(range(50))).strip()
    near = (base % tuple(list(range(45)) + [99, 98, 97, 96, 95])).strip()
    far = ("x%d " * 50 % tuple(range(50))).strip()
    df = spark.createDataFrame(
        [(0, a), (1, near), (2, far)], ["doc_id", "text"]
    )
    from tracker_trainer_spark.functions.dedup import (
        minhash_params, minhash_signature, shingle_hashes,
    )
    sigs = {
        r.doc_id: r.sig
        for r in df.select(
            "doc_id",
            minhash_signature(
                shingle_hashes(F.col("text")), minhash_params(24, 7)
            ).alias("sig"),
        ).collect()
    }
    agree_near = sum(x == y for x, y in zip(sigs[0], sigs[1]))
    agree_far = sum(x == y for x, y in zip(sigs[0], sigs[2]))
    assert agree_near > agree_far


def test_ivf_kmeans_centroids_and_recall(spark):
    """KMeans-trained IVF: assignments cover all cells reasonably and
    nprobe=1 search returns the probe's true neighborhood."""
    import numpy as np
    from tracker_trainer_spark.functions.similarity import (
        ann_ivf_topk, ivf_assign, train_ivf_centroids,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(5)
    # 4 well-separated gaussian clusters in 8-d
    centers = rng.normal(0, 10, (4, 8))
    rows = []
    for i in range(200):
        c = i % 4
        rows.append((i, (centers[c] + rng.normal(0, 0.5, 8)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = train_ivf_centroids(df, k=4, seed=11)
    assert len(cents) == 4 and all(len(c) == 8 for c in cents)

    assigned = df.select("vec_id", ivf_assign("embedding", cents).alias("cell"))
    sizes = {r.cell: r["count"] for r in assigned.groupBy("cell").count().collect()}
    assert len(sizes) == 4  # every cell used
    assert all(v == 50 for v in sizes.values())  # separated clusters → exact split

    probe = rows[0][1]
    got = ann_ivf_topk(df, probe, cents, k=10).collect()
    assert [r.vec_id for r in got][0] == 0  # probe finds itself
    # all results come from the probe's own cluster (ids ≡ 0 mod 4)
    assert all(r.vec_id % 4 == 0 for r in got)


def test_lloyd_centroids_deterministic_and_clustering(spark):
    """The oracle-checkable trained quantizer: identical across runs (no
    RNG anywhere) and, on separated clusters, recovers the true
    structure from the mod-k init within its 2 refinement rounds."""
    import numpy as np
    from tracker_trainer_spark.functions.similarity import (
        ivf_assign, lloyd_centroids,
    )

    rng = np.random.default_rng(7)
    centers = rng.normal(0, 10, (4, 8))
    rows = [(i, (centers[i % 4] + rng.normal(0, 0.5, 8)).tolist())
            for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    c_a = lloyd_centroids(df, k=4, iters=2)
    c_b = lloyd_centroids(df, k=4, iters=2)
    assert c_a == c_b  # bitwise-deterministic

    # mod-4 init == true cluster labels here, so round-1 means are the
    # true centers and the assignment is the exact 4-way split
    assigned = df.select("vec_id", ivf_assign("embedding", c_a).alias("cell"))
    sizes = sorted(r["count"] for r in assigned.groupBy("cell").count().collect())
    assert sizes == [50, 50, 50, 50]
    got = np.asarray(c_a)
    for true_c in centers:
        assert np.linalg.norm(got - true_c, axis=1).min() < 0.5


def test_ivf_index_build_probe(spark, tmp_path):
    """Persistent IVF: nprobe=k is exactly brute force; nprobe=1 reads
    only the probe's inverted list (partition-pruned scan)."""
    from tracker_trainer_spark.functions.similarity import (
        brute_force_topk,
        build_ivf_index,
        ivf_index_topk,
        load_ivf_centroids,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probe_row = df.orderBy("vec_id").first()
    probe = [float(x) for x in probe_row["embedding"]]

    path = str(tmp_path / "ivf")
    k_cells = 4
    centroids = build_ivf_index(df, path, k=k_cells, seed=11)
    assert len(load_ivf_centroids(path)) == k_cells

    exact = [r["vec_id"] for r in brute_force_topk(df, probe, 5).collect()]
    full = [r["vec_id"] for r in
            ivf_index_topk(spark, path, probe, k=5, nprobe=k_cells).collect()]
    assert full == exact  # nprobe=k degenerates to exact search

    pruned = ivf_index_topk(spark, path, probe, k=5, nprobe=1)
    got = [r["vec_id"] for r in pruned.collect()]
    assert got and got[0] == probe_row["vec_id"]  # self-match survives pruning
    assert set(got) <= set(
        r["vec_id"] for r in spark.read.parquet(f"{path}/lists").collect()
    )
    # the probe plan must prune at the partition level (PartitionFilters
    # on list_id), not post-scan filter the whole index
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*list_id[^\]]*)\]", plan)
    assert m, plan


# --------------------------------------------------------------------------
# connected components (large-star / small-star)
# --------------------------------------------------------------------------

def _union_find_labels(edges):
    """Oracle: plain union-find; label = min member of each component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {n for e in edges for n in e if e[0] != e[1]}
    return {n: find(n) for n in touched}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [
    (42, 300, 220),   # sparse: many components
    (7, 60, 200),     # dense: one near-complete component
    (13, 500, 120),   # very sparse: mostly singletons + pairs
])
def test_connected_components_matches_union_find(spark, seed, n_nodes, n_edges):
    import random

    rng = random.Random(seed)
    edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)]
    df = spark.createDataFrame(
        [e for e in edges if e[0] != e[1]], "doc_id_a long, doc_id_b long"
    )
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == _union_find_labels(edges)


def test_connected_components_chain_converges_in_log_rounds(spark):
    # a 400-node path has diameter 400: label propagation would need 400
    # rounds; star contraction must finish inside the 25-round cap
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(400)], "doc_id_a long, doc_id_b long"
    )
    got = {r["node"]: r["component"] for r in connected_components(chain).collect()}
    assert len(got) == 401 and set(got.values()) == {0}


def test_connected_components_empty_and_self_loops(spark):
    empty = spark.createDataFrame([], "doc_id_a long, doc_id_b long")
    assert connected_components(empty).count() == 0
    loops = spark.createDataFrame([(7, 7), (8, 8)], "doc_id_a long, doc_id_b long")
    assert connected_components(loops).count() == 0


def test_cc_fast_path_equals_distributed(spark):
    """The small-graph union-find and the star-contraction iteration
    must label identically — same random graph, threshold forced each
    way."""
    import numpy as np
    from tracker_trainer_spark.functions.dedup import connected_components

    rng = np.random.default_rng(9)
    edges = [(int(a), int(b)) for a, b in
             zip(rng.integers(0, 200, 300), rng.integers(0, 200, 300))]
    df = spark.createDataFrame(edges, "doc_id_a long, doc_id_b long")
    fast = {(r.node, r.component)
            for r in connected_components(df).collect()}
    dist = {(r.node, r.component)
            for r in connected_components(df, small_graph_threshold=0).collect()}
    assert fast == dist and len(fast) > 0


def test_knn_join_matches_per_probe_bruteforce(spark, sf_dir):
    """The batched kernel must agree with the single-probe exact path
    for each query row (same ranking convention: cos desc, id asc)."""
    from tracker_trainer_spark.functions import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    res = sim.knn_join(
        emb.where(F.col("vec_id") < 5), emb, k=4, exclude_self=True
    ).toPandas()
    for qid in range(5):
        probe = emb.where(F.col("vec_id") == qid).first()["embedding"]
        want = [
            r.vec_id
            for r in sim.brute_force_topk(emb, list(probe), k=5).collect()
            if r.vec_id != qid
        ][:4]
        got = list(
            res[res.query_id == qid].sort_values("rank").neighbor_id
        )
        assert got == want, (qid, got, want)


def test_knn_join_is_shuffle_free(spark, sf_dir):
    """Broadcast-corpus matmul: queries stream through mapInPandas with
    zero exchanges — the whole point vs the quadratic pair join."""
    from tracker_trainer_spark.functions import similarity as sim
    from tracker_trainer_spark.plans import count_shuffles

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = sim.knn_join(emb.where(F.col("vec_id") < 10), emb, k=3)
    assert count_shuffles(out) == 0
    assert out.count() == 30


def test_knn_join_broadcasts_are_tracked_and_releasable(spark, sf_dir):
    """Every knn_join registers its corpus broadcast; the release hook
    unpersists and drains the registry (session-lifetime memory bound),
    and a released-then-rebuilt join still answers correctly."""
    from tracker_trainer_spark.functions import similarity as sim

    sim.release_knn_broadcasts()  # drain anything left by other tests
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    sim.knn_join(q, emb, k=2).count()
    sim.knn_join(q, emb, k=2).count()
    assert len(sim._KNN_BROADCASTS) == 2
    assert sim.release_knn_broadcasts() == 2
    assert sim._KNN_BROADCASTS == []
    # a fresh join after release works (new broadcast, correct rows)
    assert sim.knn_join(q, emb, k=2).count() == 6
    assert sim.release_knn_broadcasts() == 1


def test_lsh_knn_join_recall_and_exactness(spark, sf_dir):
    """The bucketed scale path: every returned neighbor's cosine is
    EXACT (the kernel computes true cosines, only the candidate set is
    approximate), and multiprobe recall@3 vs the exact join clears the
    single-bucket floor."""
    from tracker_trainer_spark.functions import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 30)
    exact = sim.knn_join(q, emb, k=3, exclude_self=True).toPandas()

    recalls = {}
    for bits in (0, 1, 2):
        approx = sim.lsh_knn_join(
            q, emb, k=3, multiprobe_bits=bits, exclude_self=True
        ).toPandas()
        merged = approx.merge(
            exact, on=["query_id", "neighbor_id"], suffixes=("_l", "_e"),
            how="inner",
        )
        # candidate set is approximate; returned cosines are EXACT
        assert (abs(merged.cosine_l - merged.cosine_e) < 1e-9).all()
        assert approx.groupby("query_id")["rank"].min().eq(1).all()
        recalls[bits] = len(merged) / len(exact)

    # the probe radius is the recall lever: strictly monotone ladder
    # (measured 0.1 → 0.4 → 0.73 on this corpus) with a bits=2 floor
    assert recalls[0] < recalls[1] < recalls[2], recalls
    assert recalls[2] >= 0.6, recalls


def test_knn_join_empty_corpus_returns_empty(spark, sf_dir):
    from tracker_trainer_spark.functions import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = sim.knn_join(emb.limit(5), emb.where(F.lit(False)), k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "rank", "neighbor_id", "cosine"
    ]


def test_lsh_knn_join_full_radius_equals_exact(spark, sf_dir):
    """multiprobe radius = plane count probes every bucket, so the
    bucketed path must reproduce the exact join verbatim — the property
    that pins the probe-mask enumeration honors ANY radius (a silent
    cap at 2 would fail this with recall < 1)."""
    from tracker_trainer_spark.functions import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 20)
    exact = sim.knn_join(q, emb, k=3, exclude_self=True).toPandas()
    full = sim.lsh_knn_join(
        q, emb, k=3, multiprobe_bits=4, exclude_self=True
    ).toPandas()
    e = exact.sort_values(["query_id", "rank"]).reset_index(drop=True)
    f = full.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert list(e.query_id) == list(f.query_id)
    assert list(e.neighbor_id) == list(f.neighbor_id)


def test_lsh_knn_join_shuffle_budget(spark, sf_dir):
    """4 exchanges: cogroup shuffles both sides on bucket, the overlap
    dedup re-keys on (query, neighbor), the merge window on query."""
    from tracker_trainer_spark.functions import similarity as sim
    from tracker_trainer_spark.plans import count_shuffles

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = sim.lsh_knn_join(emb.where(F.col("vec_id") < 10), emb, k=3)
    assert count_shuffles(out) <= 4
