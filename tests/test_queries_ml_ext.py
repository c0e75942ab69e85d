"""Unit tests for the ML-extension query internals beyond the oracle
parity suite: the KMeans empty-cluster contract and the prefix-filter
recall bound."""

import math

from pyspark.sql import functions as F

from tracker_trainer_spark.queries_ml_ext import (
    _assign_expr,
    _mean_centroids,
    kmeans_embedding_clusters,
)


def test_mean_centroids_keeps_previous_on_empty_cluster(spark):
    """A cluster with no assigned members must keep its previous
    centroid — never become a phantom zero vector (which would attract
    origin-proximal points the oracle assigns elsewhere)."""
    df = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [3.0, 3.0])], "vec_id long, emb array<double>"
    ).withColumn("cid", F.lit(0))
    prev = {0: [0.0, 0.0], 1: [9.0, 9.0]}
    cents = _mean_centroids(df, prev=prev)
    assert cents[0] == [2.0, 2.0]      # recomputed from members
    assert cents[1] == [9.0, 9.0]      # kept: no members landed in 1
    assert set(cents) == {0, 1}


def test_mean_centroids_init_only_observed_clusters(spark):
    """At init (prev=None) only observed cluster ids exist — matching
    the oracle's GROUP BY, which cannot emit empty groups."""
    df = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, emb array<double>"
    ).withColumn("cid", F.lit(2))
    cents = _mean_centroids(df)
    assert set(cents) == {2}
    assert cents[2] == [1.0, 2.0]


def test_assign_expr_argmin_with_id_tiebreak(spark):
    """Equidistant point must take the LOWEST cluster id (lexicographic
    struct min), and the non-contiguous cid keys survive."""
    df = spark.createDataFrame(
        [(0, [0.0, 0.0])], "vec_id long, emb array<double>"
    )
    cents = {3: [1.0, 0.0], 7: [0.0, 1.0]}  # both dist = 1.0
    row = df.select(_assign_expr(cents).alias("a")).first()
    assert row["a"]["cid"] == 3
    assert math.isclose(row["a"]["dist"], 1.0)


def test_kmeans_empty_corpus_returns_empty(spark, tmp_path):
    """An empty embeddings table yields an empty result with the
    declared schema instead of a driver-side crash."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "embedding": pa.array([], type=pa.list_(pa.float32())),
        "label": pa.array([], type=pa.int32()),
    })
    d = tmp_path / "sfempty"
    d.mkdir()
    pq.write_table(tbl, d / "embeddings.parquet")
    out = kmeans_embedding_clusters(spark, str(d))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "cluster_id", "n_members", "inertia"
    ]


# --------------------------------------------------------------------------
# Prefix-filter exactness: differential fuzz vs brute force
# --------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

from tracker_trainer_spark.queries_ml_ext import prefix_filter_pairs  # noqa: E402

_doc_sets = st.lists(
    st.lists(st.integers(min_value=0, max_value=11), min_size=1, max_size=10)
    .map(lambda xs: sorted(set(xs))),
    min_size=2,
    max_size=12,
)


@settings(max_examples=15, deadline=None)
@given(_doc_sets)
def test_prefix_filter_pairs_exact_vs_brute_force(spark, docs):
    """Prefix filtering must be RECALL-EXACT: for random small token
    sets, the pipeline's qualifying pairs equal the brute-force
    all-pairs answer — the pigeonhole bound (prefix length
    n − ⌈t·n⌉ + 1) admits no false negatives, and verify removes all
    false positives."""
    t = 0.6
    expected = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = set(docs[i]), set(docs[j])
            jac = len(a & b) / len(a | b)
            if jac >= t:
                expected.add((i, j, round(jac, 6)))
    df = spark.createDataFrame(
        [(i, [int(x) for x in d]) for i, d in enumerate(docs)],
        "doc_id long, toks array<long>",
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"], round(r["jac"], 6))
        for r in prefix_filter_pairs(df, t).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


# --------------------------------------------------------------------------
# Streak state machine: differential fuzz vs a plain-Python islands walk
# --------------------------------------------------------------------------

import datetime as _dt  # noqa: E402

from tracker_trainer_spark.queries_ml_ext import streak_state_expr  # noqa: E402

_day_sets = st.lists(
    st.integers(min_value=0, max_value=40), min_size=1, max_size=25
).map(lambda xs: sorted(set(xs)))


@settings(max_examples=15, deadline=None)
@given(_day_sets)
def test_streak_expr_matches_python_islands(spark, offsets):
    """The HOF fold must agree with the obvious sequential walk for any
    sorted day set (including singletons and all-gaps)."""
    base = _dt.date(2024, 1, 1)
    days = [base + _dt.timedelta(days=o) for o in offsets]
    best = runs = cur = 0
    prev = None
    for d in days:
        cur = cur + 1 if prev is not None and (d - prev).days == 1 else 1
        runs += 0 if prev is not None and (d - prev).days == 1 else 1
        best = max(best, cur)
        prev = d
    df = spark.createDataFrame([(days,)], "days array<date>")
    row = df.select(streak_state_expr("days").alias("s")).first()["s"]
    assert (row["runs"], row["best"]) == (runs, best)


# --------------------------------------------------------------------------
# Basket pair generator: differential fuzz vs itertools.combinations
# --------------------------------------------------------------------------

from itertools import combinations  # noqa: E402

from tracker_trainer_spark.queries_ml_ext import basket_pairs_expr  # noqa: E402

_baskets = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=3),
    min_size=0,
    max_size=8,
).map(lambda xs: sorted(set(xs)))


@settings(max_examples=15, deadline=None)
@given(_baskets)
def test_basket_pairs_expr_matches_combinations(spark, basket):
    """The nested-transform pair HOF must produce exactly the i<j pair
    set (order-insensitive), including empty and singleton baskets."""
    df = spark.createDataFrame([(basket,)], "brands array<string>")
    rows = df.select(basket_pairs_expr("brands").alias("p")).first()["p"]
    got = {(r["brand_a"], r["brand_b"]) for r in rows}
    assert got == set(combinations(basket, 2))
    assert len(rows) == len(got)  # no duplicate pair structs


def test_editdist_blocking_precision_and_documented_recall(spark, sf_dir):
    """The blocked Levenshtein join's honesty check: blocking on the
    head noun makes every emitted pair correct (precision 1.0 vs the
    unblocked O(V²) join), and the RECALL trade-off — pairs whose names
    differ in the noun itself are never compared — is measured here
    against driver-side brute force over the (tiny, deduped) name
    vocabulary, so the blind spot is quantified, not hidden: measured
    recall on this catalog is ~0.62, and EVERY missed pair differs in
    the head noun itself ("blue bolt"/"blue rod" — different products
    whose names happen to be close, exactly what a variant-merging
    pass should NOT unify). A corpus whose true variants cross the
    blocking key needs a second key (e.g. first token) unioned in."""
    from tracker_trainer_spark.queries import QUERIES

    got = {(r.name_a, r.name_b, r.edit_dist)
           for r in QUERIES["part_name_editdist_pairs"](spark, sf_dir).collect()}

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    names = sorted({r.n.strip() for r in spark.read.parquet(
        f"{sf_dir}/part.parquet").select(F.col("p_name").alias("n"))
        .distinct().collect()})
    full = {(a, b, lev(a, b)) for i, a in enumerate(names)
            for b in names[i + 1:] if lev(a, b) <= 4}
    assert got <= full                      # precision 1.0
    missed = full - got
    # the blind spot is EXACTLY the blocking key: every missed pair
    # differs in its head noun; no same-noun pair is ever missed
    assert all(a.split()[-1] != b.split()[-1] for a, b, _ in missed), (
        sorted((a, b) for a, b, _ in missed
               if a.split()[-1] == b.split()[-1])[:5])
    recall = len(got) / len(full) if full else 1.0
    assert recall >= 0.5, (recall, sorted(missed)[:5])
