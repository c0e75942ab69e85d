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
