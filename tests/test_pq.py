"""Product quantization: compression, determinism, ADC recall vs exact
L2, and the no-shuffle scoring plan."""

import numpy as np
from pyspark.sql import functions as F

from tracker_trainer_spark.functions.similarity import (
    pq_adc_topk,
    pq_encode,
    train_pq_codebooks,
)


def _embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _exact_topk_ids(spark, sf_dir, probe, k):
    emb = _embeddings(spark, sf_dir)
    p = F.array(*[F.lit(float(x)) for x in probe])
    dist = F.aggregate(
        F.zip_with("embedding", p, lambda a, b: (a.cast("double") - b) ** 2),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rows = (
        emb.select("vec_id", dist.alias("d"))
        .orderBy(F.asc("d"), F.asc("vec_id")).limit(k).collect()
    )
    return [r.vec_id for r in rows]


def test_pq_shapes_and_compression(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    books = train_pq_codebooks(emb, m=8, k=16, seed=11)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8
    codes = emb.select("vec_id", pq_encode("embedding", books).alias("pq_code"))
    row = codes.first()
    assert len(row.pq_code) == 8                      # 64 floats -> 8 ints
    assert all(0 <= c < 16 for c in row.pq_code)
    # deterministic re-encode
    again = codes.first()
    assert row.pq_code == again.pq_code


def test_pq_adc_recall_vs_exact(spark, sf_dir):
    """Mean recall@10 over 5 probes. Synthetic near-random embeddings
    are PQ's worst case (no subspace structure to exploit); measured
    0.64 at both sf0.001 and sf0.01 with m=16, k=64 and the pinned
    seed — >= 0.45 proves ADC ranks by true proximity, not noise."""
    emb = _embeddings(spark, sf_dir).cache()
    books = train_pq_codebooks(emb, m=16, k=64, seed=11)
    codes = emb.select(
        "vec_id", pq_encode("embedding", books).alias("pq_code")
    ).cache()
    recalls = []
    for pid in range(5):
        probe = [float(x) for x in
                 emb.where(F.col("vec_id") == pid).first().embedding]
        got = {r.vec_id
               for r in pq_adc_topk(codes, probe, books, k=10).collect()}
        want = set(_exact_topk_ids(spark, sf_dir, probe, 10))
        recalls.append(len(got & want) / 10)
    emb.unpersist()
    codes.unpersist()
    assert sum(recalls) / len(recalls) >= 0.45, recalls


def test_pq_adc_scores_codes_without_shuffle(spark, sf_dir):
    from tracker_trainer_spark.plans import count_shuffles, physical_plan

    emb = _embeddings(spark, sf_dir)
    books = train_pq_codebooks(emb, m=8, k=16, seed=11)
    codes = emb.select("vec_id", pq_encode("embedding", books).alias("pq_code"))
    probe = [0.0] * 64
    df = pq_adc_topk(codes, probe, books, k=5)
    assert count_shuffles(df) == 0
    assert "TakeOrderedAndProject" in physical_plan(df)


def test_ivf_pq_composition_recall_and_prune(spark, sf_dir):
    """IVF cell prune + in-cell ADC: at nprobe=n_cells it equals plain
    ADC (no candidates lost); at nprobe=1 it scans one cell and still
    finds the probe itself."""
    from tracker_trainer_spark.functions.similarity import (
        ivf_assign,
        ivf_pq_topk,
        train_ivf_centroids,
    )

    emb = _embeddings(spark, sf_dir).cache()
    cents = train_ivf_centroids(emb, k=4, seed=11)
    books = train_pq_codebooks(emb, m=16, k=64, seed=11)
    codes = emb.select(
        "vec_id",
        ivf_assign("embedding", cents).alias("cell"),
        pq_encode("embedding", books).alias("pq_code"),
    ).cache()
    probe = [float(x) for x in emb.where(F.col("vec_id") == 0).first().embedding]

    full = [r.vec_id for r in pq_adc_topk(codes, probe, books, k=10).collect()]
    allcells = [r.vec_id for r in
                ivf_pq_topk(codes, probe, cents, books, k=10, nprobe=4).collect()]
    assert full == allcells                      # nprobe=all == plain ADC

    one = {r.vec_id for r in
           ivf_pq_topk(codes, probe, cents, books, k=10, nprobe=1).collect()}
    assert 0 in one and len(one) <= 10
    emb.unpersist()
    codes.unpersist()


def test_lloyd_pq_codebooks_deterministic_and_quantized(spark, sf_dir):
    """The oracle-checkable PQ trainer: identical books across runs (no
    RNG anywhere), every mean quantized to 6 decimals, dense m×k shape,
    and a loud error on a non-divisible subspace split."""
    import pytest

    from tracker_trainer_spark.functions.similarity import lloyd_pq_codebooks

    emb = _embeddings(spark, sf_dir)
    b1 = lloyd_pq_codebooks(emb, m=4, k=4, iters=2)
    b2 = lloyd_pq_codebooks(emb, m=4, k=4, iters=2)
    assert b1 == b2
    assert len(b1) == 4 and all(len(book) == 4 for book in b1)
    assert all(len(c) == 16 for book in b1 for c in book)
    for book in b1:
        for c in book:
            for v in c:
                assert v == round(v, 6)
    with pytest.raises(ValueError, match="not divisible"):
        lloyd_pq_codebooks(emb, m=5, k=4)


def test_registry_pq_plan_scores_codes_only(spark, sf_dir):
    """The ann_pq_topk registry plan after training: encode (one Arrow
    kernel) -> ADC project -> TakeOrdered. No exchange anywhere — the
    raw vectors never shuffle and never reach the ranking."""
    from tracker_trainer_spark.plans import count_shuffles, physical_plan
    from tracker_trainer_spark.queries import QUERIES

    df = QUERIES["ann_pq_topk"](spark, sf_dir)
    assert count_shuffles(df) == 0
    assert "TakeOrderedAndProject" in physical_plan(df)


def test_fused_training_equals_unfused(spark, sf_dir):
    """The fused one-job-per-round trainer (registry ann_ivfpq_topk)
    must produce EXACTLY the structures of lloyd_centroids +
    lloyd_pq_codebooks (build_ivfpq_index's path) — the 6-decimal mean
    quantization makes the two execution shapes equal by construction,
    and this pin stops the three Lloyd spellings drifting apart."""
    from tracker_trainer_spark.functions.similarity import (
        lloyd_centroids, lloyd_pq_codebooks,
    )
    from tracker_trainer_spark.queries_ml_ext import (
        PQ_ITERS, PQ_K, PQ_M, _emb_double, _fused_ivfpq_training,
    )

    emb = _embeddings(spark, sf_dir)
    cents_f, books_f, probe = _fused_ivfpq_training(
        _emb_double(emb), n_cells=8, m=PQ_M, k=PQ_K, iters=PQ_ITERS,
        probe_id=0)
    assert cents_f == lloyd_centroids(emb, k=8, iters=2, dim=64)
    assert books_f == lloyd_pq_codebooks(
        emb, m=PQ_M, k=PQ_K, iters=PQ_ITERS, dim=64)
    # the piggybacked probe must be the EXACT (unquantized) vector
    want_probe = [float(x) for x in emb.where("vec_id = 0")
                  .select("embedding").first()[0]]
    assert probe == want_probe


def test_ivfpq_index_build_probe_and_prune(spark, sf_dir, tmp_path):
    """Persisted IVF-PQ: nprobe=all equals plain ADC over the same
    trained structures; nprobe=1 reads ONE cell partition (pruned scan,
    visible in the plan) and still finds the probe itself."""
    from tracker_trainer_spark.functions.similarity import (
        build_ivfpq_index,
        ivfpq_index_topk,
        lloyd_centroids,
        lloyd_pq_codebooks,
        pq_encode,
    )
    from tracker_trainer_spark.plans import physical_plan

    emb = _embeddings(spark, sf_dir)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, path, n_cells=4, m=4, k=4, dim=64)
    probe = [float(x) for x in emb.where(F.col("vec_id") == 0).first().embedding]

    # nprobe=all == plain ADC over identically re-trained structures
    books = lloyd_pq_codebooks(emb, m=4, k=4, iters=2, dim=64)
    cents = lloyd_centroids(emb, k=4, iters=2, dim=64)
    assert len(cents) == 4
    codes = emb.select("vec_id", pq_encode("embedding", books).alias("pq_code"))
    want = [r.vec_id for r in
            pq_adc_topk(codes, probe, books, k=10, order_decimals=4).collect()]
    got = [r.vec_id for r in
           ivfpq_index_topk(spark, path, probe, k=10, nprobe=4,
                            order_decimals=4).collect()]
    assert got == want

    one = ivfpq_index_topk(spark, path, probe, k=10, nprobe=1)
    ids = {r.vec_id for r in one.collect()}
    assert 0 in ids and len(ids) <= 10
    # partition pruning: the scan must carry a PartitionFilters entry
    # pinning cell to the single probed value (the plan renders pruning
    # as PartitionFilters, not as cell= directory paths), and the cell
    # column must be pruned away before the Python scoring kernel
    import re

    plan = physical_plan(one)
    assert re.search(r"PartitionFilters: \[[^\]]*\(cell#\d+ = \d+\)", plan), plan
    assert "ReadSchema: struct<vec_id:bigint,pq_code:array<int>>" in plan


def test_sq8_compression_and_recall(spark, sf_dir):
    """Scalar int8 quantization: codes bounded to [-127, 127], scale
    reconstructs within quantization error (≤ scale/2 per dim), and
    SQ8 cosine top-10 overlaps exact cosine top-10 heavily — int8 loses
    far less resolution than PQ, so recall should be near-perfect."""
    import numpy as np

    from tracker_trainer_spark.functions.similarity import (
        brute_force_topk, sq8_encode, sq8_topk,
    )

    emb = _embeddings(spark, sf_dir).cache()
    codes = emb.select("vec_id", sq8_encode("embedding").alias("sq")).cache()
    row = codes.first()
    assert all(-127 <= c <= 127 for c in row.sq.codes)
    orig = np.asarray(emb.where(F.col("vec_id") == row.vec_id)
                      .first().embedding, dtype=np.float64)
    rec = np.asarray(row.sq.codes, dtype=np.float64) * row.sq.scale
    assert np.abs(rec - orig).max() <= row.sq.scale / 2 + 1e-12

    recalls = []
    for pid in range(3):
        probe = [float(x) for x in
                 emb.where(F.col("vec_id") == pid).first().embedding]
        got = {r.vec_id for r in sq8_topk(codes, probe, k=10).collect()}
        want = {r.vec_id for r in brute_force_topk(emb, probe, k=10).collect()}
        recalls.append(len(got & want) / 10)
    emb.unpersist()
    codes.unpersist()
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_sq8_scoring_is_shuffle_free(spark, sf_dir):
    from tracker_trainer_spark.functions.similarity import sq8_encode, sq8_topk
    from tracker_trainer_spark.plans import count_shuffles, physical_plan

    emb = _embeddings(spark, sf_dir)
    codes = emb.select("vec_id", sq8_encode("embedding").alias("sq"))
    df = sq8_topk(codes, [0.5] * 64, k=5)
    assert count_shuffles(df) == 0
    assert "TakeOrderedAndProject" in physical_plan(df)


def test_random_projection_preserves_distances(spark, sf_dir):
    """JL: 64 -> 32 dims must keep pairwise L2 distances within a
    modest relative error on average (seeded, deterministic)."""
    import itertools

    from tracker_trainer_spark.functions.similarity import random_projection

    emb = _embeddings(spark, sf_dir).where(F.col("vec_id") < 20)
    rows = emb.select(
        "vec_id",
        F.col("embedding").alias("x"),
        random_projection("embedding", out_dim=32, in_dim=64).alias("y"),
    ).collect()
    X = {r.vec_id: np.asarray(r.x, dtype=float) for r in rows}
    Y = {r.vec_id: np.asarray(r.y, dtype=float) for r in rows}
    errs = []
    for a, b in itertools.combinations(sorted(X), 2):
        dx = np.linalg.norm(X[a] - X[b])
        dy = np.linalg.norm(Y[a] - Y[b])
        errs.append(abs(dy - dx) / dx)
    mean_err = float(np.mean(errs))
    assert mean_err < 0.25, mean_err          # measured ~0.1 at dim 32
    assert max(errs) < 0.8                     # no catastrophic collapse


def test_lloyd_probe_piggyback_matches_separate_fetch(spark, sf_dir):
    """The probe_id piggyback in BOTH shared Lloyd trainers must return
    (a) the EXACT probe vector (unquantized — avg of one row) and
    (b) bit-identical trained structures to the probe-free spelling —
    the contract that lets ann_ivf_topk / ann_pq_topk drop their
    separate probe action without touching their oracles."""
    from tracker_trainer_spark.functions.similarity import (
        lloyd_centroids,
        lloyd_pq_codebooks,
    )

    emb = _embeddings(spark, sf_dir)
    want_probe = [float(x) for x in emb.where("vec_id = 0")
                  .select("embedding").first()[0]]

    cents_p, probe_c = lloyd_centroids(emb, k=8, iters=2, probe_id=0)
    assert probe_c == want_probe
    assert cents_p == lloyd_centroids(emb, k=8, iters=2, dim=64)

    books_p, probe_b = lloyd_pq_codebooks(emb, m=4, k=4, iters=2, probe_id=0)
    assert probe_b == want_probe
    assert books_p == lloyd_pq_codebooks(emb, m=4, k=4, iters=2, dim=64)


def test_lloyd_probe_piggyback_missing_probe_raises(spark, sf_dir):
    import pytest as _pytest

    from tracker_trainer_spark.functions.similarity import lloyd_centroids

    emb = _embeddings(spark, sf_dir)
    with _pytest.raises(ValueError, match="probe"):
        lloyd_centroids(emb, k=8, iters=1, probe_id=-12345)
