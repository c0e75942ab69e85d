"""Streaming inference: scored stream == batch scores; ranking stream
emits one winner per decision identical to batch rank_items."""

import json

from pyspark.sql import functions as F

from tracker_trainer_spark.streaming.score_stream import (
    score_stream,
    start_ranking_stream,
)
from tracker_trainer_spark.trainer.scoring import rank_items, score_items
from tracker_trainer_spark.trainer.train import train_two_phase


def _candidates(spark, n_decisions=5, n_items=4):
    rows = [
        (f"d{d}", json.dumps({"x": i, "s": f"v{i}"}), json.dumps({"c": d}))
        for d in range(n_decisions)
        for i in range(n_items)
    ]
    return spark.createDataFrame(rows, "decision_id string, item string, context string")


def test_score_stream_matches_batch(spark, timeline, tmp_path):
    _, dec = train_two_phase(spark, timeline, model_seed=1, model="m1",
                             max_features=20, explore=False)
    cand = _candidates(spark)
    src = str(tmp_path / "cand")
    cand.write.parquet(src)

    stream = spark.readStream.schema(cand.schema).parquet(src)
    q = (
        score_stream(dec, stream, now_ts=1.0)
        .writeStream.format("memory").queryName("scored_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r.decision_id, r.item): round(r.score, 9)
        for r in spark.table("scored_stream").collect()
    }
    want = {
        (r.decision_id, r.item): round(r.score, 9)
        for r in score_items(dec, cand, now_ts=1.0).collect()
    }
    assert got == want and len(got) == 20


def test_ranking_stream_one_winner_per_decision(spark, timeline, tmp_path):
    _, dec = train_two_phase(spark, timeline, model_seed=1, model="m1",
                             max_features=20, explore=False)
    cand = _candidates(spark)
    src, sink, ckpt = (str(tmp_path / p) for p in ("c2", "winners", "ckpt"))
    cand.write.parquet(src)

    stream = spark.readStream.schema(cand.schema).parquet(src)
    q = start_ranking_stream(dec, stream, sink, ckpt, now_ts=1.0)
    q.awaitTermination(120)

    got = {
        r.decision_id: r.item for r in spark.read.parquet(sink).collect()
    }
    want = {
        r.decision_id: r.item
        for r in rank_items(dec, cand, "decision_id", now_ts=1.0).collect()
    }
    assert got == want and len(got) == 5
