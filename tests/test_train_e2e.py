"""End-to-end: synthetic track records → ingest → timeline (conftest
fixture) → two-phase train (fallback backend when xgboost is absent) →
propensity scoring."""

from pyspark.sql import functions as F

from tracker_trainer_spark.trainer.train import train_two_phase, propensity_scores


def test_two_phase_train_and_score(spark, timeline):
    prop, dec = train_two_phase(
        spark, timeline, model_seed=1, model="m1", max_features=50, explore=False
    )
    assert prop.mean_item_count >= 1.0
    assert "t" in prop.feature_names and "t" in dec.feature_names
    assert any(f.startswith("item.") for f in prop.feature_names)
    assert any(f.startswith("context.") for f in prop.feature_names)
    # string features got tables only if they survived the count>20 prune
    for feat, table in {**prop.string_tables, **dec.string_tables}.items():
        assert len(table) >= 1

    # phase-2 model predicts finite values on its own training frame shape
    from tracker_trainer_spark.trainer.encode import encode_to_vectors, TIMESTAMP_KEY
    from tracker_trainer_spark.trainer.flatten import flatten_col
    from tracker_trainer_spark.ksuid import ksuid_timestamp
    from tracker_trainer_spark.trainer.loader import load_training_frame

    df = load_training_frame(spark, timeline, columns=["decision_id", "item", "context"], model="m1")
    flat = (
        df.withColumn("_i", flatten_col("item", "item"))
        .withColumn("_c", flatten_col("context", "context"))
        .withColumn(TIMESTAMP_KEY, ksuid_timestamp(F.col("decision_id")))
        .select(
            "decision_id", TIMESTAMP_KEY,
            F.map_concat(F.col("_c")["num"], F.col("_i")["num"]).alias("num_features"),
            F.map_concat(F.col("_c")["str"], F.col("_i")["str"]).alias("str_features"),
        )
    )
    enc = encode_to_vectors(
        flat, [f for f in prop.feature_names if f != TIMESTAMP_KEY],
        prop.string_tables, prop.model_seed,
    )
    scored = propensity_scores(prop, enc)
    rows = scored.select("propensity").collect()
    assert len(rows) == df.count()
    assert all(0.0 <= r["propensity"] <= 1.0 for r in rows)
