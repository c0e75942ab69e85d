"""The reference's HappySunday quality benchmark (SURVEY §5 — coba
regret harness) through the full engine loop: decide → track → ingest →
two-phase train, asserting the learned policy, not just reward noise."""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_benchmark():
    spec = importlib.util.spec_from_file_location(
        "bandit_benchmark", os.path.join(REPO, "scripts", "bandit_benchmark.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bandit_benchmark"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_engine_learns_happy_sunday(spark, tmp_path):
    bb = _load_benchmark()
    report, dec = bb.run(spark, str(tmp_path), n_per_epoch=600, epochs=3, seed=13)

    # the trained policy, queried directly: Happy Sunday on Sundays,
    # the 0.01 arm otherwise — the environment's optimal mapping
    from tracker_trainer_spark.trainer.scoring import rank_items

    cand = spark.createDataFrame(
        [(d, json.dumps(a), json.dumps(d)) for d in (0, 3) for a in bb.ACTIONS],
        "day long, item string, context string",
    )
    best = {r["day"]: json.loads(r["item"])
            for r in rank_items(dec, cand, "day", now_ts=bb.TS0).collect()}
    assert best[0] == "Happy Sunday!"
    assert best[3] == "Have a great day!"

    # and the realized reward left the cold-start regime
    assert report[-1]["mean_reward"] > report[0]["mean_reward"]


def test_engine_learns_value_matcher(spark, tmp_path):
    """LinearValueMatcher (simulations.py:67-84): reward 1 iff action ==
    context over m arms — the model must learn the whole diagonal.
    Asserted against the random baseline with wide margin (measured
    trajectory at m=8: 0.11 → 0.35 → 0.69 over three epochs)."""
    bb = _load_benchmark()
    report, _dec = bb.run(spark, str(tmp_path), n_per_epoch=800, epochs=3,
                          seed=13, env=bb.LinearValueMatcher(8))
    assert report[-1]["mean_reward"] > 2 * report[-1]["random_expects"]
    assert report[-1]["mean_reward"] > report[0]["mean_reward"]
