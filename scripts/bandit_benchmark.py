"""Model-quality benchmark: the reference's bandit environments
(HappySunday + LinearValueMatcher) driven through THIS engine
end-to-end.

Reference analogue (reference: src/trainer/benchmark/benchmark.py:53-71,
simulations.py:4-36, learner.py:73-88): coba runs an ImproveAILearner
that tracks decisions/rewards, retrains per epoch, and measures reward
capture against baseline learners. Here each epoch:

  1. decide  — rank the 3 candidate messages per interaction with the
               current decision model (epsilon-greedy; epoch 0 random);
  2. track   — write the decisions + rewards as gzipped JSONL and run
               them through the REAL ingest spine into the timeline;
  3. train   — two-phase train (propensity → decision) on everything
               ingested so far;
  4. report  — mean reward this epoch vs the random and optimal
               policies' expectations.

Environment (simulations.py HappySundayStrings): context = day-of-week
0..6; actions "Have a great day!" (r=0.01), "Have an OK day." (r=0.001),
"Happy Sunday!" (r=1.0 iff day==0). Random policy expects ≈0.051/turn,
optimal ≈0.151/turn. A learner that never figures out Sundays plateaus
at 0.01.

Usage: python scripts/bandit_benchmark.py [interactions_per_epoch] [epochs]
       (defaults 2000, 4) — prints one JSON line per epoch.
"""

from __future__ import annotations

import gzip
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tracker_trainer_spark import ksuid  # noqa: E402
from tracker_trainer_spark.ingest.merge import (  # noqa: E402
    finalize_for_storage,
    merge_rewarded_decisions,
)
from tracker_trainer_spark.ingest.project import to_rewarded_decisions  # noqa: E402
from tracker_trainer_spark.ingest.reader import (  # noqa: E402
    parse_track_records,
    read_track_lines,
)
from tracker_trainer_spark.ingest.sink import write_timeline  # noqa: E402
from tracker_trainer_spark.ingest.validate import split_valid  # noqa: E402
from tracker_trainer_spark.session import get_spark  # noqa: E402
from tracker_trainer_spark.trainer.scoring import rank_items  # noqa: E402
from tracker_trainer_spark.trainer.train import train_two_phase  # noqa: E402

ACTIONS = ["Have a great day!", "Have an OK day.", "Happy Sunday!"]
TS0 = 1650000000  # past base so KSUIDs validate
EPSILON = 0.1


class HappySunday:
    """simulations.py:38-64 HappySundayStrings: 3 message arms, payout
    1.0 for Happy Sunday iff day==0, else tiny constants."""

    name = "happy_sunday"
    actions = ACTIONS
    n_contexts = 7
    random_expects = 0.051
    optimal_expects = 0.151

    @staticmethod
    def reward(day: int, action) -> float:
        if action == ACTIONS[0]:
            return 10 / 1000
        if action == ACTIONS[1]:
            return 1 / 1000
        return 1.0 if day == 0 else 0.0


class LinearValueMatcher:
    """simulations.py:67-84: m integer arms, reward 1 iff action ==
    context — the model must learn the full diagonal, not one hot day."""

    name = "value_matcher"

    def __init__(self, matches: int = 8):
        self.actions = list(range(matches))
        self.n_contexts = matches
        self.random_expects = round(1 / matches, 4)
        self.optimal_expects = 1.0

    @staticmethod
    def reward(context: int, action) -> float:
        return 1.0 if action == context else 0.0


def choose(spark, dec_model, days: np.ndarray, rng, epoch: int,
           actions: list) -> list:
    """Greedy argmax under the current model with epsilon exploration;
    epoch 0 (no model yet) is uniform random — the reference learner's
    cold start."""
    n = len(days)
    n_act = len(actions)
    if dec_model is None:
        return [actions[rng.integers(0, n_act)] for _ in range(n)]
    cand = spark.createDataFrame(
        [(int(i), json.dumps(a), json.dumps(int(d)))
         for i, d in enumerate(days) for a in actions],
        "iid long, item string, context string",
    )
    best = {
        r["iid"]: r["item"]
        for r in rank_items(dec_model, cand, "iid", now_ts=TS0 + epoch).collect()
    }
    picks = []
    for i in range(n):
        if rng.random() < EPSILON:
            picks.append(actions[rng.integers(0, n_act)])
        else:
            picks.append(json.loads(best[i]))
    return picks


def run(spark, work: str, n_per_epoch: int, epochs: int, seed: int = 13,
        env=HappySunday):
    env = env() if isinstance(env, type) else env
    rng = np.random.default_rng(seed)
    timeline = os.path.join(work, f"timeline_{env.name}")
    dec_model = None
    out = []
    for epoch in range(epochs):
        days = rng.integers(0, env.n_contexts, n_per_epoch)
        picks = choose(spark, dec_model, days, rng, epoch, env.actions)
        rewards = [env.reward(int(d), a) for d, a in zip(days, picks)]

        # track: one decision (+ its unchosen sample) and one reward each
        lines = []
        base = TS0 + epoch * n_per_epoch * 2
        for i, (d, a, r) in enumerate(zip(days, picks, rewards)):
            did = ksuid.deterministic_ksuid(base + 2 * i, f"d{epoch}-{i}")
            others = [x for x in env.actions if x != a]
            lines.append(json.dumps({
                "message_id": did, "model": env.name,
                "count": len(env.actions),
                "item": a, "context": int(d),
                "sample": others[rng.integers(0, len(others))],
            }))
            if r != 0.0:
                lines.append(json.dumps({
                    "message_id": ksuid.deterministic_ksuid(base + 2 * i + 1,
                                                            f"r{epoch}-{i}"),
                    "model": env.name, "decision_id": did, "reward": r,
                }))
        src = os.path.join(work, f"{env.name}_epoch{epoch}")
        os.makedirs(src, exist_ok=True)
        with gzip.open(f"{src}/batch.jsonl.gz", "wt") as f:
            f.write("\n".join(lines))

        valid, _ = split_valid(
            parse_track_records(read_track_lines(spark, src)))
        write_timeline(
            finalize_for_storage(merge_rewarded_decisions(
                to_rewarded_decisions(valid), ("model", "decision_id"))),
            timeline,
        )

        t0 = time.perf_counter()
        _, dec_model = train_two_phase(
            spark, timeline, model_seed=seed, model=env.name, explore=False)
        fit_s = time.perf_counter() - t0

        out.append({
            "env": env.name, "epoch": epoch, "interactions": n_per_epoch,
            "mean_reward": round(float(np.mean(rewards)), 4),
            "random_expects": env.random_expects,
            "optimal_expects": env.optimal_expects,
            "train_s": round(fit_s, 1),
        })
        print(json.dumps(out[-1]), flush=True)
    return out, dec_model


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bandit-benchmark", master=f"local[{cpus}]",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    work = "/tmp/bandit_benchmark"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    run(spark, work, n, epochs, env=HappySunday)
    run(spark, work, n, epochs, env=LinearValueMatcher(8))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
