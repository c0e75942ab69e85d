"""Train job: two-phase contextual-bandit training over the timeline
(the reference's SageMaker container entrypoint, M9 analogue).

Usage:
    python scripts/train_job.py <timeline_path> <artifact_dir> \
        [--model NAME] [--seed N] [--max-checkpoint-age SECONDS]

Reuses a fresh phase-1 checkpoint when present (M5), saves both phases'
artifacts (M6).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tracker_trainer_spark.session import get_spark  # noqa: E402
from tracker_trainer_spark.trainer.artifacts import (  # noqa: E402
    load_checkpoint_if_fresh,
    publish_model,
    save_model,
)
from tracker_trainer_spark.trainer.train import (  # noqa: E402
    train_decision_model,
    train_propensity_model,
)


def _arg(flag: str, default):
    return sys.argv[sys.argv.index(flag) + 1] if flag in sys.argv else default


def main() -> None:
    timeline, out = sys.argv[1], sys.argv[2]
    model = _arg("--model", None)
    seed = int(_arg("--seed", 1))
    max_age = float(_arg("--max-checkpoint-age", 24 * 3600))  # config.yml:36
    spark = get_spark(app_name="tts-train")

    ckpt_dir = os.path.join(out, "propensity")
    # model_name/model_seed gate the reuse: a shared output dir must
    # never hand this job another model's (or seed's) propensity model
    prop = load_checkpoint_if_fresh(spark, ckpt_dir, max_age,
                                    model_name=model or "model",
                                    model_seed=seed)
    if prop is None:
        prop = train_propensity_model(spark, timeline, seed, model=model)
        save_model(prop, ckpt_dir, model_name=model or "model")
        print("phase 1: trained + checkpointed")
    else:
        print("phase 1: reused checkpoint")
    dec = train_decision_model(spark, timeline, prop, seed, model=model)
    dec_dir = os.path.join(out, "decision")
    save_model(dec, dec_dir, model_name=model or "model")
    archive = publish_model(dec_dir, out, model or "model")  # S13
    print(f"phase 2: saved ({len(dec.feature_names)} features, "
          f"{len(dec.string_tables)} string tables); published {archive}")


if __name__ == "__main__":
    main()
