"""Groom job: compact the timeline's dirty partitions to one row per
decision_id (the reference's Step-Function loop, collapsed to a single
pass by the key-range partition layout).

Usage: python scripts/groom_job.py <timeline_path>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tracker_trainer_spark.ingest.groom import (  # noqa: E402
    assert_no_duplicate_keys,
    groom,
)
from tracker_trainer_spark.session import get_spark  # noqa: E402


def main() -> None:
    timeline = sys.argv[1]
    spark = get_spark(app_name="tts-groom")
    n = groom(spark, timeline)
    print(f"rewrote {n} partitions")
    assert_no_duplicate_keys(spark, timeline)


if __name__ == "__main__":
    main()
