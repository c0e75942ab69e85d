import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tracker_trainer_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tts-tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "4",
                              "spark.ui.enabled": "false"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def timeline(spark, tmp_path_factory):
    """Synthetic track records → ingested rewarded-decision timeline."""
    import json
    import random

    from tracker_trainer_spark import ksuid
    from tracker_trainer_spark.ingest import (
        finalize_for_storage,
        merge_rewarded_decisions,
        parse_track_records,
        split_valid,
        to_rewarded_decisions,
        write_timeline,
    )
    from tracker_trainer_spark.ingest.reader import read_track_lines

    ts0 = 1650000000
    rng = random.Random(7)
    lines = []
    for i in range(120):
        did = ksuid.deterministic_ksuid(ts0 + i * 60, i)
        item = {"song": rng.choice(["a", "b", "c", "d"]), "tempo": rng.randint(60, 180)}
        ctx = {"os": rng.choice(["ios", "android"]), "hour": rng.randint(0, 23)}
        count = rng.randint(1, 5)
        rec = {"message_id": did, "model": "m1", "count": count,
               "item": item, "context": ctx}
        if count > 1:
            rec["sample"] = {"song": rng.choice(["a", "b", "c", "d"]),
                             "tempo": rng.randint(60, 180)}
        lines.append(json.dumps(rec))
        if rng.random() < 0.5:
            rid = ksuid.deterministic_ksuid(ts0 + i * 60 + 30, 10_000 + i)
            lines.append(json.dumps({
                "message_id": rid, "model": "m1", "decision_id": did,
                "reward": round(rng.uniform(0, 10), 2),
            }))
    path = str(tmp_path_factory.mktemp("ingest") / "batch.jsonl")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    table = str(tmp_path_factory.mktemp("tl") / "rewarded_decisions")
    parsed = parse_track_records(read_track_lines(spark, path))
    valid, invalid = split_valid(parsed)
    assert invalid.count() == 0
    merged = finalize_for_storage(
        merge_rewarded_decisions(to_rewarded_decisions(valid), ("model", "decision_id"))
    )
    write_timeline(merged, table)
    return table
