"""Merge-operator semantics, mirroring the reference's golden cases
(reference: tests/tracker/test_merge_rewarded_decisions.py)."""

import json

import pytest
from pyspark.sql import functions as F

from tracker_trainer_spark import ksuid
from tracker_trainer_spark.ingest.merge import (
    finalize_for_storage,
    merge_rewarded_decisions,
    parse_stored,
)
from tracker_trainer_spark.ingest.project import to_rewarded_decisions
from tracker_trainer_spark.ingest.reader import parse_track_records
from tracker_trainer_spark.ingest.validate import split_valid

TS = 1653297422  # fixed past timestamp


def kid(n):
    return ksuid.deterministic_ksuid(TS + n, n)


def _merge_lines(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "line string")
    valid, invalid = split_valid(parse_track_records(df))
    rd = to_rewarded_decisions(valid)
    merged = finalize_for_storage(
        merge_rewarded_decisions(rd, group_cols=("model", "decision_id"))
    )
    return {r["decision_id"]: r.asDict() for r in merged.collect()}, invalid.count()


def decision(mid, model="test-model-1.0", count=2, item=None, context=None, **kw):
    rec = {"message_id": mid, "model": model, "count": count,
           "item": item, "context": context}
    rec.update(kw)
    return json.dumps(rec)


def reward(mid, decision_id, value, model="test-model-1.0"):
    return json.dumps({"message_id": mid, "model": model,
                       "decision_id": decision_id, "reward": value})


def test_one_decision_one_reward(spark):
    d, r1 = kid(1), kid(2)
    rows, bad = _merge_lines(spark, [
        decision(d, item={"text": "variant"}, context={"device": "iPhone"}),
        reward(r1, d, -10),
    ])
    assert bad == 0
    row = rows[d]
    assert row["item"] == '{"text":"variant"}'
    assert row["context"] == '{"device":"iPhone"}'
    assert row["count"] == 2.0
    assert row["rewards"] == '{"%s":-10}' % r1
    assert row["reward"] == -10.0
    assert row["sample"] is None


def test_duplicate_reward_message_ids_collapse(spark):
    d, r1 = kid(1), kid(2)
    rows, _ = _merge_lines(spark, [
        decision(d),
        reward(r1, d, 5),
        reward(r1, d, 5),
    ])
    assert rows[d]["rewards"] == '{"%s":5}' % r1
    assert rows[d]["reward"] == 5.0


def test_orphan_rewards(spark):
    d = kid(1)
    rows, _ = _merge_lines(spark, [
        reward(kid(2), d, 1.5),
        reward(kid(3), d, 2.5),
    ])
    row = rows[d]
    assert row["item"] is None and row["context"] is None and row["count"] is None
    assert row["reward"] == 4.0
    assert json.loads(row["rewards"]) == {kid(2): 1.5, kid(3): 2.5}


def test_decision_no_rewards(spark):
    d = kid(1)
    rows, _ = _merge_lines(spark, [decision(d)])
    assert rows[d]["rewards"] == "{}"
    assert rows[d]["reward"] == 0.0


def test_null_item_context_encode_as_json_null_text(spark):
    d = kid(1)
    rows, _ = _merge_lines(spark, [decision(d, item=None, context=None)])
    # json_dumps(None) == 'null' — decisions always carry non-NULL strings
    assert rows[d]["item"] == "null"
    assert rows[d]["context"] == "null"


def test_sample_absent_vs_set_null(spark):
    d1, d2 = kid(1), kid(2)
    lines = [
        decision(d1),  # sample absent
        json.dumps({"message_id": d2, "model": "test-model-1.0", "count": 3,
                    "item": 1, "context": {}, "sample": None}),  # set-null
    ]
    rows, _ = _merge_lines(spark, lines)
    assert rows[d1]["sample"] is None       # SQL NULL
    assert rows[d2]["sample"] == "null"     # JSON text 'null'
    # bare-primitive item JSON-encodes as-is
    assert rows[d2]["item"] == "1"
    assert rows[d2]["context"] == "{}"


def test_wrap_primitives_projection(spark):
    """P9 opt-in (ref utils.py:80-95): primitive → {"$value": v}, null →
    {}, dict/list pass through, absent sample stays SQL NULL. Default
    path (wrap_primitives=False) matches ref v8 ingest: no wrapping."""
    d1, d2, d3 = kid(41), kid(42), kid(43)
    lines = [
        decision(d1, item="hi", context=3.5, count=2, sample=[1, 2]),
        decision(d2, item={"a": 1}, context=None),
        decision(d3, item=True, context={"b": 2}),
    ]
    df = spark.createDataFrame([(ln,) for ln in lines], "line string")
    valid, _ = split_valid(parse_track_records(df))

    wrapped = {r["decision_id"]: r.asDict()
               for r in to_rewarded_decisions(valid, wrap_primitives=True).collect()}
    assert wrapped[d1]["item"] == '{"$value":"hi"}'
    assert wrapped[d1]["context"] == '{"$value":3.5}'
    assert wrapped[d1]["sample"] == "[1,2]"          # list passes through
    assert wrapped[d2]["item"] == '{"a":1}'          # dict passes through
    assert wrapped[d2]["context"] == "{}"            # null → {}
    assert wrapped[d2]["sample"] is None             # absent stays unset
    assert wrapped[d3]["item"] == '{"$value":true}'

    plain = {r["decision_id"]: r.asDict()
             for r in to_rewarded_decisions(valid).collect()}
    assert plain[d1]["item"] == '"hi"'
    assert plain[d2]["context"] == "null"


def test_sorted_keys_in_item_json(spark):
    d = kid(1)
    rows, _ = _merge_lines(spark, [decision(d, item={"b": 1, "a": {"d": 2, "c": 3}})])
    assert rows[d]["item"] == '{"a":{"c":3,"d":2},"b":1}'


def test_merge_idempotent_and_reentrant(spark):
    d, r1, r2 = kid(1), kid(2), kid(3)
    lines = [decision(d, item={"x": 1}), reward(r1, d, 1), reward(r2, d, 2)]
    df = spark.createDataFrame([(ln,) for ln in lines], "line string")
    valid, _ = split_valid(parse_track_records(df))
    rd = to_rewarded_decisions(valid)
    once = finalize_for_storage(merge_rewarded_decisions(rd, ("model", "decision_id")))
    # re-merge merged output unioned with the raw partials again
    again = finalize_for_storage(
        merge_rewarded_decisions(
            parse_stored(once).unionByName(rd, allowMissingColumns=True),
            ("model", "decision_id"),
        )
    )
    a = {r["decision_id"]: r.asDict() for r in once.collect()}
    b = {r["decision_id"]: r.asDict() for r in again.collect()}
    assert a == b
    assert a[d]["reward"] == 3.0


def test_invalid_records_rejected(spark):
    good = kid(1)
    lines = [
        decision(good),
        "not json",
        json.dumps({"message_id": "short", "model": "m", "count": 1}),       # bad ksuid
        json.dumps({"message_id": kid(2), "model": "bad name!", "count": 1}),  # bad model
        json.dumps({"message_id": kid(3), "model": "m", "count": 0}),        # count < 1
        json.dumps({"message_id": kid(4), "model": "m", "count": 1.5}),      # non-int count
        json.dumps({"message_id": kid(5), "model": "m", "count": 1, "sample": None}),  # sample w/ count 1
        json.dumps({"message_id": kid(6), "model": "m", "decision_id": kid(1), "reward": "x"}),  # non-numeric
        json.dumps({"message_id": kid(7), "model": "m", "decision_id": "zzz", "reward": 1}),  # bad decision_id
    ]
    rows, bad = _merge_lines(spark, lines)
    assert set(rows) == {good}
    assert bad == len(lines) - 1


def test_future_ksuid_rejected(spark):
    future = ksuid.deterministic_ksuid(3000000000, 99)  # year 2065
    rows, bad = _merge_lines(spark, [decision(future)])
    assert rows == {} and bad == 1


def test_salted_merge_equals_plain(spark):
    """Two-stage salted aggregation is exact (associativity of the merge)."""
    import json as _json
    from tracker_trainer_spark.ingest.merge import (
        finalize_for_storage, merge_rewarded_decisions,
    )
    from pyspark.sql import functions as F

    rows = []
    # hot key with many reward partials + a decision row
    rows.append(("hot", '{"x":1}', "{}", 3.0, None, None))
    for i in range(500):
        rows.append(("hot", None, None, None, None, {"r%03d" % i: float(i)}))
    rows.append(("cold", '{"y":2}', "{}", 1.0, None, {"rc": 2.0}))
    df = spark.createDataFrame(
        rows,
        "decision_id string, item string, context string, count double, "
        "sample string, rewards map<string,double>",
    )
    plain = {r.decision_id: r for r in
             finalize_for_storage(merge_rewarded_decisions(df)).collect()}
    salted = {r.decision_id: r for r in
              finalize_for_storage(
                  merge_rewarded_decisions(df, salt_buckets=8)).collect()}
    assert set(plain) == set(salted) == {"hot", "cold"}
    for k in plain:
        assert plain[k].item == salted[k].item
        assert plain[k]["count"] == salted[k]["count"]
        assert _json.loads(plain[k].rewards) == _json.loads(salted[k].rewards)
        assert plain[k].reward == salted[k].reward
    assert _json.loads(plain["hot"].rewards) == {"r%03d" % i: float(i) for i in range(500)}


def test_file_split_bounds_and_order(spark, tmp_path):
    """S9/G1: a partition larger than max_records_per_file splits into
    multiple files, each within the bound and internally sorted by
    decision_id (reference: 10,000-row cap, src/ingest/config.py:13;
    sorted range-named files, src/ingest/partition.py:88-97)."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from tracker_trainer_spark import ksuid
    from tracker_trainer_spark.ingest.sink import write_timeline

    ts0 = 1650000000
    rows = [
        (ksuid.deterministic_ksuid(ts0 + (i % 97), i), "{}", "{}", 1.0,
         None, "{}", 0.0)
        for i in range(2500)
    ]
    df = spark.createDataFrame(
        rows,
        "decision_id string, item string, context string, count double, "
        "sample string, rewards string, reward double",
    ).withColumn("model", F.lit("m1"))
    path = str(tmp_path / "tl")
    write_timeline(df, path, max_records_per_file=1000)

    files = glob.glob(f"{path}/model=m1/dt=*/*.parquet")
    assert len(files) >= 3  # 2500 rows / 1000-row cap
    total = 0
    for f in files:
        t = pq.read_table(f, columns=["decision_id"])
        n = len(t)
        assert 0 < n <= 1000, os.path.basename(f)
        ids = t.column("decision_id").to_pylist()
        assert ids == sorted(ids), "file not sorted by decision_id"
        total += n
    assert total == 2500
