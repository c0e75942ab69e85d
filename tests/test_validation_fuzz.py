"""Fuzz the parse+validate pipeline against a pure-Python oracle.

Property: for ANY batch of lines — valid records, mutated records,
non-JSON garbage — the pipeline never throws, splits every line into
exactly one of (valid, invalid), and the valid set matches a
line-by-line Python reimplementation of the reference's validation rules
(reference: src/ingest/firehose_record.py:57-121).
"""

from __future__ import annotations

import json
import time

from hypothesis import given, settings, strategies as st

from tracker_trainer_spark import ksuid as K
from tracker_trainer_spark.ingest.reader import parse_track_records
from tracker_trainer_spark.ingest.validate import split_valid

NOW = time.time()
PAST = int(NOW) - 10 * 86400


def _oracle_valid(line: str) -> bool:
    try:
        rec = json.loads(line)
    except (ValueError, TypeError):
        return False
    if not isinstance(rec, dict):
        return False
    mid = rec.get("message_id")
    model = rec.get("model")
    if not isinstance(mid, str) or not K.is_valid(mid, now=NOW):
        return False
    if not isinstance(model, str):
        return False
    import re

    if not re.match(r"^[a-zA-Z0-9][\w\-.]{0,63}$", model) or len(model) > 64:
        return False
    count = rec.get("count")
    if count is not None:  # decision-record rules (JSON-null count = absent)
        if isinstance(count, bool) or not isinstance(count, int) or count < 1:
            return False
        if "sample" in rec and count == 1:
            return False
        return True
    # reward-record rules
    did = rec.get("decision_id")
    reward = rec.get("reward")
    if not isinstance(did, str) or not K.is_valid(did, now=NOW):
        return False
    return isinstance(reward, (int, float)) and not isinstance(reward, bool)


def _ksuids():
    return st.one_of(
        st.integers(0, 10_000).map(lambda i: K.deterministic_ksuid(PAST, i)),
        st.integers(0, 100).map(
            lambda i: K.deterministic_ksuid(int(NOW) + 86400, i)  # future
        ),
        st.sampled_from(["", "short", "x" * 27, "!" * 27]),
    )


_json_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(-10, 10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=8),
)
_payload = st.recursive(
    _json_scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=3),
        st.dictionaries(st.text(min_size=1, max_size=6), inner, max_size=3),
    ),
    max_leaves=6,
)


def _records():
    count_variants = st.one_of(
        st.integers(1, 50), st.integers(-5, 0), st.just(1),
        st.floats(allow_nan=False, allow_infinity=False),
        st.sampled_from(["3", True, None]),
    )
    reward_variants = st.one_of(
        st.integers(-100, 100),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.sampled_from(["1.5", True, None]),
    )
    model_variants = st.sampled_from(
        ["m1", "test-model-1.0", "0" * 64, "", "-leading-dash", "bad name",
         "x" * 65, None]
    )

    def build(mid, model, is_decision, count, reward, did, item, sample_present, sample):
        rec = {"message_id": mid, "model": model}
        if model is None:
            del rec["model"]
        if is_decision:
            rec["count"] = count
            rec["item"] = item
            if sample_present:
                rec["sample"] = sample
        else:
            rec["decision_id"] = did
            if reward != "ABSENT":
                rec["reward"] = reward
        return json.dumps(rec)

    return st.builds(
        build, _ksuids(), model_variants, st.booleans(), count_variants,
        st.one_of(reward_variants, st.just("ABSENT")), _ksuids(), _payload,
        st.booleans(), st.one_of(_payload, st.none()),
    )


_lines = st.lists(
    st.one_of(
        _records(),
        st.sampled_from(
            ['not json', '', '[1,2]', '123', '{"unclosed', '{}', 'null',
             '{"message_id": 7}']
        ),
    ),
    min_size=1, max_size=50,
)


@settings(deadline=None, max_examples=8)
@given(lines=_lines)
def test_split_valid_matches_python_oracle(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "line string")
    parsed = parse_track_records(df)
    valid, invalid = split_valid(parsed, now_ts=NOW)
    got_valid = sorted(r["line"] for r in valid.select("line").collect())
    got_invalid = [r["line"] for r in invalid.select("line").collect()]
    assert len(got_valid) + len(got_invalid) == len(lines)
    want_valid = sorted(ln for ln in lines if _oracle_valid(ln))
    assert got_valid == want_valid
