"""Property-based tests (hypothesis) for the merge aggregation — the
invariants the reference proves with golden files
(reference: tests/tracker/test_merge_rewarded_decisions.py:190-222):
idempotency, re-entrancy (merge of merged output + new partials equals
one-shot merge), and partition-order independence."""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tracker_trainer_spark.ingest.merge import (
    finalize_for_storage,
    merge_rewarded_decisions,
    parse_stored,
)

SCHEMA = ("decision_id string, item string, context string, count double, "
          "sample string, rewards map<string,double>")

# a partial record: decision payload, reward partial, or both-null filler
partials = st.lists(
    st.tuples(
        st.sampled_from(["d1", "d2", "d3"]),                        # decision_id
        st.one_of(st.none(), st.sampled_from(['{"a":1}', '{"b":2}'])),   # item
        st.one_of(st.none(), st.just("{}")),                         # context
        st.one_of(st.none(), st.floats(1, 5)),                       # count
        st.none(),                                                   # sample
        st.one_of(
            st.none(),
            st.dictionaries(st.sampled_from(["r1", "r2", "r3"]),
                            st.floats(-2, 2, allow_nan=False), max_size=3),
        ),                                                           # rewards
    ),
    min_size=1, max_size=12,
)


def _merged_as_dict(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = finalize_for_storage(merge_rewarded_decisions(df)).collect()
    return {
        r.decision_id: (r.item, r.context, r["count"], r.sample,
                        json.loads(r.rewards), round(r.reward, 9))
        for r in out
    }


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=partials)
def test_merge_reentrant(spark, rows):
    """merge(merge(batch1) ∪ batch2) == merge(batch1 ∪ batch2)."""
    cut = len(rows) // 2
    b1, b2 = rows[:cut], rows[cut:]
    one_shot = _merged_as_dict(spark, rows)

    if b1:
        m1 = finalize_for_storage(
            merge_rewarded_decisions(spark.createDataFrame(b1, SCHEMA)))
        remixed = parse_stored(m1).unionByName(
            spark.createDataFrame(b2, SCHEMA) if b2
            else spark.createDataFrame([], SCHEMA))
        re_merged = {
            r.decision_id: (r.item, r.context, r["count"], r.sample,
                            json.loads(r.rewards), round(r.reward, 9))
            for r in finalize_for_storage(merge_rewarded_decisions(remixed)).collect()
        }
        # first-non-null within a merged group is order-dependent when two
        # partials both carry a payload; compare the order-independent parts
        assert set(re_merged) == set(one_shot)
        for k in one_shot:
            assert re_merged[k][4] == one_shot[k][4], "rewards map must match"
            assert re_merged[k][5] == one_shot[k][5], "reward sum must match"


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=partials)
def test_merge_idempotent(spark, rows):
    """Re-merging merged output with itself changes nothing."""
    once = _merged_as_dict(spark, rows)
    df = spark.createDataFrame(rows, SCHEMA)
    merged = finalize_for_storage(merge_rewarded_decisions(df))
    doubled = parse_stored(merged).unionByName(parse_stored(merged))
    twice = {
        r.decision_id: (r.item, r.context, r["count"], r.sample,
                        json.loads(r.rewards), round(r.reward, 9))
        for r in finalize_for_storage(merge_rewarded_decisions(doubled)).collect()
    }
    assert twice == once


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=partials)
def test_merge_matches_dict_oracle(spark, rows):
    """Differential check against reference dict semantics
    (src/ingest/partition.py:155-213): payload columns take SOME non-null
    group value (first() order under a distributed agg is not pinned, so
    conflicting payloads admit any group member), rewards is the keyed
    union (conflicting values for one message_id admit any observed
    value), and reward is exactly the sum of the merged map."""
    got = _merged_as_dict(spark, rows)

    groups: dict = {}
    for did, item, context, count, sample, rewards in rows:
        g = groups.setdefault(
            did, {"item": set(), "context": set(), "count": set(),
                  "rewards": {}})
        if item is not None:
            g["item"].add(item)
        if context is not None:
            g["context"].add(context)
        if count is not None:
            g["count"].add(count)
        for mid, val in (rewards or {}).items():
            g["rewards"].setdefault(mid, set()).add(round(val, 9))

    assert set(got) == set(groups)
    for did, g in groups.items():
        item, context, count, sample, rewards, reward = got[did]
        assert item in (g["item"] or {None})
        assert context in (g["context"] or {None})
        assert count in (g["count"] or {None})
        assert set(rewards) == set(g["rewards"])
        for mid, val in rewards.items():
            assert round(val, 9) in g["rewards"][mid], (mid, val)
        assert abs(reward - sum(rewards.values())) < 1e-6


# Well-formed data carries ONE distinct non-null payload per
# decision_id (a decision is tracked once) and the same value per
# duplicated message_id — conflicting payloads are producer corruption,
# where first()/LAST_WIN resolve arbitrarily per plan. The property
# below randomizes which fields are PRESENT per partial, but their
# values are a fixed function of the key, per the documented contract.
_DUP_SAFE_VALUES = {"r1": 1.0, "r2": -0.5, "r3": 2.25}
_ITEM_OF = {"d1": '{"a":1}', "d2": '{"b":2}', "d3": '{"a":1}'}
_COUNT_OF = {"d1": 2.0, "d2": 3.0, "d3": 5.0}


def _well_formed(rows):
    out = []
    for did, item, context, count, sample, rewards in rows:
        out.append((
            did,
            _ITEM_OF[did] if item is not None else None,
            context,
            _COUNT_OF[did] if count is not None else None,
            sample,
            {k: _DUP_SAFE_VALUES[k] for k in rewards} if rewards is not None else None,
        ))
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=partials, salt=st.sampled_from([2, 7, 32]))
def test_salted_merge_equals_unsalted(spark, rows, salt):
    """salt_buckets is pure plan surgery: two-stage salted aggregation
    must produce byte-identical merged output for ANY well-formed
    partial mix and bucket count (the associativity claim behind the
    hot-key path)."""
    rows = _well_formed(rows)
    df = spark.createDataFrame(rows, SCHEMA)
    plain = _merged_as_dict(spark, rows)
    salted_out = finalize_for_storage(
        merge_rewarded_decisions(df, salt_buckets=salt)
    ).collect()
    salted = {
        r.decision_id: (r.item, r.context, r["count"], r.sample,
                        json.loads(r.rewards), round(r.reward, 9))
        for r in salted_out
    }
    assert salted == plain
