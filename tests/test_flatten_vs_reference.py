"""Differential fuzz: our flatten kernel vs the reference's own
feature_flattener, imported read-only from /root/reference and driven on
random JSON (reference: src/trainer/code/feature_flattener.py:22-63).

Semantics mapping: the reference keeps values as-is in one dict; ours
splits into a numeric map (bools → 1.0/0.0, ints → float) and a string
map. Equality = same key set, numerics equal as floats, strings equal.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest
from hypothesis import given, strategies as st

from tracker_trainer_spark.trainer.flatten import flatten_json

REF = "/root/reference/src/trainer/code/feature_flattener.py"


def _load_reference_flatten():
    import types

    # the module imports `constants` for two key strings; stub it ONLY
    # for the exec, then restore — a leaked fake top-level `constants`
    # would shadow any later real module of that name
    stub = types.ModuleType("constants")
    stub.ITEM_FEATURE_KEY = "item"
    stub.CONTEXT_FEATURE_KEY = "context"
    prior = sys.modules.get("constants")
    sys.modules["constants"] = stub
    try:
        spec = importlib.util.spec_from_file_location("ref_flattener", REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        if prior is None:
            del sys.modules["constants"]
        else:
            sys.modules["constants"] = prior
    return mod.flatten


# load once (not per Hypothesis example)
_REF_FLATTEN = _load_reference_flatten() if os.path.exists(REF) else None


_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-(10**9), 10**9),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=12),
)
_json = st.recursive(
    _scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(
            st.text(min_size=1, max_size=8).filter(lambda s: "." not in s),
            inner,
            max_size=4,
        ),
    ),
    max_leaves=20,
)


@pytest.mark.skipif(not os.path.exists(REF), reason="reference absent")
@given(obj=_json)
def test_flatten_matches_reference(obj):
    want = _REF_FLATTEN(obj, "item")
    num, strs = flatten_json(obj, "item")

    got_keys = set(num) | set(strs)
    assert got_keys == set(want)
    for k, v in want.items():
        if isinstance(v, str):
            assert strs[k] == v, k
        else:  # bool ⊂ int ⊂ float in the reference's value space
            assert num[k] == float(v), k
