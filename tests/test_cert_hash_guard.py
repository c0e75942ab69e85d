"""The mechanical eviction rule (VERDICT r6 item 1).

A query listed in `_DRIVER_CERTIFIED` carries a driver CORRECTNESS cert
for the code that existed when the cert was issued.  This guard pins
each certified query's implementation fingerprint (function source +
oracle SQL, tracker_trainer_spark/certify.py) to the value recorded at
fold time: edit a certified query and the matching test fails until you
either evict the name from `_DRIVER_CERTIFIED` (the normal path — the
driver then re-certifies the new body next round) or deliberately
re-record via scripts/gen_cert_hashes.py.

No Spark session required — pure source inspection.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from tracker_trainer_spark import queries as q
from tracker_trainer_spark.certify import cert_fingerprint

_RECORDED = json.loads(
    (Path(__file__).parent / "data" / "certified_hashes.json").read_text())


def test_recorded_set_matches_certified_set():
    """Every certified name has a recorded fingerprint and vice versa —
    catches folding greens without regenerating the record (and stale
    records for names that left the certified set)."""
    certified = {n for n in q._DRIVER_CERTIFIED if n in q.QUERIES}
    assert certified == set(_RECORDED), (
        "certified set and tests/data/certified_hashes.json diverged; "
        "run scripts/gen_cert_hashes.py as part of the fold"
    )


@pytest.mark.parametrize("name", sorted(_RECORDED))
def test_certified_body_unchanged(name):
    if name not in q.QUERIES:
        pytest.skip("covered by the set-equality test")
    fp = cert_fingerprint(q.QUERIES[name], q.ORACLES.get(name))
    assert fp == _RECORDED[name], (
        f"{name} is in _DRIVER_CERTIFIED but its implementation or "
        "oracle changed since certification — evict it from "
        "_DRIVER_CERTIFIED so the driver re-certifies the new body "
        "(tracker_trainer_spark/queries.py), or re-record via "
        "scripts/gen_cert_hashes.py only if the driver already re-"
        "certified this exact code"
    )
