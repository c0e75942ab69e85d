"""Registry / driver-contract invariants.

The per-round driver verifies only the FIRST 50 ``queries()`` entries,
so the registry ordering IS part of the correctness pipeline: these
pins fail loudly if a future round adds queries without folding the
newly certified keys into the front-load set, or registers a query
without an oracle (outside the documented rows-only pair).
"""

from tracker_trainer_spark.queries import (
    ORACLES,
    QUERIES,
    _DRIVER_CERTIFIED,
)

DRIVER_WINDOW = 50
# non-SQL-expressible by design: model fits + inference
# (media_image_features left this set in r7 — portable dyadic stub
# decode; train_encode_events left in r8 — numeric vector slots gave
# it a full oracle, the xxh3 string slot adjudicated in its docstring)
ROWS_ONLY = {"train_e2e_metrics"}


def test_every_query_has_an_oracle_or_is_documented_rows_only():
    missing = set(QUERIES) - set(ORACLES) - ROWS_ONLY
    assert not missing, missing
    # the declared exceptions must really LACK oracles — a stale
    # declaration would let a future oracle removal pass silently
    assert not ROWS_ONLY & set(ORACLES)
    stale = ROWS_ONLY - set(QUERIES)
    assert not stale, stale
    assert not set(ORACLES) - set(QUERIES)  # no orphan oracle SQL


def test_certified_keys_all_exist():
    """A renamed/removed query must also leave the certified set —
    otherwise the front-loader silently mis-partitions."""
    assert _DRIVER_CERTIFIED <= set(QUERIES)


def test_uncertified_queries_front_load_into_the_driver_window():
    """Every not-yet-driver-certified query must sit inside the first
    DRIVER_WINDOW entries while slots remain; overflow (deliberately
    deferred additions) must occupy the TAIL positions only, never
    displacing an older uncertified query from the window."""
    keys = list(QUERIES)
    uncertified = [k for k in keys if k not in _DRIVER_CERTIFIED]
    window = keys[:DRIVER_WINDOW]
    in_window = [k for k in uncertified if k in window]
    assert len(in_window) == min(len(uncertified), DRIVER_WINDOW), (
        f"{len(uncertified)} uncertified but only {len(in_window)} "
        f"inside the {DRIVER_WINDOW}-query driver window")
    # certified keys may only appear in the window when uncertified
    # queries don't fill it
    if len(uncertified) >= DRIVER_WINDOW:
        assert all(k not in _DRIVER_CERTIFIED for k in window)
