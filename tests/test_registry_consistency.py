"""Registry invariants the driver's correctness gate relies on."""

import inspect

from tracker_trainer_spark.queries import ORACLES, QUERIES


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES), set(ORACLES) - set(QUERIES)


def test_queries_without_oracle_are_the_declared_exceptions():
    # non-SQL-expressible ops only — anything else missing an oracle is
    # a silent hole in the correctness gate
    # media_image_features left this set in r7 (portable stub decode →
    # SQL-expressible); train_encode_events left in r8 (numeric vector
    # slots exposed → full oracle; the xxh3 string slot stays outside,
    # adjudicated in its docstring)
    assert set(QUERIES) - set(ORACLES) == {
        "train_e2e_metrics",      # model fits + inference (r6)
    }


def test_query_callables_take_spark_and_sfdir():
    for name, fn in QUERIES.items():
        params = list(inspect.signature(fn).parameters)
        assert params[:2] == ["spark", "sf_dir"], (name, params)


def test_entry_module_exposes_full_registry():
    import __spark_entry__ as e

    assert set(e.queries()) == set(QUERIES)
    assert e.oracle_sql() == ORACLES
