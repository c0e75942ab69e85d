"""Run every registry query on Spark AND its DuckDB oracle, compare —
the same check the driver performs for CORRECTNESS_r{N}.json."""

import datetime as dt

import pandas as pd
import pytest

import duckdb

from tracker_trainer_spark.queries import QUERIES, ORACLES

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-sort + row-sort only — NO dtype coercion.  The r3 gate
    cast ints to float64 and compared floats with allclose, which was
    WEAKER than the driver's exact value-hash and let 4 representation
    divergences (int64 vs HUGEINT→float64; -0.0 vs 0.0) ship green
    locally then fail the driver.  Strictness now lives in
    ``assert_strict_equal``."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            head = df[c].dropna().head(3).tolist()
            if head and all(isinstance(x, (dt.date, dt.datetime)) for x in head):
                # Spark DATE -> object of datetime.date while DuckDB DATE
                # -> datetime64: same driver-hash value, canonicalize
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _family(s: pd.Series) -> str:
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def _exact_reprs(s: pd.Series) -> list:
    """Value reprs that distinguish everything the driver's hash
    distinguishes: int vs float (12 vs 12.0), and IEEE zero sign
    (repr(np.float64(-0.0)) == '-0.0')."""
    fam = _family(s)
    if fam == "float":
        return [repr(float(x)) for x in s.astype("float64")]
    if fam == "int":
        return [repr(int(x)) for x in s.astype("int64")]
    return s.astype(str).tolist()


def assert_strict_equal(name: str, got: pd.DataFrame, want: pd.DataFrame):
    """Driver-hash-faithful comparison: dtype FAMILY per column plus
    exact value reprs (incl. -0.0 sign).  Anything that passes here
    hash-matches in CORRECTNESS_r{N}.json; anything weaker has already
    burned a round (see VERDICT r3 'What's wrong' #5)."""
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        assert _family(g) == _family(w), (
            f"{name}.{c}: dtype family {_family(g)} ({g.dtype}) != "
            f"{_family(w)} ({w.dtype}) — driver hash WILL mismatch "
            f"(e.g. DuckDB sum(INT)→HUGEINT→float64 vs Spark int64; "
            f"wrap the oracle agg in CAST(... AS BIGINT))"
        )
        gr, wr = _exact_reprs(g), _exact_reprs(w)
        if gr != wr:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(gr, wr)) if a != b]
            raise AssertionError(
                f"{name}.{c}: {len(bad)} exact-repr mismatches "
                f"(first 5: {bad[:5]})\n{got.head()}\n{want.head()}"
            )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    if name not in ORACLES:
        # non-SQL-expressible op: the driver's weaker rows-only check
        df = QUERIES[name](spark, sf_dir)
        assert df.count() > 0 and len(df.schema.fields) > 0
        return
    got = normalize(QUERIES[name](spark, sf_dir).toPandas())
    want = normalize(duck.execute(ORACLES[name]).df())
    assert_strict_equal(name, got, want)
