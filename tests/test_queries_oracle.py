"""Run every registry query on Spark AND its DuckDB oracle, compare —
the same check the driver performs for CORRECTNESS_r{N}.json."""

import numpy as np
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
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]) or df[c].dtype == object and all(
            isinstance(x, int) for x in df[c].dropna().head(5)
        ):
            try:
                df[c] = df[c].astype("float64")
            except (ValueError, TypeError):
                pass
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    if name not in ORACLES:
        # non-SQL-expressible op: the driver's weaker rows-only check
        df = QUERIES[name](spark, sf_dir)
        assert df.count() > 0 and len(df.schema.fields) > 0
        return
    got = normalize(QUERIES[name](spark, sf_dir).toPandas())
    want = normalize(duck.execute(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) and pd.api.types.is_float_dtype(w):
            assert np.allclose(g.fillna(-9e99), w.fillna(-9e99), atol=1e-9), (
                f"{name}.{c}: value mismatch\n{got.head()}\n{want.head()}"
            )
        else:
            assert g.astype(str).tolist() == w.astype(str).tolist(), (
                f"{name}.{c}: value mismatch\n{got.head()}\n{want.head()}"
            )
