"""gapfill_locf unit + differential coverage."""


def test_gapfill_locf_matches_pandas_ffill(spark):
    """Differential: gapfill_locf == pandas reindex+ffill per key on
    random sparse daily series."""
    import numpy as np
    import pandas as pd
    from tracker_trainer_spark.functions.timeseries import gapfill_locf

    rng = np.random.default_rng(3)
    rows = []
    for k in range(6):
        days = np.sort(rng.choice(np.arange(60), size=rng.integers(2, 12), replace=False))
        for d in days:
            rows.append((k, pd.Timestamp("2024-01-01") + pd.Timedelta(days=int(d)),
                         float(rng.integers(1, 100))))
    pdf = pd.DataFrame(rows, columns=["k", "day", "v"])
    got = (
        gapfill_locf(spark.createDataFrame(pdf), ["k"], "day", "v", step="1 day")
        .toPandas().sort_values(["k", "day"]).reset_index(drop=True)
    )
    want_parts = []
    for k, g in pdf.groupby("k"):
        idx = pd.date_range(g["day"].min(), g["day"].max(), freq="D")
        s = g.set_index("day")["v"].reindex(idx)
        want_parts.append(pd.DataFrame({
            "k": k, "day": idx, "v": s.values, "filled_value": s.ffill().values,
        }))
    want = pd.concat(want_parts).sort_values(["k", "day"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["filled_value"].to_numpy() == want["filled_value"].to_numpy()).all()
    assert (got["is_gap"].to_numpy() == want["v"].isna().to_numpy()).all()
    spark.catalog.clearCache()  # gapfill caches its bucketed input


def test_holt_single_day_is_empty_not_ansi_error(spark, tmp_path):
    """A 1-day revenue series must yield an EMPTY Holt result (the
    two-point init needs day 2), not an ANSI INVALID_ARRAY_INDEX from
    arr[1] inside the filter lambda — the get() guard regression
    (code-review r4): Spark 4 runs ANSI-on by default and subscripting
    a 1-element array throws where the DuckDB oracle's rn=2 anchor
    just matches zero rows."""
    import datetime as dt

    from tracker_trainer_spark.queries_seq_ext import holt_linear_forecast

    rows = [
        (1, dt.datetime(2024, 1, 5, 10, 0, 0), 7, "purchase", 12.34, "{}"),
        (2, dt.datetime(2024, 1, 5, 11, 0, 0), 8, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    assert holt_linear_forecast(spark, str(tmp_path)).count() == 0
