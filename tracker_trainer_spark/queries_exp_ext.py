"""Experimentation / forecast-evaluation queries (deferred channel).

- ``ab_test_lift`` — the experimentation-platform readout: users split
  into two variants by the repo's engine-portable md5 hash bucket
  (never rand() — assignment is a pure function of the id, stable and
  auditable), conversion = made a HIGH-VALUE purchase (value ≥ 80 —
  plain purchase is near-universal in this domain, a degenerate
  metric whose pooled variance is zero), and the two-proportion
  pooled z-test with rates and lift in exact integer basis points.
  The z statistic is built entirely from exact integer counts through
  correctly-rounded IEEE ops in one spelled-out order — identical
  doubles in both engines, so even the significance flag is safe.
- ``holt_backtest`` — rolling-origin forecast evaluation of the Holt
  model: every day-t state predicts day t+1, errors aggregate to the
  model's MAE next to the naive (carry-forward) baseline's MAE — the
  backtesting operator that turns a forecaster into a measured one
  (skill > 1 means the model loses to persistence). Naive errors are
  exact integer cents end to end (half-up integer division); model
  errors are doubles from the shared unrounded Holt fold.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark, sf_dir, name):
    from tracker_trainer_spark.queries import _t as _load

    return _load(spark, sf_dir, name)


def r4(c):
    return F.round(c, 4)


# --------------------------------------------------------------------------
# Two-variant A/B conversion test (pooled two-proportion z)
# --------------------------------------------------------------------------

def ab_test_lift(spark, sf_dir):
    """Hash-assigned A/B conversion readout over event users: variant =
    md5-bucket(user_id) % 2 (portable, reshuffle-stable), conversion =
    at least one HIGH-VALUE purchase (value ≥ 80; plain purchase is
    near-universal here — zero pooled variance). One row: per-variant
    user/converter counts, rates in half-up integer basis points, the
    pooled two-proportion z statistic, and its |z| > 1.96 significance
    flag. z = (pa − pb) / sqrt(p̂(1−p̂)(1/na + 1/nb)) with every input
    an exact integer — both engines produce the identical double, so
    the comparison against 1.96 can never disagree."""
    from tracker_trainer_spark.functions.sampling import hash_bucket

    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(((F.col("event_type") == "purchase")
               & (F.col("value") >= 80.0)).cast("int")).alias("conv"))
    assigned = per_user.select(
        (hash_bucket("user_id") % 2).alias("v"), "conv")
    counts = assigned.agg(
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("v") == 0, F.col("conv")).otherwise(0))
        .cast("long").alias("conv_a"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("v") == 1, F.col("conv")).otherwise(0))
        .cast("long").alias("conv_b"),
    )
    z = (
        (F.col("conv_a").cast("double") / F.col("n_a").cast("double")
         - F.col("conv_b").cast("double") / F.col("n_b").cast("double"))
        / F.sqrt(
            ((F.col("conv_a") + F.col("conv_b")).cast("double")
             / (F.col("n_a") + F.col("n_b")).cast("double"))
            * (1.0 - (F.col("conv_a") + F.col("conv_b")).cast("double")
               / (F.col("n_a") + F.col("n_b")).cast("double"))
            * (1.0 / F.col("n_a").cast("double")
               + 1.0 / F.col("n_b").cast("double"))
        )
    )
    return counts.select(
        "n_a", "conv_a",
        F.expr("(2 * conv_a * 10000 + n_a) div (2 * n_a)")
        .alias("rate_a_bp"),
        "n_b", "conv_b",
        F.expr("(2 * conv_b * 10000 + n_b) div (2 * n_b)")
        .alias("rate_b_bp"),
        (r4(z) + F.lit(0.0)).alias("z_score"),
        (F.abs(z) > 1.96).cast("int").alias("significant_95"),
    )


AB_SQL = """
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' AND value >= 80.0
                  THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
), assigned AS (
  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 100 % 2 AS v,
         conv
  FROM per_user
), counts AS (
  SELECT CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN v = 0 THEN conv ELSE 0 END) AS BIGINT)
           AS conv_a,
         CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN v = 1 THEN conv ELSE 0 END) AS BIGINT)
           AS conv_b
  FROM assigned
)
SELECT n_a, conv_a,
       CAST((2 * conv_a * 10000 + n_a) // (2 * n_a) AS BIGINT)
         AS rate_a_bp,
       n_b, conv_b,
       CAST((2 * conv_b * 10000 + n_b) // (2 * n_b) AS BIGINT)
         AS rate_b_bp,
       round((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
              - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / sqrt((CAST(conv_a + conv_b AS DOUBLE)
                     / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                       / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 / CAST(n_a AS DOUBLE)
                       + 1.0 / CAST(n_b AS DOUBLE))), 4) + 0.0 AS z_score,
       CAST(abs((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                 - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                / sqrt((CAST(conv_a + conv_b AS DOUBLE)
                        / CAST(n_a + n_b AS DOUBLE))
                       * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                          / CAST(n_a + n_b AS DOUBLE))
                       * (1.0 / CAST(n_a AS DOUBLE)
                          + 1.0 / CAST(n_b AS DOUBLE)))) > 1.96
            AS INT) AS significant_95
FROM counts
"""


# --------------------------------------------------------------------------
# Rolling-origin Holt backtest (model MAE vs naive persistence MAE)
# --------------------------------------------------------------------------

def holt_backtest(spark, sf_dir):
    """Rolling-origin evaluation of the Holt forecaster: each day-t
    state's 1-step forecast (unrounded l + b) scores against day t+1's
    actual, next to the naive carry-forward baseline. One row:
    evaluation count, the model's MAE (double, r4 — forecasts are
    FP), the naive MAE in exact half-up integer cents, and the naive
    MAE minus model MAE (positive = the model beats persistence)."""
    from tracker_trainer_spark.queries_seq_ext import _holt_states

    st = _holt_states(spark, sf_dir).select(
        F.col("s.day").alias("day"),
        F.col("s.cents").alias("cents"),
        (F.col("s.st.l") + F.col("s.st.b")).alias("fc"),
    )
    w = Window.orderBy("day")
    ev = (
        st.select(
            "day", "cents", "fc",
            F.lead("cents").over(w).alias("next_cents"),
        )
        .where(F.col("next_cents").isNotNull())
        .select(
            F.abs(F.col("next_cents").cast("double") - F.col("fc"))
            .alias("model_err"),
            F.abs(F.col("next_cents") - F.col("cents")).alias("naive_err"),
        )
    )
    return ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_evals"),
        (r4(F.avg("model_err")) + F.lit(0.0)).alias("mae_model_cents"),
        F.expr("(2 * sum(naive_err) + count(1)) div (2 * count(1))")
        .alias("mae_naive_cents"),
        (r4(F.expr("(2 * sum(naive_err) + count(1)) div (2 * count(1))")
            .cast("double") - F.avg("model_err")) + F.lit(0.0))
        .alias("model_edge_cents"),
    )


def _backtest_sql():
    from tracker_trainer_spark.queries_seq_ext import HOLT_CORE_SQL

    return f"""
WITH RECURSIVE {HOLT_CORE_SQL}, ev AS (
  SELECT abs(CAST(lead(cents) OVER (ORDER BY day) AS DOUBLE) - (l + b))
           AS model_err,
         abs(lead(cents) OVER (ORDER BY day) - cents) AS naive_err
  FROM st
  QUALIFY lead(cents) OVER (ORDER BY day) IS NOT NULL
)
SELECT CAST(count(*) AS BIGINT) AS n_evals,
       round(avg(model_err), 4) + 0.0 AS mae_model_cents,
       CAST((2 * sum(naive_err) + count(*)) // (2 * count(*)) AS BIGINT)
         AS mae_naive_cents,
       round(CAST((2 * sum(naive_err) + count(*)) // (2 * count(*))
                  AS DOUBLE) - avg(model_err), 4) + 0.0
         AS model_edge_cents
FROM ev
"""


EXP_DEFERRED_QUERIES = {
    "ab_test_lift": ab_test_lift,
    "holt_backtest": holt_backtest,
}

EXP_DEFERRED_ORACLES = {
    "ab_test_lift": AB_SQL,
    "holt_backtest": _backtest_sql(),
}
