"""Training-weight and reward-transform column expressions.

All randomness is routed through ``rand(seed)`` columns so plans stay
deterministic and re-executable (Spark may recompute partitions; the
reference's fresh-RNG-per-row approach would be a correctness hazard
here — see SURVEY §4 "custom noise/weight determinism").
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

CLIP_MIN_PROPENSITY = 1e-4          # reference: src/trainer/code/config.py:15
CONTEXT_DROPOUT_KEEP = 0.95         # reference: src/trainer/code/config.py:16-21
EXPLORE_SAMPLE = 1 - 1 / math.e     # reference: src/trainer/code/exploration.py:8-11


def ztp_cdf_chain(max_k: int = 12) -> list[tuple[int, float]]:
    """The zero-truncated Poisson(1) inverse-CDF breakpoints
    [(k, P(K<=k))] — P(k) = e⁻¹ / ((1 - e⁻¹) · k!).  Exposed so SQL
    oracles can embed the IDENTICAL double constants as literals (both
    engines then compare u against bit-equal breakpoints; re-deriving
    exp(-1) inside another engine risks a last-ulp boundary flip)."""
    cdf = 0.0
    fact = 1.0
    chain = []
    for k in range(1, max_k):
        fact *= k
        cdf += math.exp(-1) / ((1 - math.exp(-1)) * fact)
        chain.append((k, cdf))
    return chain


def ztp_from_uniform(u: Column, max_k: int = 12) -> Column:
    """Inverse-CDF zero-truncated Poisson(1) of a caller-supplied
    uniform column — the deterministic core shared by the rand(seed)
    sampler below and the hash-uniform registry query (the exploration
    resample weight, L5)."""
    expr = F.lit(max_k)
    for k, c in reversed(ztp_cdf_chain(max_k)):
        expr = F.when(u < c, F.lit(k)).otherwise(expr)
    return expr.cast("double")


def zero_truncated_poisson(seed: int, max_k: int = 12) -> Column:
    """Zero-truncated Poisson(1) draw as a deterministic column expression.

    Inverse-CDF over ``rand(seed)``: P(k) = e⁻¹ / ((1 - e⁻¹) · k!). The
    reference draws per-row numpy Poissons rejecting zeros
    (reference: src/trainer/code/exploration.py:13-24); the inverse-CDF
    form is distribution-identical and reproducible under partition
    recompute. Tail above ``max_k`` (P < 1e-13) collapses into ``max_k``.
    """
    # u is lambda-bound so the nondeterministic rand() evaluates exactly
    # once per row (raw F.rand() references are NOT common-subexpression
    # eliminated — each one would draw independently)
    return F.transform(
        F.array(F.rand(seed)), lambda u: ztp_from_uniform(u, max_k)
    )[0]


def binary_reward(col="reward") -> Column:
    """P4: reward → 1.0 if positive else 0.0
    (reference: src/trainer/code/decision_trainer.py:50-51)."""
    c = F.col(col) if isinstance(col, str) else col
    return (c > 0.0).cast("double")


def znormalize_reward(df, col: str = "reward") -> Column:
    """P5: (reward - mean) / std with std==0 → 1
    (reference: src/trainer/code/decision_trainer.py:99-117).

    Stats come from one tiny agg collected as scalars and folded into the
    plan as literals (broadcast-scalar pattern).
    """
    row = df.agg(
        F.avg(col).alias("mean"), F.stddev_pop(col).alias("std")
    ).first()
    mean = row["mean"] or 0.0
    std = row["std"] or 0.0
    if std == 0.0:
        std = 1.0
    return (F.col(col) - F.lit(mean)) / F.lit(std)


def context_keep(seed: int = 0, keep: float = CONTEXT_DROPOUT_KEEP) -> Column:
    """P6 keep-decision: True with probability ``keep``
    (reference: src/trainer/code/config.py:16-21 ``should_sample_context``).

    Materialize this into a cached frame before branching on it — raw
    ``rand()`` references are NOT common-subexpression eliminated, so two
    references would draw independently."""
    return F.rand(seed) < F.lit(keep)


def context_dropout(col="context", seed: int = 0,
                    keep: float = CONTEXT_DROPOUT_KEEP) -> Column:
    """P6: null out context with probability 1-keep
    (reference: src/trainer/code/decision_trainer.py:119)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(context_keep(seed, keep), c).otherwise(F.lit(None))


def drop_context_features(df, keep_col: str = "_keep_context",
                          num_col: str = "num_features",
                          str_col: str = "str_features",
                          root: str = "context"):
    """P6 applied post-flatten: strip ``context``-rooted feature keys from
    rows whose keep-decision is False, then drop the keep column.

    Exact to the reference's ordering (src/trainer/code/decision_trainer.py:
    106-119): propensity weights are computed from the FULL context, and
    only the decision-model features see the dropout. Flattening a NULL
    context produces no ``context.*`` keys, so filtering those keys out of
    the already-flattened maps is equivalent to context_dropout-then-
    flatten — without a second flatten pass over the frame.
    """
    def _strip(c: str) -> Column:
        return F.when(F.col(keep_col), F.col(c)).otherwise(
            F.map_filter(
                F.col(c),
                lambda k, _v: ~(k.startswith(root + ".") | (k == root)),
            )
        )

    return (
        df.withColumn(num_col, _strip(num_col))
        .withColumn(str_col, _strip(str_col))
        .drop(keep_col)
    )


def inverse_propensity_weight(propensity_col, mean_item_count,
                              clip: float = CLIP_MIN_PROPENSITY) -> Column:
    """M2: (1 / max(p, clip)) / mean_item_count
    (reference: src/trainer/code/propensities.py:33-49).

    ``mean_item_count`` may be a float (collected scalar, the trainer
    path) or a Column (broadcast 1-row aggregate, the one-action
    registry path) — same arithmetic either way."""
    p = F.col(propensity_col) if isinstance(propensity_col, str) else propensity_col
    m = (mean_item_count if isinstance(mean_item_count, Column)
         else F.lit(float(mean_item_count)))
    return (F.lit(1.0) / F.greatest(p, F.lit(clip))) / m


def sprinkle(col, noise_col) -> Column:
    """P7: (x + noise·2⁻¹⁴²) · (1 + noise·2⁻¹⁷), same noise per row
    (reference: src/trainer/code/feature_encoder.py:158-168).

    ``noise_col`` should be ``rand(seed)`` evaluated once per row (the
    reference's "population id" semantics: one draw shared by all
    features of a row)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.col(noise_col) if isinstance(noise_col, str) else noise_col
    return (c + n * F.lit(2.0**-142)) * (F.lit(1.0) + n * F.lit(2.0**-17))
