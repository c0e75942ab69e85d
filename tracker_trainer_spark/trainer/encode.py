"""Training-row encode: E1 propensity explode + feature-vector assembly.

E1 (reference: src/trainer/code/propensities.py:130-165): each decision
row emits the chosen item (y=1, w=1) and, when count > 1, the sample
(y=0, w=count-1); both rows share the flattened context and
``t`` = KSUID-embedded timestamp.

Vector assembly (E2/P8): selected feature names define a fixed column
order; numeric features pass through, string features encode via the
per-feature StringTable, absent features are NaN (XGBoost-native
missing). Assembly is an Arrow-batched pandas UDF over the two map
columns with the (bounded) string tables broadcast to executors.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..ksuid import ksuid_timestamp
from .flatten import flatten_merged
from .string_tables import StringTable

TIMESTAMP_KEY = "t"  # reference: src/trainer/code/constants.py:5


def propensity_training_rows(df: DataFrame) -> DataFrame:
    """E1: rewarded-decision rows → (num_features, str_features, t, y, w).

    Input: at-rest rows with item/context/sample JSON strings + count.
    One narrow stage: two fused flatten UDF calls (each a single Arrow
    round-trip), inline array explode — no shuffle. The sample variant is
    flattened directly under the ``item`` root, which IS the reference's
    re-rooting (both go through flatten_item, propensities.py:153-165) —
    no post-hoc key rewrite needed.
    """
    with_flat = (
        df.withColumn(
            "_chosen",
            flatten_merged([("context", "context"), ("item", "item")]),
        )
        .withColumn(
            "_alt",
            flatten_merged([("context", "context"), ("sample", "item")]),
        )
        .withColumn("_t", ksuid_timestamp(F.col("decision_id")))
    )

    chosen = F.struct(
        F.col("_chosen")["num"].alias("num"),
        F.col("_chosen")["str"].alias("str"),
        F.lit(1.0).alias("y"),
        F.lit(1.0).alias("w"),
    )
    sample = F.struct(
        F.col("_alt")["num"].alias("num"),
        F.col("_alt")["str"].alias("str"),
        F.lit(0.0).alias("y"),
        (F.col("count") - 1).cast("double").alias("w"),
    )
    rows = F.when(
        F.col("count") > 1, F.array(chosen, sample)
    ).otherwise(F.array(chosen))
    return (
        with_flat.select("decision_id", F.col("_t").alias(TIMESTAMP_KEY), F.explode(rows).alias("r"))
        .select(
            "decision_id",
            TIMESTAMP_KEY,
            F.col("r.num").alias("num_features"),
            F.col("r.str").alias("str_features"),
            F.col("r.y").alias("y"),
            F.col("r.w").alias("w"),
        )
    )


def encode_to_vectors(df: DataFrame, feature_names: list[str],
                      string_tables: dict[str, list[int]], model_seed: int,
                      num_col: str = "num_features", str_col: str = "str_features",
                      extra_num_cols: tuple = (TIMESTAMP_KEY,),
                      out_col: str = "features") -> DataFrame:
    """P8/E2: map columns → fixed-order array<double> feature vector.

    ``feature_names`` fixes column order (selected features + extras such
    as ``t``); missing values are NaN. The string tables are closed over
    and shipped once per executor via Spark's task broadcast.
    """
    tables = {f: StringTable(t, model_seed) for f, t in string_tables.items()}
    names = list(feature_names)
    for c in extra_num_cols:
        if c not in names:
            names.append(c)
    index = {n: i for i, n in enumerate(names)}
    n_features = len(names)
    extra_cols = [F.col(c).cast("double") for c in extra_num_cols]

    @F.pandas_udf("array<double>")
    def _assemble(num: pd.Series, strs: pd.Series, *extras: pd.Series) -> pd.Series:
        out = []
        extra_arrays = [e.to_numpy() for e in extras]
        for i in range(len(num)):
            vec = np.full(n_features, np.nan)
            nmap = num.iloc[i] or {}
            smap = strs.iloc[i] or {}
            for k, v in nmap.items():
                j = index.get(k)
                if j is not None:
                    vec[j] = v
            for k, s in smap.items():
                j = index.get(k)
                if j is None:
                    continue
                table = tables.get(k)
                if table is None:
                    vec[j] = _miss_encode(s, model_seed)
                else:
                    vec[j] = table.encode(s)
            for c, arr in zip(extra_num_cols, extra_arrays):
                vec[index[c]] = arr[i]
            out.append(vec)
        return pd.Series(out)

    result = df.withColumn(out_col, _assemble(F.col(num_col), F.col(str_col), *extra_cols))
    return result


def _miss_encode(s: str, model_seed: int) -> float:
    """Empty-table encode: deterministic miss in [-0.5, 0.5]
    (reference: feature_encoder.py StringTable with empty table)."""
    from .string_tables import _cached_hash

    h = _cached_hash(s, model_seed)
    return ((h & 0xFFFFFFFF) * 2**-32) - 0.5


def feature_order(selected: list[str], extras: tuple = (TIMESTAMP_KEY,)) -> list[str]:
    names = list(selected)
    for c in extras:
        if c not in names:
            names.append(c)
    return names


def _columnar_string_encode(table: StringTable | None, model_seed: int):
    """Vectorized per-FEATURE string encode: one Arrow-batched UDF over
    the single string column, encoding each DISTINCT value once per
    batch (string-table domains are capped and xxh3 misses repeat —
    distinct ≪ rows), instead of re-walking every row's full feature
    map.  Same arithmetic as encode_to_vectors' per-row loop
    (StringTable.encode / _miss_encode), pinned bit-identical by
    tests/test_encode_columnar.py."""

    @F.pandas_udf("double")
    def _enc(s: pd.Series) -> pd.Series:
        uniq = s.dropna().unique()
        if table is None:
            mapping = {v: _miss_encode(v, model_seed) for v in uniq}
        else:
            mapping = {v: table.encode(v) for v in uniq}
        return s.map(mapping)

    return _enc


def encode_to_vectors_columnar(
        df: DataFrame, feature_names: list[str],
        string_tables: dict[str, list[int]], model_seed: int,
        num_col: str = "num_features", str_col: str = "str_features",
        extra_num_cols: tuple = (TIMESTAMP_KEY,),
        out_col: str = "features") -> DataFrame:
    """Scale-path spelling of :func:`encode_to_vectors` — bit-identical
    output (P8/E2 parity, reference feature_encoder.py:138-226), but the
    vector assembly stays JVM-side: one ``element_at``/``when``
    expression chain per slot feeding a single ``F.array``, all inside
    whole-stage codegen, with Python touched only by the vectorized
    per-feature string encode above.  The generic per-row map-walk UDF
    (encode_to_vectors) pays the full Arrow round-trip of BOTH feature
    maps plus a Python loop over every row × slot; at 100 TB the
    row-loop is the classic UDF slow path the brief forbids in hot
    paths.  Slot semantics replicated exactly:

    - str overrides num for the same key (the loop writes num first,
      str second) → ``when(str IS NOT NULL, enc(str)).otherwise(num)``;
    - extras (``t``) override any map entry for that key → the slot
      reads the COLUMN, never the maps;
    - missing everywhere → NULL: the loop prefills ``np.nan``, but the
      pandas→Arrow return conversion of ``array<double>`` lands those
      as nulls (observed contract, pinned by the parity suite), so the
      columnar slots simply stay NULL (``element_at`` on a missing key)
      rather than re-introducing a NaN the generic path never ships.

    One pandas-UDF hop per STRING-bearing slot: right for the trainer
    corpus (one string feature per the selection result); a schema with
    dozens of string features would amortize better through the
    one-hop generic UDF — documented trade, not a silent cliff.
    """
    tables = {f: StringTable(t, model_seed) for f, t in string_tables.items()}
    names = feature_order(feature_names, extra_num_cols)
    slots = []
    for f in names:
        if f in extra_num_cols:
            slots.append(F.col(f).cast("double"))
            continue
        enc = _columnar_string_encode(tables.get(f), model_seed)
        sval = F.element_at(F.col(str_col), F.lit(f))
        nval = F.element_at(F.col(num_col), F.lit(f))
        slots.append(F.when(sval.isNotNull(), enc(sval)).otherwise(nval))
    return df.withColumn(out_col, F.array(*slots))
