"""JSON flatten: arbitrary nested JSON → flat dot-path feature dicts.

Reference semantics (reference: src/trainer/code/feature_flattener.py:22-63):
- dict keys append ``.key``; list elements append ``.index``;
- numbers/bools/strings are kept (bool ⊂ number); None/{}/[] vanish;
- roots are the column names (``item``, ``context``).

The key space is data-dependent, so this is genuinely dynamic-schema
work — the one place the engine uses Python in the hot path, as an
Arrow-batched pandas UDF returning two typed maps (numeric + string
features). Everything downstream (selection, string stats, vector
assembly) composes JVM-side on these maps.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FLAT_STRUCT = "num: map<string,double>, str: map<string,string>"


def flatten_json(obj, root: str, num: dict | None = None, strs: dict | None = None):
    """Pure kernel: one JSON value → (numeric-features, string-features)."""
    if num is None:
        num = {}
    if strs is None:
        strs = {}
    _walk(obj, root, num, strs)
    return num, strs


def _walk(obj, path, num, strs):
    if isinstance(obj, bool):
        num[path] = 1.0 if obj else 0.0
    elif isinstance(obj, (int, float)):
        num[path] = float(obj)
    elif isinstance(obj, str):
        strs[path] = obj
    elif isinstance(obj, dict):
        for k, v in obj.items():
            _walk(v, f"{path}.{k}", num, strs)
    elif isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            _walk(v, f"{path}.{i}", num, strs)
    elif obj is None:
        pass
    else:
        raise ValueError(f"not JSON-flattenable: {obj!r}")


def _make_flatten_udf(root: str):
    @F.pandas_udf(f"struct<{FLAT_STRUCT}>")
    def _flatten(col: pd.Series) -> pd.DataFrame:
        nums, strss = [], []
        for raw in col:
            if raw is None:
                nums.append({})
                strss.append({})
                continue
            n, s = flatten_json(json.loads(raw), root)
            nums.append(n)
            strss.append(s)
        return pd.DataFrame({"num": nums, "str": strss})

    return _flatten


def flatten_col(col, root: str) -> Column:
    """Column: JSON-string column → struct(num: map, str: map)."""
    c = F.col(col) if isinstance(col, str) else col
    return _make_flatten_udf(root)(c)


def flatten_merged(cols_and_roots) -> Column:
    """Flatten several JSON-string columns in ONE Arrow round-trip and
    return the merged struct(num, str) directly.

    Equivalent to map_concat over per-column flatten_col results (roots
    are distinct path prefixes, so key spaces cannot collide), but pays
    one pandas-UDF invocation per batch instead of one per column —
    each extra chained pandas UDF adds a full JVM→Arrow→Python→Arrow→JVM
    hop for the whole batch.
    """
    roots = tuple(root for _, root in cols_and_roots)

    @F.pandas_udf(f"struct<{FLAT_STRUCT}>")
    def _flatten_many(*series: pd.Series) -> pd.DataFrame:
        nums, strss = [], []
        for vals in zip(*series):
            n: dict = {}
            s: dict = {}
            for raw, root in zip(vals, roots):
                if raw is not None:
                    flatten_json(json.loads(raw), root, n, s)
            nums.append(n)
            strss.append(s)
        return pd.DataFrame({"num": nums, "str": strss})

    ins = [F.col(c) if isinstance(c, str) else c for c, _ in cols_and_roots]
    return _flatten_many(*ins)


def flatten_columns(df: DataFrame, cols=("item", "context")) -> DataFrame:
    """Add ``<col>_flat`` struct columns for each JSON-string column."""
    for c in cols:
        df = df.withColumn(f"{c}_flat", flatten_col(c, c))
    return df


def merged_feature_maps(*flat_structs) -> tuple[Column, Column]:
    """Union several *_flat structs into one (num, str) map pair.

    Roots are distinct path prefixes, so key spaces never collide and a
    plain map_concat is exact.
    """
    nums = [s["num"] for s in flat_structs]
    strs = [s["str"] for s in flat_structs]
    return F.map_concat(*nums), F.map_concat(*strs)
