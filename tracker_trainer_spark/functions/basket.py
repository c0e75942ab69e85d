"""Small-domain basket mining via bitmask histograms.

When the item domain of a market-basket relation is tiny and FIXED
(part brands: 25 values), a basket is ONE 64-bit mask (``bit_or`` of
``1 << index``) and the whole corpus collapses to a (mask, count)
HISTOGRAM before any pair/triple generation:

- the per-basket aggregate becomes a whole-stage-codegen
  ``HashAggregate`` with a single LONG state (``bit_or``) instead of an
  ``ObjectHashAggregate`` building a per-order array (``collect_set``)
  — cheaper per row and a smaller basket shuffle payload (8 bytes vs a
  variable-length array);
- the mask histogram is ≤ |distinct masks| rows (2^|domain| in theory,
  a few hundred thousand at sf1 in practice), and its ``groupBy(mask)``
  compresses map-side to almost nothing;
- combination generation (C(k,2) pairs, C(k,3) triples) runs per
  DISTINCT mask weighted by its count — at sf1 ~0.5M masks × ~6 pairs
  instead of ~12M per-order pairs, a ~20× cut in explode+aggregate
  volume — and the combination key space is C(25,2)=300 / C(25,3)=2300,
  so the final aggregation's map-side combine leaves a few hundred rows
  per task to shuffle.

100 TB posture: after the one unavoidable data-linear shuffle (the
per-order grouping), every relation is bounded by the DOMAIN — the
histogram by 2^|domain| (and in practice by |orders| of one executor's
partial before combine), the pair/triple space by C(|domain|, k) —
never by the row count.  Weighted-histogram combination counts are
exactly the per-order combination counts re-associated, so results are
bit-identical to the naive spelling (integer sums).

Reference shape: the string-table frequency aggregation
(/root/reference/src/trainer/code/string_tables.py analog) also
dictionary-encodes a bounded domain before aggregating; this module
extends the same idea to the combination space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


# Dictionary memo: a domain dictionary is a DETERMINISTIC function of
# an immutable testdata dir (sorted distinct values), so re-collecting
# it per query construction only re-pays a ~0.3 s Spark job.  Same
# session-memo justification as ranking._BOUNDS_CACHE, with the
# stronger property made explicit: unlike boundaries (balance-only),
# the dictionary DOES enter results — which is exactly why it is keyed
# by the immutable (sf_dir, table, col) identity and never by session
# state.  Bounded FIFO like the boundary memo.
_DICT_CACHE: dict[tuple, list] = {}
_DICT_CACHE_MAX = 256


def clear_dictionary_cache() -> None:
    _DICT_CACHE.clear()


def index_dictionary(df: DataFrame, col: str,
                     cache_key: tuple | None = None) -> list:
    """The column's distinct values, sorted — the bounded dictionary
    whose POSITION is the bit index.  Sorted order makes packed-integer
    ascending == value-tuple ascending, so top-k tiebreaks survive the
    encoding (the r6 packed-key convention).  One bounded collect,
    memoized per ``cache_key`` when given."""
    if cache_key is not None and cache_key in _DICT_CACHE:
        return _DICT_CACHE[cache_key]
    values = sorted(r[0] for r in df.select(col).distinct().collect())
    if cache_key is not None:
        if len(_DICT_CACHE) >= _DICT_CACHE_MAX:
            _DICT_CACHE.pop(next(iter(_DICT_CACHE)))
        _DICT_CACHE[cache_key] = values
    return values


def check_pack_width(n_values: int, bits: int, context: str) -> None:
    """Fail loudly when a dictionary outgrows its packed-key width —
    Spark's shiftleft wraps shifts mod 64, so an oversized domain would
    silently ALIAS keys and corrupt counts instead of erroring (the
    `python -O`-proof guard both brand miners carry, centralized)."""
    if n_values >= (1 << bits):
        raise ValueError(
            f"{context}: {n_values} distinct values exceed the "
            f"{bits}-bit pack (max {(1 << bits) - 1}); widen the pack "
            "shift")


def mask_histogram(indexed: DataFrame, key: str, idx: str,
                   min_bits: int = 0,
                   domain_size: int | None = None) -> DataFrame:
    """(mask, cnt) histogram over baskets: ``indexed`` holds one row per
    (basket key, item index); the result has one row per distinct item
    SET, with ``cnt`` = how many baskets carry exactly that set.
    ``bit_or`` both deduplicates within a basket and packs it.
    ``min_bits`` > 0 drops too-small baskets BEFORE the histogram
    shuffle (triples need ≥3 items; the filter is exact, not a
    heuristic).  Pass ``domain_size`` so the 64-bit mask limit is
    checked: Spark's shiftleft wraps shifts mod 64, so index 64 would
    silently collide with index 0 (review r7)."""
    if domain_size is not None and domain_size > 63:
        raise ValueError(
            f"mask_histogram: domain of {domain_size} values exceeds the "
            "63-bit mask (shiftleft wraps mod 64 and would alias "
            "baskets); shard the domain or use array sets")
    masks = indexed.groupBy(key).agg(
        F.expr(f"bit_or(shiftleft(1L, {idx}))").alias("mask"))
    if min_bits:
        masks = masks.where(F.expr(f"bit_count(mask) >= {min_bits}"))
    return masks.groupBy("mask").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"))


def bits_expr(domain_size: int, mask_col: str = "mask") -> Column:
    """array<int> of set bit indices, ascending — the decoded basket."""
    return F.expr(
        f"filter(transform(sequence(0, {domain_size - 1}), "
        f"i -> IF(({mask_col} & shiftleft(1L, i)) != 0, i, "
        f"CAST(NULL AS INT))), x -> x IS NOT NULL)")


def packed_pairs_expr(bits_col: str = "bs", shift: int = 5) -> Column:
    """All i<j pairs of the (ascending) bits array, packed
    ``(a << shift) + b`` — ascending pack order == pair-tuple order."""
    return F.expr(
        f"flatten(transform({bits_col}, (x, i) -> "
        f"transform(slice({bits_col}, i + 2, size({bits_col})), "
        f"y -> shiftleft(x, {shift}) + y)))")


def packed_triples_expr(bits_col: str = "bs", shift: int = 5) -> Column:
    """All i<j<k triples packed ``(a << 2s) + (b << s) + c``."""
    return F.expr(
        f"""flatten(transform(
              sequence(0, size({bits_col}) - 3),
              i -> flatten(transform(
                sequence(i + 1, size({bits_col}) - 2),
                j -> transform(
                  sequence(j + 1, size({bits_col}) - 1),
                  k -> shiftleft({bits_col}[i], {2 * shift})
                       + shiftleft({bits_col}[j], {shift})
                       + {bits_col}[k])))))""")
