"""Text-analysis operators for training-data pipelines.

All column expressions are JVM-side (whole-stage codegen); the hash
primitive is md5-derived so every operator has an exact cross-engine
oracle (Spark and DuckDB compute identical md5 bytes). These extend the
reference's surface (no text ops exist there — SURVEY §2.10 north-star
extensions).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# 28-bit hash universe and a >2^28 prime for affine permutations; products
# a*h stay < 2^59 so they never overflow BIGINT in either engine.
HASH_BITS = 28
HASH_PRIME = 2147483647  # 2^31 - 1

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "que", "en", "los"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit"],
    "fr": ["le", "la", "de", "et", "est", "les", "des"],
    "zh": ["的", "了", "是", "在", "和", "有", "我"],
}


def tokens(col) -> Column:
    """Whitespace tokenizer (regex \\s+)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, r"\s+")


def portable_token_hash(col) -> Column:
    """String → 28-bit integer hash, identical in Spark and DuckDB:
    first 7 hex chars of md5, base-16 → BIGINT."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("long")


def word_ngrams(tokens_col, n: int) -> Column:
    """Array of space-joined word n-grams (empty when fewer than n tokens).

    The short-array case is guarded with when(): sequence(1, 0) would
    yield a *descending* [1, 0] in Spark, not an empty array.
    """
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)]),
    )
    return F.when(F.size(t) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


# GPT-2-ish pre-tokenizer approximation: letter runs, single digits,
# single non-alnum marks. Counts subword-ish units without a merges table.
SUBWORD_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def subword_token_count(col) -> Column:
    """BPE-ish token count via the pre-tokenizer regex (JVM regexp_count)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(SUBWORD_PATTERN))


def rolling_fingerprint(tokens_col, base: int = 31) -> Column:
    """Polynomial rolling hash of the token stream, mod HASH_PRIME.

    fp = fold(tokens, 0, (acc, tok) -> (acc*base + hash(tok)) % p) — an
    order-sensitive document fingerprint (reordering tokens changes it,
    unlike a bag-of-words hash).
    """
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return F.aggregate(
        t,
        F.lit(0).cast("long"),
        lambda acc, tok: (acc * base + F.conv(F.substring(F.md5(tok), 1, 7), 16, 10).cast("long"))
        % HASH_PRIME,
    )


def lang_scores(tokens_col, langs=("en", "es", "de", "fr", "zh")) -> dict[str, Column]:
    """Per-language stopword-hit counts (n-gram/stopword LID heuristic)."""
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return {
        lang: F.size(F.filter(t, lambda x: x.isin(*STOPWORDS[lang])))
        for lang in langs
    }


def lang_guess(tokens_col, langs=("en", "es", "de", "fr", "zh")) -> Column:
    """argmax language by stopword hits; first-listed lang wins ties."""
    scores = lang_scores(tokens_col, langs)
    best = None
    for lang in reversed(langs):  # build chain so earlier langs win ties
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = scores[lang] >= scores[other] if langs.index(other) > langs.index(lang) \
                else scores[lang] > scores[other]
            cond = c if cond is None else (cond & c)
        best = F.when(cond, F.lit(lang)).otherwise(best if best is not None else F.lit(langs[0]))
    return best


def quality_metrics(text_col) -> dict[str, Column]:
    """Length/punctuation/stopword quality signals for corpus filtering."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(c, r"\s+")
    n_tokens = F.size(toks)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[.,!?;:]", ""))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"])))
    return {
        "n_chars": F.length(c),
        "n_tokens": n_tokens,
        "avg_token_len": (F.length(c) - n_tokens + 1) / n_tokens,
        "punct_ratio": n_punct / F.length(c),
        "stopword_ratio": n_stop / n_tokens,
    }


def dup_ngram_fraction(tokens_col, n: int = 2) -> Column:
    """Fraction of word n-grams that are repeats of an earlier n-gram —
    the Gopher-style repetition signal (Rae et al. 2021 §A1.1) for
    filtering boilerplate/spam. Pure JVM, narrow, codegen; 0.0 for docs
    with fewer than n tokens.

    N-grams are struct tuples via ``arrays_zip`` of n shifted slices,
    not space-joined strings: skipping the per-gram ``concat_ws``
    allocation makes the pass ~2.4× faster at sf0.1 (0.53 s vs 1.27 s,
    local[32]) with identical distinct-count semantics (tokens contain
    no whitespace, so the string join was injective — the tuple form is
    injective by construction)."""
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    m = F.size(t) - (n - 1)  # n-gram count when size >= n
    g = F.arrays_zip(*[F.slice(t, i + 1, m) for i in range(n)])
    return F.when(
        F.size(t) >= n, F.lit(1.0) - F.size(F.array_distinct(g)) / m
    ).otherwise(F.lit(0.0))


def top_token_fraction(tokens_col) -> Column:
    """Most-frequent-token share of the document (Gopher's top-n-gram
    fraction at n=1). Needs a per-row mode count — a quadratic HOF
    (count each distinct against the array) would blow up on long
    docs, so this is a single Arrow-batched kernel: one narrow pass,
    no shuffle, O(tokens) per row via a hash counter."""

    @F.pandas_udf("double")
    def _top(tok_arrays: pd.Series) -> pd.Series:
        from collections import Counter

        out = []
        for a in tok_arrays:
            if a is None or len(a) == 0:
                out.append(0.0)
            else:
                out.append(Counter(a).most_common(1)[0][1] / len(a))
        return pd.Series(out)

    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return _top(t)
