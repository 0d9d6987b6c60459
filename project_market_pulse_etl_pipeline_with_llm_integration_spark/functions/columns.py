"""Reusable column expressions — pure ``pyspark.sql.functions`` so every
one stays inside whole-stage codegen (no Python in the hot path).

These back the text-analysis / dedup / similarity operators; each has a
deliberately simple, SQL-expressible definition so the DuckDB oracle can
replicate it exactly.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenizer shared by token counting, shingling and text stats.
_WS = r"\s+"

# Construction-cost note (optimization r13, guide §4): every Column API
# call is 1+ py4j round trips, and higher-order functions with Python
# lambdas cost ~15-60 ms EACH to build; these helpers sit in nearly every
# query constructor and are rebuilt on every bench rep.  Unresolved
# Column expression trees are immutable (Catalyst case classes; analysis
# produces new resolved trees and never mutates the input), so a helper
# called with the same *column name* can return the SAME Column object
# every time — the lru_cache paths below do exactly that for the common
# string-name call sites, making repeat constructions free.  Column
# arguments (computed expressions) keep the uncached path.


def norm_text(col: Column | str) -> Column:
    """Normalization used before hashing/fingerprinting: lowercase +
    whitespace-collapse + trim.  Same formula must be used in oracles:
    ``trim(regexp_replace(lower(x), '\\s+', ' '))``."""
    if isinstance(col, str):
        return _norm_text_cached(col)
    return F.trim(F.regexp_replace(F.lower(col), _WS, " "))


@lru_cache(maxsize=256)
def _norm_text_cached(name: str) -> Column:
    return F.trim(F.regexp_replace(F.lower(F.col(name)), _WS, " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the trimmed text (array<string>)."""
    if isinstance(col, str):
        return _tokens_cached(col)
    return F.split(F.trim(col), _WS)


@lru_cache(maxsize=256)
def _tokens_cached(name: str) -> Column:
    return F.split(F.trim(F.col(name)), _WS)


def token_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    if isinstance(col, str):
        return _token_count_cached(col)
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(F.size(tokens(col))).cast("long")


@lru_cache(maxsize=256)
def _token_count_cached(name: str) -> Column:
    c = F.col(name)
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(tokens(name))).cast("long")


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array<float/double> columns, computed
    JVM-side with higher-order functions (no UDF): dot(a,b)/(|a||b|).

    Arrays are cast to double first so the arithmetic is identical to a
    DuckDB ``list_dot_product``/``sqrt`` oracle on DOUBLE[].
    """
    if isinstance(a, str) and isinstance(b, str):
        return _cosine_similarity_cached(a, b)
    return _cosine_similarity_build(
        F.col(a) if isinstance(a, str) else a,
        F.col(b) if isinstance(b, str) else b,
    )


def _cosine_similarity_build(a: Column, b: Column) -> Column:
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(bd, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


@lru_cache(maxsize=64)
def _cosine_similarity_cached(a: str, b: str) -> Column:
    return _cosine_similarity_build(F.col(a), F.col(b))
