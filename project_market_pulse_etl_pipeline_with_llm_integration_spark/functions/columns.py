"""Reusable column expressions — pure ``pyspark.sql.functions`` so every
one stays inside whole-stage codegen (no Python in the hot path).

These back the text-analysis / dedup / similarity operators; each has a
deliberately simple, SQL-expressible definition so the DuckDB oracle can
replicate it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenizer shared by token counting, shingling and text stats.
_WS = r"\s+"


def norm_text(col: Column | str) -> Column:
    """Normalization used before hashing/fingerprinting: lowercase +
    whitespace-collapse + trim.  Same formula must be used in oracles:
    ``trim(regexp_replace(lower(x), '\\s+', ' '))``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), _WS, " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the trimmed text (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), _WS)


def token_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(tokens(c))).cast("long")


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, computed
    JVM-side with higher-order functions (no UDF): dot(a,b)/(|a||b|).

    Arrays are cast to double first so the arithmetic is identical to a
    DuckDB ``list_dot_product``/``sqrt`` oracle on DOUBLE[].
    """
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(bd, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)
