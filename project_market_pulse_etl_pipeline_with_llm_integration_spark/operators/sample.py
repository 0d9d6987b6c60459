"""Exact-N seeded sampling (SURVEY §2 O11, reference ``Main.py:218-225``).

The reference draws an exact-n uniform sample with pandas' RNG
(``df.sample(n, random_state=42)``).  Pandas RNG identity cannot be
replayed cross-engine (SURVEY §7 risk #2), so the contract here is:
exact n rows, uniform, deterministic for a given (seed, input) — checked
by count/statistical properties, not row identity.

Implementation: order by ``rand(seed)`` and take ``n``.  Spark executes
this as a distributed TakeOrdered (per-partition top-n + driver merge of
n·partitions candidates), NOT a global sort — scalable for any n that
fits the driver's result budget.  For sample sizes that don't, use
``df.sample(fraction, seed)`` (approximate-n) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_sample(df: DataFrame, n: int | None, seed: int = 42) -> DataFrame:
    """Exact-n seeded uniform sample; passthrough when n is None or >= count.

    The reference only samples when ``n < len(df)`` (``Main.py:221``);
    ``limit`` naturally degrades to the full set in that case, so no
    extra count() pass is needed.
    """
    if n is None:
        return df
    n = int(n)
    return df.orderBy(F.rand(seed)).limit(n)
