"""Runtime int64-headroom guards (VERDICT r10 item 2).

Several exact-integer operators document a headroom bound of the form
``operand_product * 1000 < 2**63`` (the ``_ppm2`` two-step rational
floor contract).  Spark's non-ANSI arithmetic WRAPS silently past such
a bound, while the DuckDB oracle (HUGEINT) would raise — so at sf0.01
the oracle gate catches a violation, but production at 100 TB has no
oracle.  These helpers make the documented bound a LOUD runtime
invariant instead of a docstring promise, the same posture the dedup
family applies to degenerate blocking (``dedup._guard_inplan``).

The guard folds into the operator's own plan as a zero-extra-job
``assert_true`` projection: the checking comparison is itself written
overflow-safe (``operand <= limit div other`` — a division, never the
product under test), so the guard cannot wrap before it fires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Largest x such that x * 1000 fits in int64 — the shared "·1000 must
# stay in int64" bound of the two-step rational ppm floor (_ppm2).
PPM2_LIMIT = (2 ** 63 - 1) // 1000


def guard_int64(df: DataFrame, ok: Column, msg: Column | str) -> DataFrame:
    """Fold a loud overflow guard into ``df``'s plan: every row must
    satisfy ``ok`` or the job fails with ``msg`` (Spark wraps the raise
    in a task-failure error — loud, never a wrapped number).  NULL
    ``ok`` (NULL operands) passes: NULL propagates through the guarded
    arithmetic to a NULL output, which is the documented empty-input
    behavior, not a wrap."""
    if isinstance(msg, str):
        msg = F.lit(msg)
    # assert_true raises on NULL input too — coalesce the condition
    # first so NULL-operand rows pass (see docstring), then coalesce
    # the assert's NULL-on-pass result back to a filterable true.
    flag = F.coalesce(
        F.assert_true(F.coalesce(ok, F.lit(True)), msg).cast("boolean"),
        F.lit(True),
    )
    return (
        df.withColumn("_i64_ok", flag).filter("_i64_ok").drop("_i64_ok")
    )
