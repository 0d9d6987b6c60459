"""Dense 1-based surrogate keys in a pinned total order (SURVEY §2 O9).

The reference assigns ``id_news`` with ``sort_values().reset_index();
index + 1`` (``Main.py:164-165``) — a global, dense, 1-based sequence in
chronological order.  pandas' quicksort leaves ties underdetermined, so
per SURVEY §7 risk #1 we pin an explicit tiebreaker to make the id
deterministic.

Two implementations, identical results given a total order:

* ``method="window"`` — ``row_number()`` over an un-partitioned window.
  Simple and exact, but Spark must funnel every row through ONE task for
  the global window: fine for dim-sized data, a non-starter at 100 TB.

* ``method="offsets"`` (default) — the scalable two-phase plan:
  range-repartition on the order keys, sort within partitions, count
  rows per partition (tiny driver-side collect: one long per partition),
  then add each partition's cumulative offset to a per-partition
  ``row_number``.  Both shuffles are fully parallel; no task ever sees
  more than one partition of data.  This is the standard distributed
  dense-ranking construction (used by e.g. Spark's own ``zipWithIndex``,
  RDD API) expressed in pure DataFrame ops so it stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__mp_pid"


def with_dense_id(
    df: DataFrame,
    order_by: list[str | Column],
    id_col: str = "id_news",
    method: str = "offsets",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``id_col`` = 1..N dense ids ordered by ``order_by``.

    ``order_by`` must be a total order (include a tiebreaker column) for
    the ids to be deterministic.
    """
    if method == "window":
        w = Window.orderBy(*order_by)
        return df.withColumn(id_col, F.row_number().over(w).cast("long"))

    if method != "offsets":
        raise ValueError(f"unknown dense-id method: {method!r}")

    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # No sortWithinPartitions here: the offset pass only needs counts,
    # and the row_number window below sorts each pid-group itself.
    ranged = df.repartitionByRange(parts, *order_by).withColumn(
        _PID, F.spark_partition_id()
    )
    # Pin the (sampled, hence plan-dependent) range partitioning so the
    # count pass and the output pass see identical partition boundaries.
    # localCheckpoint rather than persist: it equally freezes the
    # boundaries (lineage is truncated at the stored blocks), but the
    # blocks are released by the context cleaner once the output plan is
    # garbage-collected — persist would stay pinned in the CacheManager
    # until an explicit unpersist, leaking across repeated calls in a
    # long-lived session.
    ranged = ranged.localCheckpoint(eager=True)
    counts = {r[_PID]: r["cnt"] for r in ranged.groupBy(_PID).agg(F.count("*").alias("cnt")).collect()}
    offsets: dict[int, int] = {}
    running = 0
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]
    if offsets:
        pairs: list[Column] = []
        for pid, off in offsets.items():
            pairs.extend([F.lit(pid), F.lit(off)])
        offset_expr = F.element_at(F.create_map(*pairs), F.col(_PID))
    else:
        offset_expr = F.lit(0)
    w = Window.partitionBy(_PID).orderBy(*order_by)
    out = (
        ranged.withColumn(id_col, (F.row_number().over(w) + offset_expr).cast("long"))
        .drop(_PID)
    )
    return out
