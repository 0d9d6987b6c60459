"""Sinks (SURVEY §2 O3).

The reference writes one parquet *file* per run with a wall-clock
timestamp in the filename to avoid overwrites (``Main.py:172-177``,
``Main.py:261-266``).  The Spark-native equivalent is a run-timestamped
output *directory* written in ``error`` mode (never silently clobber),
with as many part-files as there are partitions — a single file would
serialize the whole cluster through one writer task at 100 TB.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import DataFrame


def write_parquet_timestamped(
    df: DataFrame,
    output_folder: str,
    prefix: str,
    timestamp: datetime | None = None,
    partition_by: list[str] | None = None,
    single_file: bool = False,
) -> str:
    """Write ``df`` to ``{output_folder}/{prefix}_{YYYYmmdd_HHMMSS}.parquet``.

    ``partition_by`` produces a hive-partitioned layout (the layout the
    reference's Athena ``MSCK REPAIR TABLE`` stage expects to discover,
    ``Main.py:332``).  ``single_file=True`` coalesces to one part-file for
    small parity outputs only — never for cluster-scale data.
    """
    ts = (timestamp or datetime.now()).strftime("%Y%m%d_%H%M%S")
    final_path = os.path.join(output_folder, f"{prefix}_{ts}.parquet")
    writer_df = df.coalesce(1) if single_file else df
    writer = writer_df.write.mode("error")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(final_path)
    return final_path


def compact_parquet_dir(
    spark,
    src_dir: str,
    dst_dir: str,
    target_mb: int = 128,
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_mb)`` files.  Streaming sinks and
    per-batch appends accumulate thousands of tiny files; at scan time
    each costs a task and a round of footer reads, so periodic
    compaction to ~HDFS-block-sized files is routine warehouse
    maintenance.  Sizes come from the Hadoop FileSystem API, so any
    scheme the cluster mounts (file://, hdfs://, s3a://) works.
    Returns the partition count written."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src_dir)
    total_bytes = path.getFileSystem(hconf).getContentSummary(path).getLength()
    n = max(1, -(-int(total_bytes) // (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src_dir)
    # repartition (round-robin shuffle), not coalesce: coalesce(n) chains
    # upstream tasks onto n slots, losing read parallelism and producing
    # skewed outputs when input files vary in size
    df.repartition(n).write.mode("error").parquet(dst_dir)
    return n


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "error",
    partition_by: list[str] | None = None,
    **options: str,
) -> str:
    """Generic sink: parquet / csv / json (ORC and others pass through to
    the DataSource registry).  CSV writes a header by default."""
    writer = df.write.mode(mode)
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)
    return path
