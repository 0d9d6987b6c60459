"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic tick generator.

Demonstrates the modern extension point a 100 TB pipeline uses to wrap
internal feeds (message queues, proprietary file formats, REST-paged
APIs) as first-class Spark relations: the source declares a schema,
splits itself into ``InputPartition``s, and each partition's ``read``
runs ON AN EXECUTOR — the driver never materializes rows, and
parallelism is the source's own partition count.

The generated rows are a PURE FUNCTION of (row index): value cents are
``(i * 2654435761) % 100000`` (a Knuth multiplicative hash — spreads
uniformly, overflows nothing: i·2654435761 < 2^63 for i < 3.5e9).
Determinism is the point — the DuckDB oracle regenerates the identical
relation from ``generate_series`` and the driver gate hash-compares
both, proving the custom source is replayable (corpus-versioning
requires replayable ingest).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

KNUTH = 2654435761


class SyntheticTicksDataSource(DataSource):
    """``spark.read.format("synthetic_ticks").option("n", N)`` source."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_ticks"

    def schema(self) -> str:
        return "event_id bigint, series string, cents bigint"

    def reader(self, schema) -> "SyntheticTicksReader":
        return SyntheticTicksReader(self.options)


class SyntheticTicksReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.num_parts = int(options.get("partitions", 8))

    def partitions(self):
        # round-robin striping: partition p owns rows p, p+P, p+2P, ...
        # so every partition generates ~n/P rows independently of the
        # others — no coordination, no skew
        return [InputPartition(p) for p in range(self.num_parts)]

    def read(self, partition):
        p = partition.value
        for i in range(p, self.n, self.num_parts):
            yield (i, f"s{i % 5}", (i * KNUTH) % 100000)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SyntheticTicksDataSource)
