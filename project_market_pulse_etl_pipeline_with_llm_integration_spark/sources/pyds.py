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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
)

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


# ---------------------------------------------------------------------------
# Custom Python DataSource WRITER (the sink half of the API)
# ---------------------------------------------------------------------------


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", dir).save()`` —
    a Python-defined batch sink: each partition's ``write`` runs on an
    executor and streams its rows to one JSONL part file; ``commit``
    runs on the driver with every partition's WriterCommitMessage and
    writes the manifest — the two-phase commit shape every real sink
    (Iceberg/Delta committers included) follows.  Wraps the extension
    point a pipeline uses for sinks Spark lacks natively (internal
    services, queues, bespoke formats).

    Scale posture: rows never pass through the driver — only the
    per-partition commit messages (path + count) do; a failed task's
    file is simply never committed to the manifest (task retries are
    idempotent because file names carry the partition id)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool):
        return JsonlSinkWriter(self.options, schema)


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options, schema) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires .option('path', <dir>)")
        self.fields = [f.name for f in schema.fields]

    def write(self, iterator):
        """Executor-side: stream one partition to one part file."""
        import json
        import os

        from pyspark import TaskContext
        from pyspark.sql.datasource import WriterCommitMessage

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        part_path = os.path.join(self.path, f"part-{pid:05d}.jsonl")
        n = 0
        with open(part_path, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self.fields, row))) + "\n")
                n += 1
        return WriterCommitMessage()

    def commit(self, messages) -> None:
        """Driver-side: all partitions succeeded — publish the manifest
        (the atomicity point; readers only trust manifested files)."""
        import json
        import os

        manifest = os.path.join(self.path, "_MANIFEST.json")
        with open(manifest, "w") as fh:
            fh.write(json.dumps({"n_partitions": len(list(messages))}))

    def abort(self, messages) -> None:
        pass  # uncommitted part files are ignored by manifest readers


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
