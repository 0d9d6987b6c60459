"""Stage 3 — catalog maintenance / SQL passthrough (SURVEY §2 O19).

The reference submits SQL to Amazon Athena via boto3 with a 1 s polling
loop (``Main.py:277-321``) and uses it for exactly one statement:
``MSCK REPAIR TABLE {table}`` partition discovery (``Main.py:332``).
Spark SQL supports the identical statement text against its own
(Hive-compatible) catalog, synchronously — the polling loop vanishes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def run_sql(spark: SparkSession, query: str, database: str | None = None) -> bool:
    """SQL passthrough (reference ``run_athena_query``, ``Main.py:277-321``).

    Returns True on success, False on failure — the reference's boolean
    contract.  Spark SQL execution is synchronous; no polling needed.
    """
    try:
        if database:
            spark.catalog.setCurrentDatabase(database)
        spark.sql(query)
        return True
    except Exception as exc:
        print(f"SQL execution failed: {exc}")
        return False


def index_table(spark: SparkSession, database: str, table: str) -> bool:
    """Partition discovery (reference ``index_data_in_athena``,
    ``Main.py:324-339``) — same statement text, run by Spark SQL."""
    return run_sql(spark, f"MSCK REPAIR TABLE {table}", database)


def save_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key.

    Two tables bucketed identically on the join key co-locate: repeated
    joins and aggregations on that key run with ZERO exchange — the
    decisive layout optimization for hot 100 TB join keys (asserted in
    tests/test_bucketing.py)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def register_external_table(
    spark: SparkSession,
    name: str,
    location: str,
    schema_ddl: str,
    partition_cols: list[str] | None = None,
) -> None:
    """Create a partitioned external parquet table over an existing layout,
    then discover its partitions — the full Athena/Glue flow the reference
    delegates to AWS, expressed in Spark DDL."""
    parts = f" PARTITIONED BY ({', '.join(partition_cols)})" if partition_cols else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({schema_ddl}) USING PARQUET{parts} "
        f"LOCATION '{location}'"
    )
    if partition_cols:
        spark.sql(f"MSCK REPAIR TABLE {name}")
