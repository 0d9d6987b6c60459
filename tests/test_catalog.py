"""O19 catalog-maintenance parity: external table + MSCK REPAIR
partition discovery (the reference's Athena load stage, Main.py:324-339,
expressed in Spark DDL)."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_market_pulse_etl_pipeline_with_llm_integration_spark.plans.catalog import (
    index_table,
    register_external_table,
)
from tests.conftest import SF_SMALL


def test_external_table_msck_discovers_partitions(spark, tmp_path):
    loc = str(tmp_path / "cust_ext")
    src = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    src.write.partitionBy("c_mktsegment").parquet(loc)

    spark.sql("DROP TABLE IF EXISTS cust_ext")
    register_external_table(
        spark,
        "cust_ext",
        loc,
        "c_custkey BIGINT, c_name STRING, c_nationkey BIGINT, c_acctbal DOUBLE",
        partition_cols=["c_mktsegment STRING"],
    )
    try:
        n_parts = spark.sql("SHOW PARTITIONS cust_ext").count()
        assert n_parts == src.select("c_mktsegment").distinct().count()
        got = spark.table("cust_ext").count()
        assert got == src.count()
        # partition pruning through the catalog table
        one = spark.table("cust_ext").filter(F.col("c_mktsegment") == "BUILDING")
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        # re-running discovery (the reference's repeated `load` stage) is
        # idempotent
        assert index_table(spark, "default", "cust_ext") is True
        assert spark.sql("SHOW PARTITIONS cust_ext").count() == n_parts
    finally:
        spark.sql("DROP TABLE IF EXISTS cust_ext")


def test_analyze_table_stats_feed_cbo(spark, tmp_path):
    """ANALYZE TABLE COMPUTE STATISTICS populates catalog stats
    (rowCount/sizeInBytes visible in DESC EXTENDED) — the CBO input a
    100 TB deployment maintains so join planning can stop guessing
    from file sizes."""
    loc = str(tmp_path / "nat_tbl")
    spark.read.parquet(f"{SF_SMALL}/nation.parquet").write.parquet(loc)
    spark.sql("DROP TABLE IF EXISTS nat_tbl")
    spark.sql(
        "CREATE TABLE nat_tbl (n_nationkey BIGINT, n_name STRING, "
        f"n_regionkey BIGINT) USING parquet LOCATION '{loc}'"
    )
    try:
        spark.sql("ANALYZE TABLE nat_tbl COMPUTE STATISTICS")
        desc = {
            r.col_name: r.data_type
            for r in spark.sql("DESC EXTENDED nat_tbl").collect()
        }
        stats = desc.get("Statistics", "")
        assert "rows" in stats and "bytes" in stats
        n = spark.table("nat_tbl").count()
        assert f"{n} rows" in stats
    finally:
        spark.sql("DROP TABLE IF EXISTS nat_tbl")
