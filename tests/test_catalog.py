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
