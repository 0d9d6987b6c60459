"""Bucketed-table joins must run without a shuffle (the 100 TB layout
story in SCALE.md, demonstrated on the real catalog)."""

from __future__ import annotations

from project_market_pulse_etl_pipeline_with_llm_integration_spark.plans.catalog import (
    save_bucketed,
)
from tests.conftest import SF_SMALL


def test_bucketed_join_has_no_exchange(spark):
    # NB: tables land in the session's spark-warehouse (gitignored);
    # warehouse dir is a static conf and can't be retargeted per-test.
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    save_bucketed(orders, "orders_b", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"])
    save_bucketed(
        lineitem, "lineitem_b", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"]
    )
    try:
        joined = spark.sql(
            """
            SELECT /*+ MERGE(o) */ o.o_orderkey, o.o_totalprice, l.l_linenumber
            FROM orders_b o JOIN lineitem_b l ON o.o_orderkey = l.l_orderkey
            """
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # sanity: result matches the plain (shuffled) join
        plain = lineitem.join(orders, orders.o_orderkey == lineitem.l_orderkey).count()
        assert joined.count() == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
