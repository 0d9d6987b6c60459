from project_market_pulse_etl_pipeline_with_llm_integration_spark.plans.catalog import (
    index_table,
    register_external_table,
    run_sql,
)

__all__ = ["run_sql", "index_table", "register_external_table"]
