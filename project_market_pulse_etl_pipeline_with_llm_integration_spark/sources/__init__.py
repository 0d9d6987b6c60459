from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import (
    load_tables,
    read_news_jsonl,
    read_parquet,
)
from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.writers import (
    write_parquet_timestamped,
)

__all__ = ["read_news_jsonl", "read_parquet", "load_tables", "write_parquet_timestamped"]
