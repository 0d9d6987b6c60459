from project_market_pulse_etl_pipeline_with_llm_integration_spark.functions.columns import (
    cosine_similarity,
    norm_text,
    token_count,
    tokens,
)

__all__ = ["tokens", "token_count", "norm_text", "cosine_similarity"]
