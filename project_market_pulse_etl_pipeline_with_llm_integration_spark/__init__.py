"""PySpark-native analytics/ETL engine with the query and data-processing
capabilities of jdovalle10/Project-Market-Pulse-ETL-Pipeline-with-LLM-Integration
(reference at /root/reference, MIT).

The reference is a single-process pandas ETL (clean -> LLM-enrich -> Athena
load, ``Main.py:378-402``).  This package re-expresses every operator it
implements — plus the standard relational / dedup / similarity / text /
streaming surface a large-scale LLM-data pipeline needs — as lazy, Catalyst-
optimized PySpark DataFrame plans designed for multi-executor clusters at
the 100 TB scale (broadcast joins for dims, range partitioning for total
orders, AQE for skew, no driver-side materialization in any operator).

Layout:
  sources/    schema'd readers + run-timestamped writers (SURVEY §2 O1-O3)
  operators/  clean stage, dense ids, sampling, enrichment UDF, relational
              library, dedup, similarity, text analysis, multimodal plumbing
  functions/  reusable column expression helpers (pure pyspark.sql.functions)
  plans/      catalog maintenance (MSCK REPAIR — SURVEY §2 O19)
  streaming/  Structured Streaming over event streams (SURVEY §2.2 extension)
"""

from project_market_pulse_etl_pipeline_with_llm_integration_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
