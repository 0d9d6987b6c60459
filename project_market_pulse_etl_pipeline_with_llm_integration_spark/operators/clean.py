"""Stage 1 — extraction & cleaning (reference ``Main.py:130-182``).

One lazy Catalyst plan replacing the reference's eager step-by-step
pandas pipeline:

    scan(JSONL, pinned schema)            # O1, Main.py:147
    -> rename to canonical contract       # O4, Main.py:153
    -> drop null title/content/category   # O5, Main.py:156
    -> keep 5 market categories (IN)      # O6, Main.py:43,157
    -> safe string->timestamp cast        # O7, Main.py:160 (coerce->null)
    -> drop null publish_date             # O5, Main.py:161
    -> dense 1-based id by publish_date   # O8+O9, Main.py:164-165
    -> final projection (drops authors)   # O10, Main.py:169
    -> timestamped parquet sink           # O3, Main.py:172-177

Catalyst pushes the null/IN filters into the JSON scan and prunes
``authors`` at the source — the reference materializes everything first
(SURVEY §4).  The only shuffle in the plan is the range partitioning for
the dense id.  Semantics deltas vs pandas (documented, SURVEY §7):
tie-order among equal publish_dates is pinned with ``link``; timestamps
are µs not ns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_market_pulse_etl_pipeline_with_llm_integration_spark.config import (
    CATEGORIES_TO_KEEP,
    CLEAN_COLUMNS,
)
from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.ids import with_dense_id
from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import read_news_jsonl
from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.writers import (
    write_parquet_timestamped,
)


def clean_news(df_raw: DataFrame, id_method: str = "offsets") -> DataFrame:
    """Pure transformation: raw news rows -> clean contract (FIXTURES.md F2)."""
    renamed = df_raw.withColumnsRenamed(
        {"headline": "title", "short_description": "content", "date": "publish_date"}
    )
    essential = renamed.na.drop(subset=["title", "content", "category"])
    kept = essential.filter(F.col("category").isin(CATEGORIES_TO_KEEP))
    # try_to_timestamp == pd.to_datetime(errors="coerce"): invalid -> null.
    cast = kept.withColumn("publish_date", F.try_to_timestamp(F.col("publish_date")))
    dated = cast.na.drop(subset=["publish_date"])
    with_id = with_dense_id(dated, ["publish_date", "link"], id_col="id_news", method=id_method)
    return with_id.select(*CLEAN_COLUMNS)


def extract_and_clean(
    spark: SparkSession, input_path: str, output_folder: str, single_file: bool = False
) -> str | None:
    """CLI stage entry — read JSONL, clean, write timestamped parquet.

    Returns the written path, or None on error (reference contract,
    ``Main.py:179-182``).
    """
    try:
        df_raw = read_news_jsonl(spark, input_path)
        df_out = clean_news(df_raw)
        return write_parquet_timestamped(
            df_out, output_folder, "clean_data", single_file=single_file
        )
    except Exception as exc:  # mirror reference's defensive None-return
        print(f"Error in clean stage: {exc}")
        return None
