"""Python UDF surface beyond the enrichment engine (SURVEY §2.2):
grouped-map (applyInPandas), grouped-aggregate pandas UDF (the UDAF
path), and a table function (UDTF).  Each exists to demonstrate the
full UDF taxonomy on the documented slow path — Arrow-batched, never
row-at-a-time Python in a hot loop.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import cached_scan


def zscore_per_group(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "z"
) -> DataFrame:
    """Grouped-map applyInPandas: per-group z-score normalization — the
    canonical feature-normalization operator for training pipelines.
    Each group becomes one pandas DataFrame on an executor (groups must
    fit in executor memory; partition count = #groups after the hash
    shuffle)."""
    out_schema = f"{group_col} string, id long, {out_col} double"

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf[value_col].mean()
        s = pdf[value_col].std(ddof=1)
        z = (pdf[value_col] - m) / s if s and s > 0 else pdf[value_col] * 0.0
        return pd.DataFrame(
            {group_col: pdf[group_col], "id": pdf["id"], out_col: z.round(4)}
        )

    return df.groupBy(group_col).applyInPandas(normalize, schema=out_schema)


def q_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = cached_scan(spark, f"{sf_dir}/customer.parquet").select(
        F.col("c_mktsegment"), F.col("c_custkey").alias("id"), F.col("c_acctbal")
    )
    return zscore_per_group(c, "c_mktsegment", "c_acctbal")


# typed returnType (not a DDL string): parsing "double" at import time
# would require an active SparkContext
@F.pandas_udf(T.DoubleType())
def _weighted_mean(price: pd.Series, qty: pd.Series) -> float:
    # grouped-aggregate pandas UDF == a Python UDAF over Arrow batches
    return float((price * qty).sum() / qty.sum())


def q_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted mean price per return flag via a grouped-agg
    pandas UDF (the Python-UDAF surface)."""
    li = cached_scan(spark, f"{sf_dir}/lineitem.parquet")
    return li.groupBy("l_returnflag").agg(
        F.round(_weighted_mean("l_extendedprice", "l_quantity"), 4).alias("wavg_price")
    )


# Scalar vectorized pandas UDF (Series -> Series): one Arrow batch in,
# one out — the 10-100x-over-row-at-a-time path for logic that truly
# needs Python.  (This particular formula is expressible as built-ins;
# it exists to pin the scalar-UDF surface with an exact SQL oracle.)
@F.pandas_udf(T.DoubleType())
def _charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
    return price * (1.0 - disc) * (1.0 + tax)


def q_scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H charge formula through the scalar Arrow-vectorized UDF.
    Rounded to 6 decimals: the true product of 2-decimal inputs has at
    most 6 decimal digits, so round-to-6 never sits on a tie boundary —
    rounding to 2 would split engines on .005 products (Spark rounds
    the shortest-decimal rendering, DuckDB the raw binary double)."""
    li = cached_scan(spark, f"{sf_dir}/lineitem.parquet")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(_charge("l_extendedprice", "l_discount", "l_tax"), 6).alias("charge"),
    )


def q_udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): explode part type strings into
    (p_partkey, word) rows via a lateral join — the user-defined
    analogue of built-in explode/unnest."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="p_partkey bigint, word string")
    class SplitTypeWords:
        def eval(self, partkey: int, p_type: str):
            for w in p_type.split(" "):
                yield partkey, w

    spark.udtf.register("split_type_words", SplitTypeWords)
    cached_scan(spark, f"{sf_dir}/part.parquet").createOrReplaceTempView("part_udtf")
    return spark.sql(
        "SELECT s.p_partkey, s.word FROM part_udtf, "
        "LATERAL split_type_words(p_partkey, p_type) s"
    )


def q_arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (Spark 4 ``useArrow=True``):
    rows reach Python as Arrow batches instead of pickled singletons —
    the cheap migration path for legacy row UDFs that can't be
    rewritten as pandas UDFs (10-100x serialization win, same per-row
    Python semantics).  The function parses the numeric id out of the
    customer name and computes an IBAN-style mod-97 check digit — pure
    integer arithmetic the DuckDB oracle replicates in SQL, proving
    the Arrow path is a transport change, not a semantics change.
    Completes the UDF taxonomy: row UDF (this, Arrow transport),
    scalar pandas UDF, grouped applyInPandas, pandas UDAF, UDTF,
    mapInPandas, mapInArrow."""
    from pyspark.sql.functions import udf

    @udf(returnType="bigint", useArrow=True)
    def check97(name: str) -> int:
        n = int(name.split("#")[1])
        return 98 - (n * 100) % 97

    cust = cached_scan(spark, f"{sf_dir}/customer.parquet")
    return cust.select(
        "c_custkey",
        F.expr("CAST(substring(c_name, 10, 50) AS BIGINT)").alias("numeric_id"),
        check97(F.col("c_name")).alias("check_digit"),
    )
