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
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
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
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.groupBy("l_returnflag").agg(
        F.round(_weighted_mean("l_extendedprice", "l_quantity"), 4).alias("wavg_price")
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
    spark.read.parquet(f"{sf_dir}/part.parquet").createOrReplaceTempView("part_udtf")
    return spark.sql(
        "SELECT s.p_partkey, s.word FROM part_udtf, "
        "LATERAL split_type_words(p_partkey, p_type) s"
    )
