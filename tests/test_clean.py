"""Stage-1 fidelity tests vs the reference semantics (SURVEY §3.1)."""

from __future__ import annotations

import glob

from pyspark.sql import types as T

from project_market_pulse_etl_pipeline_with_llm_integration_spark.config import CLEAN_COLUMNS
from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.clean import (
    clean_news,
    extract_and_clean,
)
from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.ids import with_dense_id
from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import (
    read_news_jsonl,
)


def test_clean_semantics(spark, news_jsonl):
    out = clean_news(read_news_jsonl(spark, news_jsonl)).orderBy("id_news")
    rows = out.collect()
    # 5 of 10 fixture rows survive (category filter, null drops, bad date).
    assert [r.title for r in rows] == ["E", "B", "C", "A", "D"]
    # dense 1-based ids in (publish_date, link) order; tie B<C by link
    assert [r.id_news for r in rows] == [1, 2, 3, 4, 5]
    # empty-string content is kept (reference keeps "" — only nulls drop)
    assert rows[1].content == ""
    assert out.columns == CLEAN_COLUMNS
    assert isinstance(out.schema["publish_date"].dataType, (T.TimestampType, T.TimestampNTZType))
    assert isinstance(out.schema["id_news"].dataType, T.LongType)


def test_clean_id_methods_agree(spark, news_jsonl):
    raw = read_news_jsonl(spark, news_jsonl)
    a = clean_news(raw, id_method="offsets").orderBy("id_news").collect()
    b = clean_news(raw, id_method="window").orderBy("id_news").collect()
    assert a == b


def test_dense_id_offsets_scalable(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    out = with_dense_id(df, ["k"], id_col="rid", method="offsets", num_partitions=16)
    got = out.orderBy("k").select("rid").collect()
    assert [r.rid for r in got] == list(range(1, 10_001))


def test_extract_and_clean_writes_parquet(spark, news_jsonl, tmp_path):
    path = extract_and_clean(spark, news_jsonl, str(tmp_path), single_file=True)
    assert path is not None and path.startswith(str(tmp_path))
    back = spark.read.parquet(path)
    assert back.count() == 5
    assert back.columns == CLEAN_COLUMNS
    assert glob.glob(f"{path}/*.parquet")


def test_clean_returns_none_on_bad_input(spark, tmp_path):
    assert extract_and_clean(spark, "/nonexistent/nope.jsonl", str(tmp_path)) is None


def test_clean_observed_metrics_match_reference_counts(spark):
    """Observation-instrumented clean: metrics ride the job itself (no
    extra count() scans) and must equal the known reference dataset
    funnel — 1,056 raw rows in, 463 survivors, 5 kept categories."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.clean import (
        clean_news_observed,
    )
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import (
        read_news_jsonl,
    )

    raw = read_news_jsonl(spark, "/root/reference/News_Category_Dataset_v3.json")
    out, obs = clean_news_observed(raw)
    n = out.count()  # the action the metrics ride on
    assert n == 463
    assert obs["in"].get["rows_in"] == 1056
    assert obs["kept"].get["rows_kept"] == 463
    # approx_count_distinct (observe() forbids DISTINCT aggs): the
    # HLL estimate at rsd=0.05 may be off by one at tiny cardinality
    assert abs(obs["kept"].get["n_categories"] - 5) <= 1
