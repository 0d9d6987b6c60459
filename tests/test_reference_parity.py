"""End-to-end reference-fidelity check on the reference's real input:
an independent pandas expression of the documented clean-stage contract
(SURVEY §3.1) must agree with the Spark plan row-for-row — including
the dense id assignment under the pinned (publish_date, link) order.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from project_market_pulse_etl_pipeline_with_llm_integration_spark.config import (
    CATEGORIES_TO_KEEP,
)
from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.clean import clean_news
from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import (
    read_news_jsonl,
)

REFERENCE_JSONL = "/root/reference/News_Category_Dataset_v3.json"


@pytest.mark.skipif(not os.path.exists(REFERENCE_JSONL), reason="reference dataset absent")
def test_clean_stage_matches_pandas_contract(spark):
    # independent pandas rendering of the documented contract
    raw = pd.read_json(REFERENCE_JSONL, lines=True)
    pdf = raw.rename(
        columns={"headline": "title", "short_description": "content", "date": "publish_date"}
    )
    pdf = pdf.dropna(subset=["title", "content", "category"])
    pdf = pdf[pdf["category"].isin(CATEGORIES_TO_KEEP)]
    pdf["publish_date"] = pd.to_datetime(pdf["publish_date"], errors="coerce")
    pdf = pdf.dropna(subset=["publish_date"])
    # pinned total order (SURVEY §7 risk 1): stable sort on (date, link)
    pdf = pdf.sort_values(["publish_date", "link"], kind="mergesort").reset_index(drop=True)
    pdf["id_news"] = pdf.index + 1

    got = clean_news(read_news_jsonl(spark, REFERENCE_JSONL)).orderBy("id_news").collect()

    assert len(got) == len(pdf) == 463
    for row, (_, exp) in zip(got, pdf.iterrows()):
        assert row.id_news == exp.id_news
        assert row.link == exp.link
        assert row.title == exp.title
        assert row.content == exp.content
        assert row.category == exp.category
        assert pd.Timestamp(row.publish_date) == exp.publish_date
