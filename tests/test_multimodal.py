"""Multimodal binary-column plumbing: schema, payload laws, stub decode."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators import multimodal


def test_payload_metadata_laws(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "")], "doc_id long, text string")
    rows = {r.doc_id: r for r in multimodal.with_binary_payload(df).collect()}
    assert rows[1].payload_len == 3
    assert bytes(rows[1].payload) == b"abc"
    assert rows[2].payload_len == 0


def test_extract_features_schema_and_shape(spark):
    df = multimodal.with_binary_payload(
        spark.createDataFrame([(1, "abcdefgh"), (2, "zz")], "doc_id long, text string")
    ).select("doc_id", "payload")
    out = multimodal.extract_features(df)
    assert isinstance(out.schema["features"].dataType, T.ArrayType)
    rows = {r.doc_id: r.features for r in out.collect()}
    assert len(rows[1]) == multimodal.FEATURE_DIM
    assert abs(sum(rows[1]) - 1.0) < 1e-6  # normalized histogram


def test_decode_stub_deterministic_and_gated(spark):
    assert multimodal.decode_stub(b"abc") == multimodal.decode_stub(b"abc")
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(b"abc", real_codec=True)
