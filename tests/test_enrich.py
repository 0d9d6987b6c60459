"""Stage-2 enrichment tests — hermetic (no network): DISABLE_LLM offline
mode (reference ``Main.py:86-87``) plus an injected fake transport."""

from __future__ import annotations

import json
from datetime import datetime

import pytest

from project_market_pulse_etl_pipeline_with_llm_integration_spark.config import (
    CLEAN_COLUMNS,
    ENRICHED_EXTRA_COLUMNS,
    OFFLINE_TRIPLE,
)
from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators import enrich as E
from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.clean import clean_news
from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import (
    read_news_jsonl,
)


@pytest.fixture(autouse=True)
def _reset_transport():
    yield
    E.set_transport(None)


def _clean_df(spark, news_jsonl):
    return clean_news(read_news_jsonl(spark, news_jsonl))


def test_offline_mode(spark, news_jsonl, monkeypatch):
    monkeypatch.setenv("DISABLE_LLM", "1")
    ts = datetime(2026, 1, 1, 12, 0, 0)
    out = E.enrich(_clean_df(spark, news_jsonl), rate_delay=0.0, run_timestamp=ts)
    rows = out.orderBy("id_news").collect()
    assert out.columns == CLEAN_COLUMNS + ENRICHED_EXTRA_COLUMNS
    for r in rows:
        assert (r.sentiment_llm, r.category_llm, r.market_impact_summary) == OFFLINE_TRIPLE
        assert r.etl_processing_time == ts  # single literal, all rows equal


def test_fake_transport_parses_json(spark, news_jsonl, monkeypatch):
    monkeypatch.delenv("DISABLE_LLM", raising=False)

    def fake(prompt: str) -> str:
        assert "THREE data points in JSON format" in prompt
        return json.dumps({"sentiment": "Positive", "category": "TECH", "summary": "ok"})

    E.set_transport(fake)
    rows = E.enrich(_clean_df(spark, news_jsonl), rate_delay=0.0).collect()
    assert all(r.sentiment_llm == "Positive" and r.category_llm == "TECH" for r in rows)


def test_missing_keys_default_na(spark, news_jsonl, monkeypatch):
    monkeypatch.delenv("DISABLE_LLM", raising=False)
    E.set_transport(lambda p: json.dumps({"sentiment": "Neutral"}))
    r = E.enrich(_clean_df(spark, news_jsonl), rate_delay=0.0).collect()[0]
    assert (r.sentiment_llm, r.category_llm, r.market_impact_summary) == ("Neutral", "N/A", "N/A")


def test_error_sentinels_in_band(spark, news_jsonl, monkeypatch):
    monkeypatch.delenv("DISABLE_LLM", raising=False)

    def boom(prompt: str) -> str:
        raise RuntimeError("api down")

    E.set_transport(boom)
    r = E.enrich(_clean_df(spark, news_jsonl), rate_delay=0.0).collect()[0]
    assert (r.sentiment_llm, r.category_llm) == ("ERROR_API", "ERROR_API")
    assert r.market_impact_summary == "Error generating summary."


def test_unparseable_json_sentinel(spark, news_jsonl, monkeypatch):
    monkeypatch.delenv("DISABLE_LLM", raising=False)
    E.set_transport(lambda p: "this is not json")
    r = E.enrich(_clean_df(spark, news_jsonl), rate_delay=0.0).collect()[0]
    assert r.sentiment_llm == "ERROR_API"


def test_rate_limiter_global_budget(spark, news_jsonl, monkeypatch):
    """Concurrent task rates ADD, so the wall-clock floor for N rows is
    N*rate_delay regardless of parallelism: each of T tasks must sleep
    T*rate_delay per row (the inverted division would finish T^2x too
    fast and hammer the real API at T^2/rate_delay rows/s)."""
    import time

    from pyspark.sql import functions as F

    monkeypatch.setenv("DISABLE_LLM", "1")
    df = (
        spark.range(40)
        .select(
            F.concat(F.lit("t-"), F.col("id")).alias("title"),
            F.concat(F.lit("c-"), F.col("id")).alias("content"),
        )
        .repartition(4)
    )
    rate = 0.08  # global budget: 40 rows * 0.08 s/row = 3.2 s floor
    t0 = time.monotonic()
    n = E.enrich(df, rate_delay=rate, parallelism=4).count()
    elapsed = time.monotonic() - t0
    assert n == 40
    # 20% scheduling slack; the buggy divide-by-tasks math would sleep
    # only 0.2 s total and fail this floor by an order of magnitude.
    assert elapsed >= n * rate * 0.8


def test_enrich_to_parquet_roundtrip(spark, news_jsonl, tmp_path, monkeypatch):
    monkeypatch.setenv("DISABLE_LLM", "1")
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.clean import (
        extract_and_clean,
    )

    clean_path = extract_and_clean(spark, news_jsonl, str(tmp_path / "clean"))
    out = E.enrich_to_parquet(
        spark, clean_path, str(tmp_path / "enr"), sample_size=3, rate_delay=0.0
    )
    back = spark.read.parquet(out)
    assert back.count() == 3  # exact-N sample honored
    assert set(CLEAN_COLUMNS + ENRICHED_EXTRA_COLUMNS) == set(back.columns)


def _make_pure_transport():
    # nested closure: cloudpickle ships it BY VALUE, so Python workers
    # never need to import this test module
    def transport(prompt: str) -> str:
        import json as _json

        return _json.dumps(
            {"sentiment": ["Positive", "Negative", "Neutral"][len(prompt) % 3],
             "category": "TECH", "summary": f"len {len(prompt)}"}
        )

    return transport


def test_enrich_deduped_equals_enrich(spark):
    """The dedup gateway is output-identical to plain row-at-a-time
    enrichment under any pure-function transport, while enriching only
    DISTINCT payloads (dedup_payloads count pinned: 4 rows -> 2
    payloads -> 2 LLM units of work)."""
    rows = [
        (1, "t1", "same body"),
        (2, "t1", "same body"),      # exact duplicate payload
        (3, "t1", "same body"),      # triplicate
        (4, "t2", "other body"),
    ]
    df = spark.createDataFrame(rows, "id long, title string, content string")
    assert E.dedup_payloads(df).count() == 2
    ts = datetime(2024, 1, 1)
    kw = dict(rate_delay=0.0, run_timestamp=ts,
              transport=_make_pure_transport(), disabled=False)
    got = sorted(tuple(sorted(r.asDict().items())) for r in
                 E.enrich_deduped(df, **kw).collect())
    want = sorted(tuple(sorted(r.asDict().items())) for r in
                  E.enrich(df, **kw).collect())
    assert got == want and len(got) == 4
    # duplicates carry IDENTICAL triples (one call's answer, fanned out)
    by_id = {dict(t)["id"]: dict(t) for t in got}
    assert by_id[1]["market_impact_summary"] == by_id[3]["market_impact_summary"]


def test_enrich_deduped_null_payloads(spark):
    """NULL title/content coalesce into the digest key instead of
    vanishing: two all-NULL payload rows share one enrichment."""
    rows = [(1, None, None), (2, None, None), (3, "t", "c")]
    df = spark.createDataFrame(rows, "id long, title string, content string")
    assert E.dedup_payloads(df).count() == 2
    out = E.enrich_deduped(
        df, rate_delay=0.0, run_timestamp=datetime(2024, 1, 1),
        transport=_make_pure_transport(), disabled=False,
    )
    assert out.count() == 3


def _make_poison_transport():
    # proves zero LLM calls: ANY invocation raises in the worker and
    # the sentinel machinery would surface ERROR_API rows
    def transport(prompt: str) -> str:
        raise AssertionError("transport invoked on a cache hit")

    return transport


def test_enrich_with_cache_zero_calls_on_full_hit(spark):
    """Cross-run memoization contract: run 1 fills the cache; run 2
    over the same corpus runs with a POISONED transport (raises on any
    call) and still produces correct triples — proof that cache hits
    never reach the LLM.  The run-2 timestamp stamps every row."""
    rows = [(1, "t", "b1"), (2, "t", "b1"), (3, "t", "b2")]
    df = spark.createDataFrame(rows, "id long, title string, content string")
    ts1, ts2 = datetime(2024, 1, 1), datetime(2024, 1, 2)
    out1, cache1 = E.enrich_with_cache(
        df, None, rate_delay=0.0, run_timestamp=ts1,
        transport=_make_pure_transport(), disabled=False,
    )
    r1 = {r["id"]: r for r in out1.collect()}
    cache1 = spark.createDataFrame(cache1.collect(), cache1.schema)  # persist
    assert cache1.count() == 2  # unique payloads only
    out2, cache2 = E.enrich_with_cache(
        df, cache1, rate_delay=0.0, run_timestamp=ts2,
        transport=_make_poison_transport(), disabled=False,
    )
    r2 = {r["id"]: r for r in out2.collect()}  # would raise if any call
    assert len(r2) == 3
    for i in (1, 2, 3):
        assert r2[i]["sentiment_llm"] == r1[i]["sentiment_llm"]
        assert r2[i]["market_impact_summary"] == r1[i]["market_impact_summary"]
        assert r2[i]["etl_processing_time"] == ts2
    assert cache2.count() == 2  # nothing new


def test_enrich_with_cache_pays_only_for_new_content(spark):
    """An incremental ingest with one never-seen payload enriches
    exactly that payload: the transport accepts only the new body and
    raises on anything else."""
    df1 = spark.createDataFrame(
        [(1, "t", "old body")], "id long, title string, content string"
    )
    _, cache = E.enrich_with_cache(
        df1, None, rate_delay=0.0, run_timestamp=datetime(2024, 1, 1),
        transport=_make_pure_transport(), disabled=False,
    )
    cache = df1.sparkSession.createDataFrame(cache.collect(), cache.schema)

    def _make_picky():
        def transport(prompt: str) -> str:
            import json as _json

            assert prompt.endswith("new body"), "cached payload re-enriched"
            return _json.dumps(
                {"sentiment": "Positive", "category": "TECH", "summary": "new"}
            )

        return transport

    df2 = spark.createDataFrame(
        [(1, "t", "old body"), (2, "t", "new body")],
        "id long, title string, content string",
    )
    out2, cache2 = E.enrich_with_cache(
        df2, cache, rate_delay=0.0, run_timestamp=datetime(2024, 1, 2),
        transport=_make_picky(), disabled=False,
    )
    got = {r["id"]: r for r in out2.collect()}
    assert got[2]["market_impact_summary"] == "new"
    assert got[1]["sentiment_llm"] is not None
    assert cache2.count() == 2
