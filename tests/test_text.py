"""Text-analysis operator semantics on constructed strings."""

from __future__ import annotations

from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators import text


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_text_stats(spark):
    df = _docs(spark, ["one two two three", "solo", ""])
    rows = {r.doc_id: r for r in text.with_text_stats(df).collect()}
    assert rows[0].n_tokens == 4
    assert rows[0].n_distinct_tokens == 3
    assert rows[0].distinct_ratio == 0.75
    assert rows[1].n_tokens == 1
    assert rows[2].n_tokens == 0 and rows[2].distinct_ratio == 0.0


def test_quality_score_bounds(spark):
    df = _docs(spark, ["word " * 100, "a a a a a a", "diverse tokens make a better doc score"])
    rows = {r.doc_id: r.quality_score for r in text.with_quality_score(df).collect()}
    assert all(0.0 <= v <= 1.0 for v in rows.values())
    assert rows[2] > rows[1]  # diversity rewarded


def test_lang_id(spark):
    df = _docs(
        spark,
        [
            "the cat and the dog sat in a house of cards",
            "el perro y la casa de los gatos que ladran",
            "le chat et les maisons des gens un jour",
            "der hund und die katze das ein nicht haus",
            "zzz qqq xxx",
        ],
    )
    rows = {r.doc_id: r.pred_lang for r in text.with_lang_id(df).collect()}
    assert rows == {0: "en", 1: "es", 2: "fr", 3: "de", 4: "und"}


def test_fingerprint_whitespace_case_invariant(spark):
    df = _docs(spark, ["Hello   World", "hello world", "hello worlds"])
    rows = {r.doc_id: r.fingerprint for r in text.with_fingerprint(df).collect()}
    assert rows[0] == rows[1] != rows[2]
