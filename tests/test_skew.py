"""Salted join/agg must be result-identical to the plain operators on a
deliberately skewed dataset (one key holds 90% of rows)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _skewed(spark, n=20_000):
    # key 0 carries ~90% of rows; keys 1..99 share the rest
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise((F.col("id") % 99) + 1).alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )


def test_salted_join_matches_plain(spark):
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.skew import (
        salted_join,
    )

    big = _skewed(spark)
    small = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim-"), F.col("id")).alias("label")
    )
    plain = big.join(small, "k").groupBy("label").agg(
        F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("s")
    )
    salted = salted_join(big, small, "k", "k", salt_buckets=8).groupBy("label").agg(
        F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_agg_matches_plain(spark):
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.skew import (
        salted_agg,
    )

    df = _skewed(spark)
    plain = {
        r.k: (round(r.total, 2), r.cnt)
        for r in df.groupBy("k")
        .agg(F.round(F.sum("v"), 2).alias("total"), F.count("*").alias("cnt"))
        .collect()
    }
    salted = {r.k: (r.total, r.cnt) for r in salted_agg(df, "k", "v", salt_buckets=8).collect()}
    assert plain == salted


def test_dedup_corpus_removes_only_losers(spark):
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.dedup import (
        dedup_corpus,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}", "en", "s", 5) for i in range(6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(0, 3, 0.9), (3, 5, 0.9), (1, 2, 0.8)], "id_a long, id_b long, jaccard double"
    )
    kept = sorted(r.doc_id for r in dedup_corpus(docs, pairs).collect())
    assert kept == [0, 1, 4]  # survivors: 0 (cluster {0,3,5}), 1 (cluster {1,2}), 4 (untouched)


def test_salted_join_rejects_outer_how(spark):
    """right/full joins would emit unmatched small-side rows once per
    salt replica — the API refuses rather than silently duplicating."""
    import pytest

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.skew import (
        salted_join,
    )

    big = _skewed(spark, n=100)
    small = spark.range(10).select(F.col("id").alias("k"))
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            salted_join(big, small, "k", "k", how=how)
