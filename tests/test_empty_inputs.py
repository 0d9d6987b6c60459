"""Degenerate-input hardening: library operators over EMPTY frames must
return empty results with the right schema, not crash — at 100 TB a
partition-pruned read or an over-tight filter routinely hands an
operator zero rows, and a stage that dies on empty input kills the job."""

from __future__ import annotations

from pyspark.sql import types as T

from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators import (
    dedup,
    graph,
    market,
)


def _empty_events(spark):
    return spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
            ]
        ),
    )


def test_ohlc_empty(spark):
    out = market.ohlc_bars(_empty_events(spark))
    assert out.count() == 0
    assert set(out.columns) == {
        "series", "bar_hour", "open", "high", "low", "close", "volume", "sum_value"
    }


def test_attribution_empty(spark):
    assert market.attribution_last_touch(_empty_events(spark)).count() == 0


def test_market_basket_empty(spark):
    li = spark.createDataFrame(
        [], T.StructType([
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
        ])
    )
    assert market.market_basket_pairs(li).count() == 0
    assert graph.copurchase_edges(li).count() == 0


def test_pagerank_empty_edges(spark):
    edges = spark.createDataFrame(
        [], T.StructType([
            T.StructField("src", T.LongType()),
            T.StructField("dst", T.LongType()),
        ])
    )
    assert graph.pagerank_fixed_point(edges, iters=2).count() == 0


def test_dedup_exact_empty(spark):
    docs = spark.createDataFrame(
        [], T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ])
    )
    # exact dedup / jaccard / containment over an empty corpus
    assert dedup.exact_dedup(docs).count() == 0
    assert dedup.jaccard_pairs(docs).count() == 0
    assert dedup.containment_pairs(docs).count() == 0


def _empty_docs(spark):
    return spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
                T.StructField("lang", T.StringType()),
                T.StructField("source", T.StringType()),
            ]
        ),
    )


def test_session5_library_ops_empty(spark):
    """Session-5 library operators over empty frames: empty out, right
    schema, no crash."""
    from pyspark.sql import functions as F

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators import (
        relational as R,
        text as Tx,
    )

    docs = _empty_docs(spark)
    assert Tx.pmi_pairs(docs).count() == 0
    assert Tx.dsir_scores(docs, F.col("lang") != "en").count() == 0
    empty_keys = docs.select("doc_id")
    out = R.rendezvous_assign(empty_keys, "doc_id", 8)
    assert out.count() == 0
    assert set(out.columns) == {"doc_id", "shard", "shard_weight"}


def test_winnow_pairs_empty(spark):
    docs = spark.createDataFrame(
        [], T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ])
    )
    out = dedup.winnow_pairs(docs)
    assert out.count() == 0
    assert set(out.columns) == {"id_a", "id_b", "n_shared"}


def test_round7_late_ops_empty(spark):
    """classifier_auc path and phrase_search over empty frames: empty
    out, right schema, no crash."""
    import pyspark.sql.types as T

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators import (
        text as Tx,
    )

    docs = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
                T.StructField("source", T.StringType()),
            ]
        ),
    )
    out = Tx.phrase_search(docs, ["a b c"])
    assert out.count() == 0
    assert out.columns == ["phrase", "doc_id", "source", "n_hits"]


def test_round8_late_ops_empty(spark):
    """bradley_terry over an empty comparison stream and
    kcenter_coreset over an empty embedding table: empty out, right
    schema, no crash (the seed limit(1) is empty, so no center rows)."""
    import pyspark.sql.types as T

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators import (
        analytics as A,
        similarity as S,
    )

    comps = spark.createDataFrame(
        [], T.StructType([
            T.StructField("winner", T.StringType()),
            T.StructField("loser", T.StringType()),
        ])
    )
    out = A.bradley_terry_ratings(comps)
    assert out.count() == 0
    assert out.columns == ["item", "rating_micro", "n_wins", "n_losses", "n_comp"]

    emb = spark.createDataFrame(
        [], T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ])
    )
    kout = S.kcenter_coreset(emb, k=3)
    assert kout.count() == 0
    assert kout.columns == ["sel_round", "center_id", "d2_prior", "coverage_d2"]


def test_session8_new_ops_empty(spark):
    """Round-8 second-batch operators over empty inputs: empty output,
    right schema, no crash."""
    import pyspark.sql.types as T

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators import (
        dedup as D,
        graph as G,
        similarity as S,
        text as X,
    )

    docs = spark.createDataFrame(
        [], T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
        ])
    )
    assert D.source_minhash_overlap(docs).count() == 0
    cov = D.duplicated_ngram_coverage(docs)
    assert cov.count() == 0
    assert cov.columns == [
        "doc_id", "n_tokens", "n_windows", "n_dup_windows",
        "covered_tokens", "coverage_ppm",
    ]
    tag = X.dictionary_tag(docs)
    assert tag.count() == 0
    assert tag.columns[-1] == "dominant"

    edges = spark.createDataFrame(
        [], T.StructType([
            T.StructField("a", T.LongType()),
            T.StructField("b", T.LongType()),
        ])
    )
    lp = G.link_prediction_ra(edges)
    assert lp.count() == 0
    assert lp.columns == ["part_a", "part_b", "n_common", "ra_score_e9", "lp_rank"]

    emb = spark.createDataFrame(
        [], T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ])
    )
    km = S.kmeans_topics(emb, k=3, rounds=2)
    assert km.count() == 0
    assert km.columns == ["cluster_id", "n_points", "inertia", "centroid_csv"]


def test_session8_batch34_ops_empty(spark):
    """churn / bandit-replay / manifest / span-mask over empty inputs."""
    import pyspark.sql.types as T

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators import (
        analytics as A,
        dedup as D,
    )

    ev = spark.createDataFrame(
        [], T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ])
    )
    assert A.weekly_churn(ev).count() == 0
    assert A.bandit_replay(ev).count() == 0

    docs = spark.createDataFrame(
        [], T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
        ])
    )
    assert D.corpus_manifest(docs).count() == 0
    mask = D.dup_span_mask(docs)
    assert mask.count() == 0
    assert mask.columns == ["doc_id", "span_start", "span_end_excl", "span_len"]


def test_pq_ops_empty(spark):
    import pyspark.sql.types as T

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators import (
        similarity as S,
    )

    emb = spark.createDataFrame(
        [], T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ])
    )
    enc = S.pq_encode(emb, m=8, k=4, rounds=1)
    assert enc.count() == 0
    assert enc.columns == ["vec_id", "code_csv", "recon_d2"]
    adc = S.pq_adc_topk(emb)
    assert adc.count() == 0
    assert adc.columns == ["query_id", "vec_id", "adc_d2", "adc_rank"]


def test_freshness_empty(spark):
    """An empty event stream yields an empty freshness table (the
    watermark max over empty state is NULL; no rows reach the ppm)."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.analytics import (
        freshness_from_state,
        freshness_state,
    )

    out = freshness_from_state(freshness_state(_empty_events(spark)))
    assert out.count() == 0
    assert set(out.columns) == {
        "event_type", "last_ts", "staleness_s", "n_events",
        "event_share_ppm",
    }


def test_supply_state_empty(spark):
    """Empty lineitem -> empty per-(brand, supplier) state -> empty
    HHI table with the full output schema."""
    from pyspark.sql import types as T2

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.market import (
        supply_concentration_from_state,
        supply_state,
    )

    li = spark.createDataFrame(
        [], T2.StructType([
            T2.StructField("l_partkey", T2.LongType()),
            T2.StructField("l_suppkey", T2.LongType()),
            T2.StructField("l_extendedprice", T2.DoubleType()),
            T2.StructField("l_discount", T2.DoubleType()),
        ])
    )
    pt = spark.createDataFrame(
        [(1, "B1")], "p_partkey long, p_brand string"
    )
    out = supply_concentration_from_state(supply_state(li, pt))
    assert out.count() == 0
    assert set(out.columns) == {
        "p_brand", "n_suppliers", "total_cents", "top_suppkey",
        "top_cents", "top_share_ppm", "hhi_ppm",
    }


def test_return_state_empty(spark):
    """Empty lineitem -> empty return-rate table, schema intact."""
    from pyspark.sql import types as T2

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.market import (
        return_rate_from_state,
        return_state,
    )

    li = spark.createDataFrame(
        [], T2.StructType([
            T2.StructField("l_partkey", T2.LongType()),
            T2.StructField("l_returnflag", T2.StringType()),
            T2.StructField("l_extendedprice", T2.DoubleType()),
            T2.StructField("l_discount", T2.DoubleType()),
        ])
    )
    pt = spark.createDataFrame(
        [(1, "B1")], "p_partkey long, p_brand string"
    )
    out = return_rate_from_state(return_state(li, pt))
    assert out.count() == 0
    assert set(out.columns) == {
        "p_brand", "n_lines", "n_returned", "cents", "ret_cents",
        "line_return_ppm", "revenue_return_ppm",
    }
