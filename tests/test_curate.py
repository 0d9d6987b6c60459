"""End-to-end curation pipeline composition (operators/curate.py)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_curation_funnel_laws(spark):
    """The composed pipeline must satisfy its funnel laws on the small
    testdata: monotone stage counts, final ⊆ clean, exhaustive split
    labels — and actually produce a non-empty curated corpus."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.curate import (
        curate_corpus,
        q_curation_law,
    )

    stages = curate_corpus(spark, SF_SMALL)
    n = {k: df.count() for k, df in stages.items()}
    order = ["docs", "admitted", "exact_surv", "near_surv", "clean", "final"]
    assert all(n[a] >= n[b] for a, b in zip(order, order[1:])), n
    assert n["final"] > 0
    law = q_curation_law(spark, SF_SMALL).collect()[0]
    assert law.funnel_monotone and law.subset_ok and law.splits_exhaustive
