"""As-of join and connected-components cluster semantics on constructed
inputs (the real-data oracle check runs via tools/check_oracle.py)."""

from __future__ import annotations

from datetime import datetime

from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.dedup import (
    dup_clusters,
)


def _ts(s: int):
    return datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_semantics(spark, tmp_path, monkeypatch):
    """Each click picks the latest view at-or-before it, per user."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.relational import (
        q_join_asof,
    )

    rows = [
        # user 1: view@1, view@5, click@3 -> view@1 ; click@5 -> view@5 (ties: >=)
        (10, _ts(1), 1, "view", 0.0, "{}"),
        (11, _ts(5), 1, "view", 0.0, "{}"),
        (12, _ts(3), 1, "click", 0.0, "{}"),
        (13, _ts(5), 1, "click", 0.0, "{}"),
        # user 2: click@2 with no prior view -> dropped
        (14, _ts(2), 2, "click", 0.0, "{}"),
        (15, _ts(9), 2, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/events.parquet")
    out = {r.click_id: r.asof_view_id for r in q_join_asof(spark, sf_dir).collect()}
    assert out == {12: 10, 13: 11}


def test_dup_clusters_components(spark):
    """Chain 1-2-3, pair 10-11, singleton edgeless nodes excluded."""
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.8), (10, 11, 0.95)], "id_a long, id_b long, jaccard double"
    )
    out = {r.id: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dup_clusters_long_chain_converges_logarithmically(spark):
    """A 40-node path graph converges within ~log2(diameter) rounds via
    pointer jumping — one-hop propagation would need 40 rounds and the
    old cap of 20 would have returned silently-wrong labels."""
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(40)], "id_a long, id_b long, jaccard double"
    )
    out = {r.id: r.cluster_id for r in dup_clusters(pairs, max_iterations=10).collect()}
    assert set(out.values()) == {0}
    assert len(out) == 41


def test_dup_clusters_raises_on_nonconvergence(spark):
    """Hitting the iteration cap with labels still moving must be loud,
    not a silently-unconverged labeling."""
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(40)], "id_a long, id_b long, jaccard double"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(pairs, max_iterations=1)


def test_asof_nearest_semantics(spark, tmp_path):
    """Nearest looks both ways; exact ties prefer backward; equal-ts
    ties take max id backward / min id forward."""
    from datetime import timedelta

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.relational import (
        q_join_asof_nearest,
    )

    def _tsec(s):
        return datetime(2024, 1, 1) + timedelta(seconds=s)

    rows = [
        # user 1: views @100 (id 10) and @200 (id 20)
        (10, _tsec(100), 1, "view", 0.0, "{}"),
        (20, _tsec(200), 1, "view", 0.0, "{}"),
        (1, _tsec(140), 1, "click", 0.0, "{}"),   # d 40 back vs 60 fwd -> 10
        (2, _tsec(160), 1, "click", 0.0, "{}"),   # d 60 back vs 40 fwd -> 20
        (3, _tsec(150), 1, "click", 0.0, "{}"),   # exact tie -> backward 10
        # user 2: two views at the SAME ts 100 (ids 30, 31)
        (30, _tsec(100), 2, "view", 0.0, "{}"),
        (31, _tsec(100), 2, "view", 0.0, "{}"),
        (4, _tsec(100), 2, "click", 0.0, "{}"),   # d=0 backward -> max id 31
        (5, _tsec(50), 2, "click", 0.0, "{}"),    # future only -> min id 30
        # user 3: no views -> dropped
        (6, _tsec(10), 3, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.parquet(f"{tmp_path}/events.parquet")
    out = {
        r.click_id: (r.nearest_view_id, r.abs_diff_us)
        for r in q_join_asof_nearest(spark, str(tmp_path)).collect()
    }
    assert out == {
        1: (10, 40_000_000),
        2: (20, 40_000_000),
        3: (10, 50_000_000),
        4: (31, 0),
        5: (30, 50_000_000),
    }
