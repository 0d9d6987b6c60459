"""Leakage-safe splitting, split contamination, incremental dedup, and
trimmed stats — the round-5 split-hygiene family.

The load-bearing test is the planted-duplicate one: a content-keyed
split must put every copy of a duplicated text in the SAME split (the
structural guarantee), while the id-keyed split scatters them (the bug
the operator exists to fix).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators import (
    analytics,
    dedup,
)
from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.sample import (
    dataset_split,
    leakage_safe_split,
)

from conftest import SF_SMALL


def _planted(spark, copies=40):
    """Corpus where one text is duplicated under many different ids —
    ids chosen dense so the naive id-keyed 90/5/5 split MUST scatter
    them across splits."""
    rows = [(i, f"unique document number {i} with its own words") for i in range(200)]
    dup_ids = range(200, 200 + copies)
    rows += [(i, "the exact same duplicated text appears here") for i in dup_ids]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_leakage_safe_split_keeps_duplicates_together(spark):
    docs = _planted(spark)
    safe = leakage_safe_split(docs)
    dup = safe.filter(F.col("text").contains("duplicated"))
    assert dup.select("split").distinct().count() == 1

    naive = dataset_split(docs, "doc_id").filter(
        F.col("text").contains("duplicated")
    )
    # 40 dense ids under a 90/5/5 ppm split: copies land in >1 split
    assert naive.select("split").distinct().count() > 1


def test_leakage_safe_split_partitions_are_exhaustive_and_disjoint(spark):
    docs = _planted(spark)
    out = leakage_safe_split(docs)
    assert out.count() == docs.count()
    assert set(
        r["split"] for r in out.select("split").distinct().collect()
    ) <= {"train", "val", "test"}


def test_split_leakage_law_row(spark):
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.sample import (
        q_split_leakage_law,
    )

    r = q_split_leakage_law(spark, SF_SMALL).collect()
    assert len(r) == 1
    assert r[0]["n_leaky_safe"] == 0
    assert r[0]["law_holds"] is True


def test_incremental_dedup_verdicts(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "totally unrelated corpus content lives here now"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            # exact copy of corpus doc 1 (different id)
            (100, "alpha beta gamma delta epsilon zeta eta theta"),
            # near: shares a long 5-gram run with doc 2
            (101, "one two three four five six seven ZZZ QQQ"),
            # unique
            (102, "completely novel text with fresh tokens only"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup.incremental_dedup(corpus, batch).collect()
    }
    assert out[100]["verdict"] == "exact" and out[100]["is_exact_dup"]
    assert out[101]["verdict"] == "near"
    assert out[101]["containment_ppm"] >= 500_000
    assert out[102]["verdict"] == "unique"
    assert out[102]["n_hit_grams"] == 0


def test_incremental_dedup_batch_side_broadcast(spark):
    """The corpus must never shuffle: both probes broadcast batch state."""
    plan = (
        dedup.q_dedup_incremental(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_trimmed_stats_small_exact(spark):
    # group 'a': values 1..100 -> k_lo=5, k_hi=95; p_lo=5, p_hi=95
    rows = [("a", i, i) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "source string, n_chars long, doc_id long")
    r = analytics.trimmed_stats(df, "source", "n_chars", "doc_id").collect()[0]
    assert (r["n_rows"], r["p_lo"], r["p_hi"]) == (100, 5, 95)
    # winsorized: 1..4 -> 5 (4 rows), 96..100 -> 95 (5 rows)
    expected_wins = sum(max(min(v, 95), 5) for v in range(1, 101))
    assert r["winsorized_sum"] == expected_wins
    assert r["trimmed_sum"] == sum(range(6, 96))
    assert r["trimmed_n"] == 90


def test_split_contamination_shape(spark):
    out = dedup.q_split_contamination(spark, SF_SMALL).collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r["n_contaminated"] <= r["n_train_docs"]
        if r["n_contaminated"] == 0:
            assert r["total_shared_ngrams"] == 0


def test_rag_retrieval_chunk_contract(spark):
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators import text

    rows = text.q_rag_retrieval(spark, SF_SMALL).collect()
    assert len(rows) == 20
    assert [r["bm_rank"] for r in rows] == list(range(1, 21))
    for r in rows:
        assert 1 <= r["dl"] <= 32  # chunk-level docs, never whole documents
        assert r["chunk_idx"] >= 0
    plan = (
        text.q_rag_retrieval(spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_stratified_kfold_contract(spark):
    """Every doc gets exactly one fold in [0,k); exact duplicates share
    a fold (the CV leakage guarantee); k<2 refuses."""
    import pytest

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.sample import (
        stratified_kfold,
    )

    docs = spark.createDataFrame(
        [(i, f"document body number {i % 7}", "s") for i in range(50)],
        ["doc_id", "text", "source"],
    )
    out = stratified_kfold(docs, k=5).collect()
    assert len(out) == 50
    folds_by_text = {}
    for r in out:
        assert 0 <= r.fold < 5
        folds_by_text.setdefault(r.text, set()).add(r.fold)
    # 7 distinct texts, each duplicated ~7x -> all copies in ONE fold
    assert all(len(s) == 1 for s in folds_by_text.values())
    with pytest.raises(ValueError):
        stratified_kfold(docs, k=1)


def test_epoch_shuffle_permutation_laws(spark):
    """Every epoch is a full permutation (counts sum to n_docs, shard
    sizes within 1, positions span 1..n), epochs are decorrelated
    (pairwise-distinct digest multisets), and the digest replays a
    pure-Python md5 walk of the same permutation."""
    import hashlib
    from collections import defaultdict

    from pyspark.sql import functions as F

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.sample import (
        epoch_shuffle,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    n_docs = docs.count()
    rows = epoch_shuffle(docs, n_epochs=3, n_shards=4).collect()
    by_epoch = defaultdict(list)
    for r in rows:
        by_epoch[r.epoch].append(r)
    assert set(by_epoch) == {0, 1, 2}
    for e, shards in by_epoch.items():
        assert sum(r.n_docs for r in shards) == n_docs
        sizes = [r.n_docs for r in shards]
        assert max(sizes) - min(sizes) <= 1
        assert min(r.first_pos for r in shards) == 1
        assert max(r.last_pos for r in shards) == n_docs
    digs = [tuple(sorted(r.perm_digest for r in by_epoch[e])) for e in (0, 1, 2)]
    assert len(set(digs)) == 3

    # pure-Python replay of epoch 1's permutation digest
    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    order = sorted(ids, key=lambda i: (h60(f"{i}:ep:1"), i))
    want = defaultdict(int)
    for pos, i in enumerate(order, start=1):
        want[(pos - 1) % 4] ^= h60(f"{pos}@{i}")
    got = {r.shard: r.perm_digest for r in by_epoch[1]}
    assert got == dict(want)


def test_mixture_waterfill_laws_and_hand_case(spark):
    """Water-filling invariants on a hand corpus (supplies 2/5/100 at a
    40% budget): the small sources cap at full supply, the giant gets
    the level, the budget is spent to within the floor remainder, and
    nobody exceeds their supply.  Saturation (budget >= supply) caps
    everyone."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.sample import (
        mixture_waterfill,
    )

    def corpus(sizes: dict):
        rows = [(src, " ".join(["w"] * n)) for src, n in sizes.items()]
        return spark.createDataFrame(rows, "source string, text string")

    out = {r.source: r for r in mixture_waterfill(corpus({"a": 2, "b": 5, "c": 100})).collect()}
    # total 107, budget = 107*0.4 = 42 (floor); a and b fit their fair
    # share -> capped; c gets the level (42-7)//1 = 35
    assert out["a"].capped and out["a"].alloc == 2
    assert out["b"].capped and out["b"].alloc == 5
    assert not out["c"].capped and out["c"].alloc == 35 == out["c"].water_level
    assert all(r.budget == 42 for r in out.values())
    spent = sum(r.alloc for r in out.values())
    n_uncapped = sum(1 for r in out.values() if not r.capped)
    assert spent <= 42 and 42 - spent < max(n_uncapped, 1)
    assert all(r.alloc <= r.supply for r in out.values())

    # saturation: budget >= total supply -> everyone capped at supply
    sat = {r.source: r for r in mixture_waterfill(corpus({"a": 3, "b": 4}), budget_ratio_ppm=2_000_000).collect()}
    assert all(r.capped and r.alloc == r.supply for r in sat.values())
    assert all(r.water_level is None for r in sat.values())
