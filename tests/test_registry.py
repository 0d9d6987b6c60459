"""Driver-contract meta-tests: the queries()/oracle_sql() registry obeys
its own rules — every oracle key names a query, and the rows-only set
(entries the driver can only count, not hash) is EXACTLY the documented
allowlist, each member carrying a driver-checkable companion row.  A new
operator landing without an oracle breaks this test, not the next
round's verdict."""

from __future__ import annotations

import __spark_entry__ as entrymod

# Every rows-only entry and WHY it has no SQL oracle, plus its
# driver-visible quality-contract companion (all companions ARE
# oracle-backed and hash-checked).
ROWS_ONLY_ALLOWLIST = {
    "agg_approx_distinct": "hll_error_bound",       # sketch is engine-defined
    "agg_approx_percentile": "percentile_error_bound",
    "ann_ivf": "ann_recall",                        # kmeans init engine-side
    "ann_lsh": "ann_recall",                        # plane draws engine-side
    "curation_pipeline": "curation_law",            # composes rows-only stages
    "dedup_clusters": "cluster_invariants",         # xxhash64 not in DuckDB
    "dedup_corpus": "corpus_survivor_law",
    "dedup_minhash": "minhash_quality",
    "dedup_simhash": "simhash_quality",
    "embedding_dedup_corpus": "embedding_corpus_law",
    "embedding_near_dup": "embedding_neardup_recall",
    "exact_sample": "sample_invariants",            # seeded RNG engine-side
    "multimodal_features": "multimodal_shape_law",  # stub decode engine-side
}


def test_every_oracle_names_a_query():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q, f"orphan oracles: {o - q}"


def test_rows_only_set_is_exactly_the_allowlist():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert q - o == set(ROWS_ONLY_ALLOWLIST), (
        "rows-only entries drifted — a new operator shipped without an "
        f"oracle: {sorted((q - o) ^ set(ROWS_ONLY_ALLOWLIST))}"
    )


def test_every_rows_only_entry_has_an_oracle_backed_companion():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    for entry, companion in ROWS_ONLY_ALLOWLIST.items():
        assert companion in q and companion in o, (entry, companion)


def test_driver_window_is_50_unique_entries():
    names = list(entrymod.queries())
    assert len(names) == len(set(names))
    assert len(names) >= 50


def test_every_query_output_schema_is_atomic(spark):
    sf_dir = "/root/testdata/sf0.001"
    """The driver's canonicalizer pandas-sorts result columns before
    hashing, which raises ``unhashable type: 'list'`` on any
    array/map/struct output (round-7 red row: jl_projection).  Building
    each plan is cheap (no execution); the schema must be atomic-only.
    Serialize composite results (concat_ws CSV / to_json) instead."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = []
    for name, fn in entrymod.queries().items():
        schema = fn(spark, sf_dir).schema
        nonatomic = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if nonatomic:
            bad.append((name, nonatomic))
    assert not bad, f"non-atomic output columns (driver canon crashes): {bad}"
