"""Exact-N seeded sampling (SURVEY §2 O11, reference ``Main.py:218-225``).

The reference draws an exact-n uniform sample with pandas' RNG
(``df.sample(n, random_state=42)``).  Pandas RNG identity cannot be
replayed cross-engine (SURVEY §7 risk #2), so the contract here is:
exact n rows, uniform, deterministic for a given (seed, input) — checked
by count/statistical properties, not row identity.

Implementation: order by ``rand(seed)`` and take ``n``.  Spark executes
this as a distributed TakeOrdered (per-partition top-n + driver merge of
n·partitions candidates), NOT a global sort — scalable for any n that
fits the driver's result budget.  For sample sizes that don't, use
``df.sample(fraction, seed)`` (approximate-n) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import cached_scan


def exact_sample(df: DataFrame, n: int | None, seed: int = 42) -> DataFrame:
    """Exact-n seeded uniform sample; passthrough when n is None or >= count.

    The reference only samples when ``n < len(df)`` (``Main.py:221``);
    ``limit`` naturally degrades to the full set in that case, so no
    extra count() pass is needed.
    """
    if n is None:
        return df
    n = int(n)
    return df.orderBy(F.rand(seed)).limit(n)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str,
) -> DataFrame:
    """Deterministic exact-N-per-stratum sample: rank rows inside each
    stratum by ``md5(key)`` (a uniform, engine-independent pseudo-random
    order — the hash_sample trick applied per group) and keep the first
    ``n_per_stratum``.  Unlike ``sampleBy`` (fraction-based, RNG-state
    dependent) the same rows are selected on any engine, cluster size,
    or run — which is what corpus-curation pipelines need to version
    their per-language / per-source quotas.

    Scale shape: one shuffle keyed by the stratum column + a bounded
    per-group sort.  Skewed strata cost what their size costs; for
    pathological single-stratum corpora rank with a composite
    (stratum, salt) key first and re-rank the n*salts survivors.
    """
    from pyspark.sql import Window as W

    order = [F.md5(F.col(key_col).cast("string")), F.col(key_col)]
    w = W.partitionBy(strata_col).orderBy(*order)
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


def q_stratified_sample(spark, sf_dir: str):
    """40 documents per language, deterministically chosen — the
    reproducible per-stratum quota draw."""
    docs = cached_scan(spark, f"{sf_dir}/documents.parquet")
    return stratified_sample(docs, "lang", 40, "doc_id").select(
        "doc_id", "lang", "sample_rank"
    )


def weighted_sample(
    df: DataFrame,
    weight_col,
    key_col: str,
    rate_per_unit_ppm: int,
) -> DataFrame:
    """Deterministic weight-proportional membership: row i is kept iff

        mhash(key_i) % 1_000_000  <  weight_i * rate_per_unit_ppm

    where ``mhash`` is a Knuth multiplicative hash — a uniform,
    engine-independent pseudo-random value computed with integer
    arithmetic only, so the SAME rows are selected on any engine or
    cluster size (the hash_sample reproducibility property, extended to
    per-row inclusion probabilities).  P(keep_i) = min(1, w_i * rate);
    corpus-curation pipelines use this to oversample long / high-quality
    documents in a versioned, replayable way.

    The key is reduced mod 1e6 BEFORE the multiply: (k*A) mod M ==
    ((k mod M)·(A mod M)) mod M, so the residue is identical but the
    intermediate stays <= 999_999 * 435_761 ~= 4.4e11 — no BIGINT
    overflow at any key magnitude.  The naive k*2654435761 form wraps
    silently in Spark (ansi off) but raises in engines with checked
    arithmetic once keys exceed ~3.4e9, i.e. exactly at large-corpus
    scale.

    Zero shuffle: the membership test is a narrow scan-side filter."""
    u = (
        (F.col(key_col).cast("long") % F.lit(1_000_000)) * F.lit(435_761)
    ) % F.lit(1_000_000)
    return df.filter(u < F.col(weight_col).cast("long") * rate_per_unit_ppm)


def mixture_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    targets_ppm: dict[str, int],
    total_rows: int,
) -> DataFrame:
    """Curriculum-mixture sampling: draw a corpus whose GROUP PROPORTIONS
    match ``targets_ppm`` (parts-per-million weights summing to <= 1e6)
    at ~``total_rows`` total — the pretraining-mix step ("40% web, 30%
    code, ...") done as deterministic hash membership so the drawn
    corpus is versioned and replayable (same rows on any engine or
    cluster: the ``weighted_sample`` property lifted from per-row
    weights to group quotas).

    Per-group keep rate_ppm = min(1e6, floor(total·w_ppm / count_g)).
    Weights are INTEGER ppm on purpose: total·w_ppm stays an exact
    small integer, so the one division is identical on every engine —
    float weights would put a DECIMAL-vs-double floor divergence right
    at the rate boundary.  Groups absent from ``targets_ppm`` are
    dropped (rate 0).  Plan shape: one tiny per-group count agg
    broadcast back onto the scan — the corpus itself never shuffles.
    Expected-count (not exact-count) per group is the deliberate trade
    for single-pass determinism; exact quotas are ``stratified_sample``.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("grp_n"))
    tmap = F.create_map(
        *[F.lit(x) for kv in sorted(targets_ppm.items()) for x in kv]
    )
    # NULL-check the raw quota BEFORE least(): Spark's least() skips
    # NULL arguments, so least(1e6, NULL) is 1e6 — an absent group
    # would silently get rate 1.0 instead of being dropped
    raw = F.floor((F.lit(total_rows) * tmap[F.col(group_col)]) / F.col("grp_n"))
    rates = (
        counts.filter(raw.isNotNull())
        .select(
            group_col,
            F.least(F.lit(1_000_000).cast("long"), raw).cast("long").alias("rate_ppm"),
        )
    )
    u = (
        (F.col(key_col).cast("long") % F.lit(1_000_000)) * F.lit(435_761)
    ) % F.lit(1_000_000)
    return df.join(F.broadcast(rates), group_col).filter(u < F.col("rate_ppm"))


MIXTURE_TARGETS = {"src0": 400_000, "src1": 300_000, "src2": 200_000, "src3": 100_000}


def q_mixture_sample(spark, sf_dir: str):
    """Draw a ~120-doc corpus at a 40/30/20/10 source mixture."""
    docs = cached_scan(spark, f"{sf_dir}/documents.parquet")
    return mixture_sample(docs, "source", "doc_id", MIXTURE_TARGETS, 120).select(
        "doc_id", "source", "lang", "n_chars"
    )


TOKEN_BUDGETS = {"src0": 50_000, "src1": 30_000, "src2": 15_000, "src3": 5_000}


def token_budget_mixture(
    df: DataFrame,
    group_col: str,
    key_col: str,
    budgets_tokens: dict[str, int],
    token_count_col,
) -> DataFrame:
    """Token-budget corpus mixing: like ``mixture_sample`` but the
    recipe is specified in TOKENS per group ("50k tokens of web, 30k of
    code, ..."), which is how real pretraining mixes are defined — row
    quotas under-weight long documents.  Per-group keep
    rate_ppm = min(1e6, floor(1e6·budget_g / total_tokens_g)); expected
    kept tokens per group = rate · total = the budget.  Same
    deterministic integer-ppm hash membership (replayable on any
    engine/cluster), same single broadcast agg — here summing token
    counts instead of counting rows; the corpus never shuffles.
    Groups without a budget are dropped."""
    counts = df.groupBy(group_col).agg(F.sum(token_count_col).alias("grp_tokens"))
    bmap = F.create_map(
        *[F.lit(x) for kv in sorted(budgets_tokens.items()) for x in kv]
    )
    # LONG multiply: 1e6 x a 50k-token budget is 5e10 — an int32
    # product wraps negative and silently drops the group
    raw = F.floor(
        (F.lit(1_000_000).cast("long") * bmap[F.col(group_col)].cast("long"))
        / F.col("grp_tokens")
    )
    rates = counts.filter(raw.isNotNull()).select(
        group_col,
        F.least(F.lit(1_000_000).cast("long"), raw).cast("long").alias("rate_ppm"),
    )
    u = (
        (F.col(key_col).cast("long") % F.lit(1_000_000)) * F.lit(435_761)
    ) % F.lit(1_000_000)
    return df.join(F.broadcast(rates), group_col).filter(u < F.col("rate_ppm"))


def q_token_budget_mixture(spark, sf_dir: str):
    """Draw a corpus hitting per-source TOKEN budgets (50k/30k/15k/5k)."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.functions.columns import (
        token_count,
    )

    docs = cached_scan(spark, f"{sf_dir}/documents.parquet")
    docs = docs.withColumn("n_tokens", token_count("text").cast("long"))
    return token_budget_mixture(
        docs, "source", "doc_id", TOKEN_BUDGETS, F.col("n_tokens")
    ).select("doc_id", "source", "n_tokens")


def dataset_split(
    df: DataFrame,
    key_col: str,
    train_ppm: int = 900_000,
    val_ppm: int = 50_000,
) -> DataFrame:
    """Deterministic train/val/test split: assign each row a split by
    integer-ppm thresholds over a key hash — the corpus-versioning
    property of ``hash_sample`` applied to the split every training
    run depends on.  Membership is a pure function of the key, so the
    split is replayable on any engine or cluster size, rows never move
    between splits as the corpus grows (new keys land in splits at the
    target rates), and the three parts are disjoint and exhaustive by
    construction.  The multiplier differs from the samplers' 435761 so
    split membership is decorrelated from sampling membership (a doc
    sampled into a mix must not be systematically train-only)."""
    u = ((F.col(key_col).cast("long") % F.lit(1_000_000)) * F.lit(823_543)) % F.lit(
        1_000_000
    )
    split = (
        F.when(u < train_ppm, F.lit("train"))
        .when(u < train_ppm + val_ppm, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def q_dataset_split(spark, sf_dir: str):
    """90/5/5 split of the documents table with per-split counts
    surfaced per source (the split-audit every run starts with)."""
    docs = cached_scan(spark, f"{sf_dir}/documents.parquet")
    return (
        dataset_split(docs, "doc_id")
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"))
    )


def q_sample_invariants(spark, sf_dir: str):
    """Driver-visible contract for the rows-only seeded sample
    (``exact_sample`` row identity is engine-defined — SURVEY §7 risk
    #2 — so the driver can't hash-match its rows; this row checks what
    IS engine-independent): exactly n rows, the same seed re-drawn in
    the same session selects the same rows, and a different seed
    selects a different set.  All three facts are deterministic on
    fixed data, so the oracle derives n from the table and pins the
    booleans."""
    from pyspark.sql import functions as F

    orders = cached_scan(spark, f"{sf_dir}/orders.parquet")
    a = exact_sample(orders, 500, 42).select("o_orderkey")
    b = exact_sample(orders, 500, 42).select("o_orderkey")
    c = exact_sample(orders, 500, 43).select("o_orderkey")
    n_a = a.agg(F.count("*").alias("n_rows"))
    d_ab = (
        a.exceptAll(b).unionAll(b.exceptAll(a)).agg(F.count("*").alias("d_same_seed"))
    )
    d_ac = a.exceptAll(c).agg(F.count("*").alias("d_diff_seed"))
    return (
        n_a.crossJoin(d_ab)
        .crossJoin(d_ac)
        .select(
            "n_rows",
            (F.col("d_same_seed") == 0).alias("stable"),
            (F.col("d_diff_seed") > 0).alias("seed_sensitive"),
        )
    )


def q_weighted_sample(spark, sf_dir: str):
    """Length-proportional document sample: p(keep) = n_chars * 800ppm
    (a 48-char doc ~ 3.8%, a 553-char doc ~ 44%)."""
    docs = cached_scan(spark, f"{sf_dir}/documents.parquet")
    return weighted_sample(docs, "n_chars", "doc_id", 800).select(
        "doc_id", "lang", "n_chars"
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    key_col: str,
    token_count_col,
    total_budget_tokens: int,
) -> DataFrame:
    """Temperature-resampled corpus mixing at tau = 0.5 (the mC4 /
    XLM-R multilingual-balance trick): unlike ``mixture_sample`` /
    ``token_budget_mixture``, which take an explicit hand-written
    recipe, the per-group budget here is DERIVED from the corpus --
    budget_g proportional to count_g^tau -- so head groups are
    down-weighted and tail groups up-weighted automatically, which is
    how real pretraining mixes balance dominant web domains against
    scarce languages.

    Determinism design: tau = 0.5 makes the weight sqrt(count), and
    IEEE-754 requires sqrt to be correctly rounded, so
    ``floor(sqrt(exact_long))`` is bit-identical on every engine (the
    ONE transcendental-free fractional power; arbitrary tau would need
    ln/exp and break the SCALE.md hashed-transcendental rule).  All
    downstream arithmetic is integer: budget_g =
    floor(B*s_g/sum(s)), rate_ppm = min(1e6,
    floor(1e6*budget_g/tokens_g)), and membership is the shared
    integer-ppm key hash -- replayable on any engine/cluster, zero
    data movement for the corpus itself.

    Plan shape: one hash agg for group token totals (map-side combine),
    a 1-row total via a second tiny agg, broadcast of the per-group
    rate table, then a scan-local filter.  At 100 TB the only shuffle
    is the |groups|-row aggregation; document bodies never move.
    """
    counts = df.groupBy(group_col).agg(
        F.sum(token_count_col).alias("grp_tokens")
    )
    s = F.floor(F.sqrt(F.col("grp_tokens").cast("double"))).cast("long")
    weighted = counts.withColumn("s_g", s)
    total = weighted.agg(F.sum("s_g").alias("s_total"))
    rates = (
        weighted.crossJoin(F.broadcast(total))
        .withColumn(
            "budget_g",
            F.floor(
                F.lit(int(total_budget_tokens)).cast("long")
                * F.col("s_g")
                / F.col("s_total")
            ).cast("long"),
        )
        .withColumn(
            "rate_ppm",
            F.least(
                F.lit(1_000_000).cast("long"),
                F.floor(
                    F.lit(1_000_000).cast("long")
                    * F.col("budget_g")
                    / F.col("grp_tokens")
                ).cast("long"),
            ),
        )
        .select(group_col, "rate_ppm")
    )
    u = (
        (F.col(key_col).cast("long") % F.lit(1_000_000)) * F.lit(435_761)
    ) % F.lit(1_000_000)
    return df.join(F.broadcast(rates), group_col).filter(u < F.col("rate_ppm"))


def q_temperature_mixture(spark, sf_dir: str):
    """tau=0.5 temperature mix of the documents corpus by source,
    targeting a 12k-token total budget (selective at every test sf); hashed surface is the kept rows
    (doc_id, source, n_tokens) plus each row's exact rate_ppm."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.functions.columns import (
        token_count,
    )

    docs = cached_scan(spark, f"{sf_dir}/documents.parquet")
    docs = docs.withColumn("n_tokens", token_count("text").cast("long"))
    return temperature_mixture(
        docs, "source", "doc_id", F.col("n_tokens"), 12_000
    ).select("doc_id", "source", "n_tokens", "rate_ppm")


# ---------------------------------------------------------------------------
# Leakage-safe (duplicate-aware) train/val/test split
# ---------------------------------------------------------------------------

def content_split_unit(text_col: str = "text") -> "F.Column":
    """Engine-independent uniform split coordinate in [0, 1e6) derived
    from the CONTENT of a document, not its id: the first 15 hex chars
    (60 bits, exact in a long) of md5(normalized text), mod 1e6.  Two
    documents with identical normalized text get the same coordinate on
    any engine — the property that makes the split duplicate-safe."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.functions.columns import (
        norm_text,
    )

    fp15 = F.substring(F.md5(norm_text(text_col)), 1, 15)
    return F.conv(fp15, 16, 10).cast("long") % F.lit(1_000_000)


def leakage_safe_split(
    df: DataFrame,
    text_col: str = "text",
    train_ppm: int = 900_000,
    val_ppm: int = 50_000,
) -> DataFrame:
    """Duplicate-aware train/val/test split: the split key is a content
    digest, so EXACT duplicates of a document can never straddle the
    train/test boundary (the classic eval-leakage bug ``dataset_split``
    is exposed to — an id-keyed split scatters copies of the same text
    across splits, and the model is then evaluated on memorized data).

    Structural guarantee (not statistical): split membership is a pure
    function of normalized text, so "same content => same split" holds
    by construction at any scale, under any partitioning, on any
    engine — ``q_split_leakage_law`` surfaces it to the driver gate.
    Near-duplicate leakage needs a cluster key instead: compose with
    ``dedup_clusters`` and split on the cluster representative's digest
    (rows-only, since connected components is iterative).

    Scale shape: one md5 over already-scanned text per row, zero
    shuffles, zero joins — the split is embarrassingly parallel and
    replayable for corpus versioning, exactly like ``hash_sample``.
    Skew note: heavy exact-dup groups all land in one split by design;
    that is the point, not a defect."""
    u = content_split_unit(text_col)
    split = (
        F.when(u < train_ppm, F.lit("train"))
        .when(u < train_ppm + val_ppm, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def stratified_kfold(df: DataFrame, k: int = 5, text_col: str = "text") -> DataFrame:
    """Content-keyed k-fold assignment for cross-validation over a
    training corpus: fold = content_split_unit % k, so (a) every row
    gets exactly one fold, (b) EXACT duplicates always share a fold
    (the leakage_safe_split guarantee extended to CV — a duplicate
    straddling train/held-out folds scores memorization, not
    generalization), and (c) membership is a pure content function —
    replayable on any engine, any partitioning, any scale.

    'Stratified' here is the large-corpus sense: with millions of rows
    per stratum the uniform 60-bit hash makes every (stratum, fold)
    cell land within O(1/sqrt(n)) of n/k — the audit query surfaces
    the realized balance rather than forcing exact equality, which
    would need a per-stratum serial pass and break the duplicate-
    cohesion property.  Zero shuffles, zero joins: one md5 per row."""
    if k < 2:
        raise ValueError(f"k-fold needs k >= 2: {k}")
    return df.withColumn(
        "fold", (content_split_unit(text_col) % k).cast("long")
    )


def q_stratified_kfold(spark, sf_dir: str):
    """Per-(source, fold) audit of the content-keyed 5-fold: counts
    plus the min/max fold population per source so balance is visible
    in-row — all-integer hashed contract."""
    docs = cached_scan(spark, f"{sf_dir}/documents.parquet")
    cell = (
        stratified_kfold(docs, k=5)
        .groupBy("source", "fold")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source")
    return cell.select(
        "source",
        "fold",
        "n_docs",
        F.min("n_docs").over(w).cast("long").alias("src_min_fold"),
        F.max("n_docs").over(w).cast("long").alias("src_max_fold"),
    )


def q_leakage_safe_split(spark, sf_dir: str):
    """Per-(source, split) audit counts of the 90/5/5 content-keyed
    split — all-integer hashed contract."""
    docs = cached_scan(spark, f"{sf_dir}/documents.parquet")
    return (
        leakage_safe_split(docs)
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"))
    )


def q_split_leakage_law(spark, sf_dir: str):
    """Driver-visible leakage law: the number of content fingerprints
    whose duplicate copies straddle >1 split is ZERO under the
    content-keyed split, while the same count under the naive id-keyed
    ``dataset_split`` is whatever the data's duplicates force (2 at
    sf0.1, where the corpus has 8 exact-dup groups).  One row,
    all-integer + boolean — the invariant-row pattern (VERDICT r3/r4)
    applied to split hygiene."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.functions.columns import (
        norm_text,
    )

    docs = cached_scan(spark, f"{sf_dir}/documents.parquet")
    fp = F.md5(norm_text("text")).alias("fp")

    safe = leakage_safe_split(docs).select(fp, "split")
    naive = dataset_split(docs, "doc_id").select(fp, "split")

    def leaky(d: DataFrame, name: str) -> DataFrame:
        return (
            d.groupBy("fp")
            .agg(F.countDistinct("split").alias("n_splits"))
            .agg(
                F.count(F.when(F.col("n_splits") > 1, 1)).alias(name)
            )
        )

    return (
        leaky(safe, "n_leaky_safe")
        .crossJoin(leaky(naive, "n_leaky_naive"))
        .select(
            F.col("n_leaky_safe").cast("long").alias("n_leaky_safe"),
            F.col("n_leaky_naive").cast("long").alias("n_leaky_naive"),
            (F.col("n_leaky_safe") == 0).alias("law_holds"),
        )
    )


def epoch_shuffle(
    docs: DataFrame, n_epochs: int = 3, n_shards: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Reproducible multi-epoch training-data shuffling + sharding: for
    each epoch, every doc gets a position in a hash-derived permutation
    (order by the md5-60-bit uniform of ``id || ':ep:' || epoch``, ties
    on id) and a round-robin shard = (pos − 1) % n_shards.  This is the
    data-order layer of a training run made a pure function of
    (corpus, epoch): rerun/cluster/engine-identical, epochs mutually
    decorrelated, shards balanced within one row by construction — no
    RNG state to checkpoint, no coordinator.

    Output: one row per (epoch, shard) — count, positional span, and
    perm_digest = bit_xor over md5-60(pos || '@' || id), an
    order-SENSITIVE fingerprint (each term binds a doc to its exact
    position, xor makes the fold order-free) so two permutations match
    iff every doc sits at the same position.  The wide (id, epoch, pos,
    shard) assignment frame is the real product; the digest rows are
    its certifiable summary.

    Scale shape: one explode (n_epochs ×) + one epoch-partitioned
    window sort + one hash agg; at 100 TB replace the exact global
    row_number with the dense_id range-partitioned rank recipe — the
    permutation semantics (order by hash) are unchanged."""
    from pyspark.sql import Window as W

    e = F.explode(F.sequence(F.lit(0), F.lit(n_epochs - 1))).alias("epoch")
    ids = docs.select(F.col(id_col).alias("id")).select("id", e)
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("id").cast("string"),
                        F.lit(":ep:"),
                        F.col("epoch").cast("string"),
                    )
                ),
                1, 15,
            ),
            16, 10,
        ).cast("long")
    )
    w = W.partitionBy("epoch").orderBy("h", "id")
    assigned = (
        ids.select("id", "epoch", h.alias("h"))
        .select(
            "id",
            F.col("epoch").cast("long").alias("epoch"),
            F.row_number().over(w).cast("long").alias("pos"),
        )
        .select(
            "id", "epoch", "pos", ((F.col("pos") - 1) % n_shards).alias("shard")
        )
    )
    dg = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("pos").cast("string"), F.lit("@"), F.col("id").cast("string")
                    )
                ),
                1, 15,
            ),
            16, 10,
        ).cast("long")
    )
    return (
        assigned.select("epoch", "shard", dg.alias("dg"), "pos")
        .groupBy("epoch", "shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("pos").cast("long").alias("first_pos"),
            F.max("pos").cast("long").alias("last_pos"),
            F.expr("bit_xor(dg)").cast("long").alias("perm_digest"),
        )
    )


def q_epoch_shuffle(spark, sf_dir: str) -> DataFrame:
    """3-epoch, 8-shard shuffle plan over the documents table."""
    docs = cached_scan(spark, f"{sf_dir}/documents.parquet")
    return epoch_shuffle(docs, n_epochs=3, n_shards=8)


def mixture_waterfill(
    docs: DataFrame, budget_ratio_ppm: int = 400_000
) -> DataFrame:
    """Water-filling token-budget allocation across sources: give every
    source an equal share of the token budget, except sources whose
    entire supply fits under the water level, which contribute all they
    have and release the surplus to the rest — the standard way a
    pretraining mix spends a fixed token budget over unequal corpora
    WITHOUT oversampling small sources (the cap) or letting one giant
    source starve the rest (the level).

    Closed form, no iteration: sort sources by supply ascending with
    prefix sums; source at rank i is CAPPED iff
    s_i · (n − i + 1) + P_{i−1} <= B (its full supply fits its fair
    share among the not-yet-capped); capping is prefix-closed under
    this order, so the water level is t = (B − P_K) div (n − K) for
    K = #capped, and alloc_i = s_i if capped else t.  All int64; floor
    semantics leave < (n − K) tokens of the budget unspent (documented).
    Budget = budget_ratio_ppm of the total token supply, so the
    operator is scale-free.

    Plan: one corpus scan for per-source token sums, then every window/
    join runs on |sources| rows.  Output: per source — supply, the
    allocation, the capped flag, and the shared water level."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.functions.columns import (
        token_count,
    )
    from pyspark.sql import Window as W

    supplies = (
        docs.select("source", token_count("text").alias("n_tok"))
        .groupBy("source")
        .agg(F.sum("n_tok").cast("long").alias("supply"))
    )
    tot = supplies.agg(
        F.sum("supply").alias("total_supply"),
        F.count("*").cast("long").alias("n_src"),
    ).select(
        "total_supply", "n_src",
        # Two-step rational floor: never form total_supply * ppm directly —
        # it wraps int64 silently in Spark once total tokens exceed ~9.2e12
        # (the 100 TB regime), while DuckDB HUGEINT would raise.  Exact for
        # total_supply >= 0: floor(t*p/1e6) = (t div 1e6)*p + ((t%1e6)*p) div 1e6.
        F.expr(
            f"(total_supply div 1000000) * {budget_ratio_ppm} "
            f"+ ((total_supply % 1000000) * {budget_ratio_ppm}) div 1000000"
        ).alias("budget"),
    )
    w = W.orderBy("supply", "source")  # |sources| rows — bounded window
    ranked = (
        supplies.crossJoin(F.broadcast(tot))
        .select(
            "source", "supply", "budget", "n_src",
            F.row_number().over(w).cast("long").alias("rk"),
            F.coalesce(
                F.sum("supply").over(w.rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("long").alias("prefix"),
        )
        .withColumn(
            "capped",
            F.expr("supply * (n_src - rk + 1) + prefix <= budget"),
        )
    )
    level = ranked.agg(
        F.sum(F.when(F.col("capped"), F.col("supply"))).alias("p_k"),
        F.sum(F.when(F.col("capped"), 1).otherwise(0)).alias("k"),
        F.min("budget").alias("budget"),
        F.min("n_src").alias("n_src"),
    ).select(
        F.expr(
            "CASE WHEN n_src > k THEN "
            "(budget - coalesce(p_k, 0)) div (n_src - k) END"
        ).cast("long").alias("water_level"),
    )
    return (
        ranked.crossJoin(F.broadcast(level))
        .select(
            "source",
            "supply",
            F.col("budget").cast("long").alias("budget"),
            "capped",
            F.when(F.col("capped"), F.col("supply"))
            .otherwise(F.col("water_level"))
            .cast("long")
            .alias("alloc"),
            "water_level",
        )
    )


def q_mixture_waterfill(spark, sf_dir: str) -> DataFrame:
    """40%-of-supply token budget water-filled across sources."""
    docs = cached_scan(spark, f"{sf_dir}/documents.parquet")
    return mixture_waterfill(docs, budget_ratio_ppm=400_000)
