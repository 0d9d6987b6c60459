"""Relational operator library (SURVEY §2 inventory + §2.2 extensions).

Each function is a named query builder ``(spark, sf_dir) -> DataFrame``
over the driver's testdata tables (TESTDATA.md), exercising one operator
family from the SURVEY §2 checklist.  Every computed column is aliased so
the DuckDB oracle in ``__spark_entry__.oracle_sql`` can produce an
identical (column-name, value) surface.

Design rules applied throughout (100 TB posture):
  * dimension tables (region/nation/supplier/customer at TPC-H ratios)
    are broadcast explicitly where the optimizer might not see sizes;
  * aggregates run as partial (map-side) + final hash aggregations —
    free with groupBy;
  * double aggregates are rounded to pin cross-engine float identity;
  * no ``collect()`` anywhere — everything stays a lazy plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.ids import with_dense_id
from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.sample import exact_sample
from project_market_pulse_etl_pipeline_with_llm_integration_spark.session import ensure_engine_confs
from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import cached_scan


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return cached_scan(spark, f"{sf_dir}/{name}.parquet")


def money_sum(expr: Column, scale: int = 2) -> Column:
    """Order-insensitive money aggregation: accumulate in DECIMAL
    (exact, associative) and round/cast only at the end.  Summing
    DOUBLEs is order-dependent (error ~ n·ulp), so two engines summing
    the same group in different orders can disagree by a penny whenever
    the sum lands within an ulp of a .005 rounding boundary — observed
    live on a tpch_q7 revenue group.  The products being cast are
    exact few-decimal values, so the double→decimal cast itself has no
    tie to round.

    DOMAIN: each addend must satisfy |x| < 1e14 (DECIMAL(20,6) holds 14
    integer digits).  With ANSI mode off, an out-of-domain addend casts
    to NULL and silently drops from the sum — callers outside the
    money/price domain (TPC-H prices top out ~1e5) must widen the
    decimal or enable spark.sql.ansi.enabled to fail loudly instead."""
    return F.round(F.sum(expr.cast("decimal(20,6)")), scale).cast("double")


# ---------------------------------------------------------------------------
# Scans / projections / filters (O2, O4, O5, O6, O10)
# ---------------------------------------------------------------------------

def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan + rename-projection (O2/O4/O10).  Catalyst prunes the
    scan to exactly these three columns (check ReadSchema in explain)."""
    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )


def q_filter_in_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + not-null predicates (O5/O6) — both push to the scan."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE"))
        .filter(F.col("c_name").isNotNull() & (F.col("c_acctbal") > 0))
        .select("c_custkey", "c_name", "c_mktsegment", F.round("c_acctbal", 2).alias("acctbal"))
    )


def q_safe_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe string->timestamp cast, null on failure (O7).  Round-trips
    o_orderdate through a string and re-parses with try_to_timestamp,
    plus a deliberately invalid parse column that must be all-null."""
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.try_to_timestamp(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")).alias("reparsed"),
        F.try_to_timestamp(F.concat(F.lit("not-a-date-"), F.col("o_orderstatus"))).alias(
            "bad_parse"
        ),
    )


# ---------------------------------------------------------------------------
# Sort / dense ids / top-k / sample (O8, O9, O11)
# ---------------------------------------------------------------------------

def q_dense_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + dense 1-based id (O8/O9) via the scalable two-phase
    operator; pinned total order (o_orderdate, o_orderkey)."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return with_dense_id(orders, ["o_orderdate", "o_orderkey"], id_col="seq_id")


def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with pinned tiebreak — executed as per-partition top-k +
    merge (TakeOrderedAndProject), never a global sort."""
    return (
        _t(spark, sf_dir, "customer")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .limit(25)
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
    )


def q_exact_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-N seeded sample (O11) — row identity is engine-defined
    (SURVEY §7 risk #2), so the driver check is rows-only (no oracle)."""
    return exact_sample(_t(spark, sf_dir, "orders"), 500, seed=42)


# ---------------------------------------------------------------------------
# Joins (O16 generalized)
# ---------------------------------------------------------------------------

def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left equi-join (O16) customer->orders with per-customer totals;
    customers without orders keep nulls -> coalesced to 0."""
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("order_cnt"), money_sum(F.col("o_totalprice")).alias("total_spent")
    )
    return (
        _t(spark, sf_dir, "customer")
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce("order_cnt", F.lit(0)).alias("order_cnt"),
            F.round(F.coalesce("total_spent", F.lit(0.0)), 2).alias("total_spent"),
        )
    )


def q_join_multiway_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way inner join lineitem⋈orders⋈customer + small-dim broadcast
    (nation): revenue by nation and order priority.  The big⋈big join
    shuffles on orderkey; nation is broadcast — the plan a 100 TB run
    wants."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "o_orderpriority")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("line_cnt"),
        )
        .withColumnRenamed("n_name", "nation")
        .withColumnRenamed("o_orderpriority", "priority")
    )


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having >= 1 'F' order."""
    f_orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        _t(spark, sf_dir, "customer")
        .join(f_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    bits_per_key: int = 10,
    n_hashes: int = 5,
    n_bits: int | None = None,
    max_literal_bits: int = 1 << 22,
) -> DataFrame:
    """Semi join with a Bloom-filter prefilter on the probe side — the
    classic runtime-filter pattern for selective big⋈small joins at
    scale (this Spark build does not register ``bloom_filter_agg`` /
    ``might_contain``, so the filter is built with public column
    algebra).

    Build: the small side's keys are hashed ``n_hashes`` times
    (seeded xxhash64), exploded to (word, bit) positions and OR-folded
    into a ``n_bits/64``-word bitmap by ONE tiny aggregation; the bitmap
    is pulled to the driver (bounded: bits_per_key·|small| bits —
    ~1.2 MB for a million-key dim at the default sizing, the same
    bounded-driver-state class as the IVF centroids) and re-enters the
    plan as a single array literal.

    Probe: each big-side row tests its key's ``n_hashes`` bit positions
    against the broadcast literal in codegen — no shuffle, no join; rows
    failing any bit are dropped AT THE SCAN.  False positives
    (~0.8% at 10 bits/key, 5 hashes) then meet an exact left-semi join,
    so the OUTPUT is exactly the semi join's — the bloom only shrinks
    the shuffle: at 100 TB a 1%-selectivity semi join moves 1% of the
    probe side instead of all of it.  Returns the filtered big side.

    Size gate (verdict r8 #3): the plan-literal bitmap is a driver/plan
    bottleneck once the build side is large (10⁸ keys → ~10⁹ bits → a
    16M-element literal).  Above ``max_literal_bits`` (default 2²² bits
    = 64 K words ≈ 512 KB) the bitmap therefore STAYS DISTRIBUTED as a
    (word, mask) DataFrame probed by broadcast hash joins
    (``bloom_prefilter_join``); both paths feed the same residual exact
    join, so the output is identical (pinned by test)."""
    if n_bits is None:
        n = small.count()
        n_bits = 1 << max(14, (bits_per_key * max(n, 1) - 1).bit_length())
    if n_bits <= max_literal_bits:
        bitmap, n_bits = bloom_bitmap(small, small_key, bits_per_key, n_hashes, n_bits)
        prefiltered = bloom_prefilter(big, big_key, bitmap, n_bits, n_hashes)
    else:
        words = bloom_words(small, small_key, n_bits, n_hashes)
        prefiltered = bloom_prefilter_join(big, big_key, words, n_bits, n_hashes)
    return prefiltered.join(
        small.select(F.col(small_key).alias("__bsj_k")).distinct(),
        F.col(big_key) == F.col("__bsj_k"),
        "left_semi",
    )


def bloom_bitmap(
    small: DataFrame,
    key: str,
    bits_per_key: int = 10,
    n_hashes: int = 5,
    n_bits: int | None = None,
) -> tuple[list[int], int]:
    """Build the Bloom bitmap for ``small``'s key column: seeded
    xxhash64 positions, OR-folded into 64-bit words by one tiny
    aggregation; returns (words, n_bits).  Driver state is the bitmap
    only — bits_per_key·|small| bits.  Pass ``n_bits`` (a power of two)
    when the build-side cardinality is known to skip the sizing
    count() — one fewer job per build; an undersized filter only costs
    false positives (caught by the residual join), never correctness."""
    if n_bits is None:
        n = small.count()
        n_bits = 1 << max(14, (bits_per_key * max(n, 1) - 1).bit_length())
    words = bloom_words(small, key, n_bits, n_hashes).collect()
    bitmap = [0] * (n_bits // 64)
    for r in words:
        bitmap[r["word"]] = r["mask"]
    return bitmap, n_bits


def bloom_words(
    small: DataFrame, key: str, n_bits: int, n_hashes: int = 5
) -> DataFrame:
    """The Bloom bitmap as a DataFrame of its NON-ZERO 64-bit words:
    (word int, mask long).  One explode + one hash agg; ≤ n_bits/64
    rows.  The literal path collects this; the scale path keeps it
    distributed and probes it with broadcast joins."""
    positions = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(n_bits))
            for i in range(n_hashes)
        ]
    )
    return (
        small.select(F.explode(positions).alias("p"))
        .select(
            (F.col("p") / 64).cast("int").alias("word"),
            # SQL form: the Python shiftleft() only takes literal shifts
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("mask"))
    )


def bloom_prefilter_join(
    big: DataFrame,
    key: str,
    words: DataFrame,
    n_bits: int,
    n_hashes: int = 5,
    broadcast_words: bool = True,
) -> DataFrame:
    """Scale variant of ``bloom_prefilter``: the bitmap never touches
    the driver or the plan — each probe row hash-joins its ``n_hashes``
    word indices against the distributed (word, mask) frame and keeps
    the row only if every addressed bit is set.

    The joins are INNER on the word index, so a key addressing an
    all-zero (absent) word drops immediately — same semantics as a zero
    mask.  With the broadcast hint (default) each join is an in-memory
    hash probe on the big side: no shuffle of the probe rows, n_hashes
    map-side lookups per row — the distributed analogue of the literal
    path's codegen bit test.  For bitmaps too big even to broadcast
    (≳2³⁰ bits), pass ``broadcast_words=False`` and AQE plans a shuffle
    join keyed on the word index instead; the probe side shuffles once
    per hash, which is why the literal/broadcast tiers are preferred
    whenever they fit."""
    wd = F.broadcast(words) if broadcast_words else words
    out = big
    for i in range(n_hashes):
        p = F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(n_bits))
        wi, mi = f"__blw{i}", f"__blm{i}"
        out = out.join(
            wd.select(F.col("word").alias(wi), F.col("mask").alias(mi)),
            (p / 64).cast("int") == F.col(wi),
            "inner",
        ).filter(
            F.call_function(
                "shiftrightunsigned", F.col(mi), (p % 64).cast("int")
            ).bitwiseAND(F.lit(1))
            == 1
        )
    return out.drop(*[c for i in range(n_hashes) for c in (f"__blw{i}", f"__blm{i}")])


def bloom_prefilter(
    big: DataFrame, key: str, bitmap: list[int], n_bits: int, n_hashes: int = 5
) -> DataFrame:
    """Drop ``big`` rows whose key is definitely not in the bloom —
    pure codegen bit tests against the bitmap literal, no shuffle.  May
    keep false positives (callers needing exact semantics follow with
    the residual join — ``bloom_semi_join``).

    The bitmap rides INSIDE the filter expression as one constant —
    NEVER as a projected column: ``withColumn(lit(bitmap))`` copies the
    whole array into every row's unsafe-row buffer (measured: a 128 KB
    filter × 600k rows turned a sub-second probe into tens of seconds);
    as an expression constant it is referenced, not materialized.  The
    constant enters the plan as ONE json-string literal decoded by
    ``from_json`` — Catalyst's ConstantFolding collapses it to an array
    Literal at optimization time, where ``F.lit(list)`` would issue a
    py4j round-trip per element (measured: 11 s of driver time for a
    2^20-bit filter).  ``call_function`` reaches the SQL
    shiftrightunsigned, whose shift amount may be a column (the Python
    wrapper only takes literals)."""
    import json as _json

    blit = F.from_json(F.lit(_json.dumps(bitmap)), "array<bigint>")
    keep = F.lit(True)
    for i in range(n_hashes):
        p = F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(n_bits))
        word = F.element_at(blit, (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftrightunsigned", word, (p % 64).cast("int")
        ).bitwiseAND(F.lit(1))
        keep = keep & (bit == 1)
    return big.filter(keep)


def q_join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi join: lineitems of high-value open orders.
    The oracle is the plain EXISTS semi join — the bloom is an
    execution-strategy choice whose output must be EXACTLY the semi
    join's (false positives die in the residual exact join)."""
    big = _t(spark, sf_dir, "lineitem")
    small = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 150000)
    )
    # fixed 2^20-bit filter (128 KB): plenty for this dim's cardinality
    # at any bench sf, and skips the per-run sizing count
    return bloom_semi_join(
        big, small, "l_orderkey", "o_orderkey", n_bits=1 << 20
    ).select("l_orderkey", "l_linenumber", "l_quantity")


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no 'P'-status order."""
    p_orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        _t(spark, sf_dir, "customer")
        .join(p_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join: parts priced within a band per size class.
    Kept deliberately selective so the nested-loop side stays small; the
    small side is broadcast -> BroadcastNestedLoopJoin, the only sane
    physical plan for theta joins."""
    part = _t(spark, sf_dir, "part")
    # Exact min (not avg) for the band edge: min is order-insensitive, so
    # the float boundary is bit-identical across engines.
    bands = F.broadcast(
        part.groupBy("p_size").agg(F.min("p_retailprice").alias("band_lo"))
    ).withColumnRenamed("p_size", "band_size")
    return (
        part.join(
            bands,
            (part.p_size == bands.band_size)
            & (part.p_retailprice > bands.band_lo)
            & (part.p_retailprice <= bands.band_lo + 200.0),
            "inner",
        )
        .select("p_partkey", "p_size", F.round("p_retailprice", 2).alias("price"))
    )


def q_join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (point-in-range) join via BINNING — the scale pattern
    for time-range joins Spark lacks natively.  Naively, point ⋈
    interval is a BroadcastNestedLoopJoin (every point tested against
    every interval: O(|P|·|I|)).  Binning explodes each interval into
    the day bins it covers and equi-joins points on their bin — a plain
    broadcast-hash join whose work is Σ interval-days, with the exact
    containment predicate as a residual filter.  At 100 TB the same
    shape shuffles on (bin) when the interval side outgrows broadcast,
    and bin width trades join fan-out against filter selectivity.

    Workload: the 10 busiest days (deterministic (count desc, day)
    order) widen to 3-day incident windows; every event landing in a
    window is tagged with it (overlapping windows tag twice — the
    general interval-join semantics, which the oracle's naive theta
    join reproduces)."""
    ev = _t(spark, sf_dir, "events")
    days = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count("*").alias("cnt"))
    top = days.orderBy(F.col("cnt").desc(), "day").limit(10)
    rank_w = W.orderBy(F.col("cnt").desc(), "day")
    wins = top.select(
        F.row_number().over(rank_w).cast("long").alias("win_id"),
        F.date_sub("day", 1).alias("lo"),
        F.date_add("day", 1).alias("hi"),
    )
    bins = wins.select(
        "win_id", "lo", "hi", F.explode(F.sequence("lo", "hi")).alias("bin_day")
    )
    return (
        ev.withColumn("day", F.to_date("ts"))
        .join(F.broadcast(bins), F.col("day") == F.col("bin_day"))
        # residual exact containment — structurally true at day
        # granularity here, load-bearing for sub-bin interval edges
        .filter((F.col("day") >= F.col("lo")) & (F.col("day") <= F.col("hi")))
        .select("event_id", "win_id")
    )


def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: per-status order counts vs per-status lineitem
    return counts (disjoint status domains exercise both null sides)."""
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count("*").alias("n_orders"))
    )
    l = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("status"))
        .agg(F.count("*").alias("n_lines"))
    )
    return o.join(l, "status", "full_outer").select(
        "status",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
    )


def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (point-in-time lookup) — an operator Spark lacks
    natively, composed from union + ignore-nulls last_value window
    (the scalable pattern: one shuffle on the key, no per-key loops,
    no nested-loop join).

    Semantics: for every 'click' event, attach the most recent 'view'
    event of the same user at-or-before the click's timestamp (DuckDB
    oracle: explicit theta-join + argmax with the same max-view-id
    tie-break — native ASOF leaves equal-ts ties implementation-defined,
    so the oracle pins them instead)."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import (
        read_events,
    )

    ev = read_events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id"), F.lit(0).alias("tag")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), F.lit(1).alias("tag")
    )
    merged = views.unionByName(clicks.withColumn("view_id", F.lit(None).cast("long")),
                               allowMissingColumns=True)
    # at equal ts the view sorts first (tag 0 < 1), matching ASOF >=;
    # view_id breaks ties between equal-ts views (pick the MAX id, the
    # last in ascending order) so the match is deterministic on any
    # engine — ASOF itself leaves equal-ts ties implementation-defined
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "tag", "view_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = merged.withColumn("asof_view_id", F.last("view_id", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("tag") == 1)
        .filter(F.col("asof_view_id").isNotNull())
        .select("click_id", "user_id", "asof_view_id")
    )


def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a lookback TOLERANCE (pandas ``merge_asof
    (tolerance=...)`` / kdb ``wj`` semantics): the most recent same-user
    'view' at-or-before each 'click' counts only if it is at most one
    hour old — the feature-engineering guard against joining stale
    state.  Correctness note: if the LATEST at-or-before view is out of
    tolerance every earlier one is too, so the tolerance is a residual
    filter on the carried match — same one-shuffle window plan as
    q_join_asof, no extra join.  The matched view's ts is carried
    alongside its id by the same ignore-nulls last over the same order,
    so both fields come from the same winning row."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import (
        read_events,
    )

    ev = read_events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id"), F.lit(0).alias("tag")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), F.lit(1).alias("tag")
    )
    merged = views.unionByName(
        clicks.withColumn("view_id", F.lit(None).cast("long")),
        allowMissingColumns=True,
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "tag", "view_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = merged.withColumn(
        "asof_view_id", F.last("view_id", ignorenulls=True).over(w)
    ).withColumn(
        "asof_view_ts",
        F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return (
        carried.filter(F.col("tag") == 1)
        .filter(F.col("asof_view_id").isNotNull())
        .filter(
            F.col("asof_view_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
        )
        .select("click_id", "user_id", "asof_view_id")
    )


def q_scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar battery: AND/OR/XOR, bounded shifts, popcount —
    the operations bitmap indexes, bloom filters, and flag columns are
    made of, pinned cross-engine on real keys.  Shift amounts stay in
    [0, 6] and off the sign bit (DuckDB errors where Spark wraps)."""
    li = _t(spark, sf_dir, "lineitem")
    sh = (F.col("l_linenumber") % 7).cast("int")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("l_orderkey & l_suppkey").alias("b_and"),
        F.expr("l_orderkey | l_suppkey").alias("b_or"),
        F.expr("l_orderkey ^ l_suppkey").alias("b_xor"),
        F.call_function("shiftleft", F.col("l_suppkey"), sh).alias("b_shl"),
        F.call_function("shiftright", F.col("l_orderkey"), sh).alias("b_shr"),
        F.bit_count("l_orderkey").cast("int").alias("b_pop"),
    )


def q_join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for every 'click', the EARLIEST 'view' of the
    same user at-or-after the click — the mirror of q_join_asof with a
    following frame + ignore-nulls first (reaction lookups: "what did
    the user see next").  Same scale shape: one user-keyed shuffle."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import (
        read_events,
    )

    ev = read_events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id"), F.lit(1).alias("tag")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), F.lit(0).alias("tag")
    )
    merged = views.unionByName(clicks.withColumn("view_id", F.lit(None).cast("long")),
                               allowMissingColumns=True)
    # at equal ts the click sorts first (tag 0 < 1) so an equal-ts view
    # is still "at-or-after" — matching ASOF <= semantics; view_id
    # breaks ties between equal-ts views (pick the MIN id) so the match
    # is deterministic on any engine
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "tag", "view_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = merged.withColumn(
        "next_view_id", F.first("view_id", ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("tag") == 0)
        .filter(F.col("next_view_id").isNotNull())
        .select("click_id", "user_id", "next_view_id")
    )


# ---------------------------------------------------------------------------
# Aggregations (extension — absent in reference, SURVEY §2.2)
# ---------------------------------------------------------------------------

def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical hash-agg with
    map-side partials; one shuffle on the 4-ish distinct group keys."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (dedup by full row)."""
    return _t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — expand+two-phase agg in Spark; also a sum."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            money_sum(F.col("o_totalprice")).alias("total"),
        )
    )


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("cnt"))
    )


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all cross-combinations)."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"), F.round(F.avg("o_totalprice"), 6).alias("avg_price"))
    )


def q_agg_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot expressed as conditional aggregation (same physical shape
    Spark's pivot lowers to; oracle-friendly column names)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(0.0)), 2
                ).alias("qty_open"),
        F.round(F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0.0)), 2
                ).alias("qty_filled"),
    )


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15 shape): argmax over an aggregate — rank
    suppliers by summed revenue, keep the maximum (with ties).  The
    classic view+max topology expressed as agg -> window max -> filter;
    the window is global but runs over the tiny aggregated frame, not
    the fact table."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )
    supplier = F.broadcast(_t(spark, sf_dir, "supplier"))
    return (
        rev.withColumn("mx", F.max("total_rev").over(W.partitionBy()))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(supplier, F.col("l_suppkey") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-sales-opportunity (TPC-H Q22 shape): scalar-subquery
    threshold + anti-join + aggregation.  Customers with above-average
    positive balance and no RECENT orders, counted per market segment —
    the reference schema has no phone column, so mktsegment stands in
    for the country-code dimension, and 'recent' stands in for Q22's
    7-year dormancy window."""
    cust = _t(spark, sf_dir, "customer")
    # above-average test WITHOUT a float division: bal > sum/cnt is
    # evaluated as bal*cnt > sum over exact decimals, so the threshold
    # is bit-identical however either engine orders its summation
    thresh = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(20,6)")).alias("pos_sum"),
        F.count("*").alias("pos_cnt"),
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(thresh))
        .filter(
            F.col("c_acctbal").cast("decimal(20,6)") * F.col("pos_cnt") > F.col("pos_sum")
        )
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            money_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): filtered
    LEFT join then a two-level aggregation — per-customer order counts,
    then the histogram of those counts.  The left join preserves
    zero-order customers (c_count = 0 bucket); COUNT(o_orderkey) counts
    only matched rows.  Both aggs shuffle on small keys (custkey then
    the tiny count domain); the reference schema has no o_comment, so
    the classic NOT LIKE filter is stood in by an order-priority
    predicate pushed into the join condition (NOT the WHERE — the
    distinction is the whole point of Q13)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): CORRELATED scalar
    subquery — each lineitem row compares against the average quantity
    of ITS OWN part.  Expressed as the decorrelated plan Catalyst itself
    produces for correlated scalar subqueries: per-part aggregate joined
    back on the correlation key.  The part filter is applied BEFORE the
    per-part aggregate via a broadcast semi join, so the heavy agg runs
    only over the ~1/25 of lineitem that can survive (at 100 TB this
    ordering is the difference between aggregating 100 TB and 4 TB).

    Exactness: the predicate l_quantity < 0.2*avg(l_quantity) is
    evaluated as 5*l_quantity*cnt < sum — quantities are integral, so
    both sides are exactly-representable doubles and the comparison is
    bit-identical across engines (a raw 0.2*sum/cnt double would be
    order-of-summation dependent).  Reference anchor: SURVEY §2.2
    joins/aggregations extension mandate (subquery family).
    """
    part_f = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 15))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    li_f = li.join(F.broadcast(part_f), li.l_partkey == part_f.p_partkey, "left_semi")
    per_part = li_f.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("cnt_qty")
    )
    return (
        li_f.join(per_part.withColumnRenamed("l_partkey", "pk"), F.col("l_partkey") == F.col("pk"))
        .filter(F.lit(5.0) * F.col("l_quantity") * F.col("cnt_qty") < F.col("sum_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(20,6)")) / 7.0, 2
            ).cast("double").alias("avg_yearly"),
            F.count("*").alias("n_small_lines"),
        )
    )


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers-who-kept-orders-waiting (TPC-H Q21 shape): the
    multi-EXISTS chain — lineitems that are the ONLY "late" supplier in
    a multi-supplier order.  EXISTS(another supplier in the order) is a
    left-semi join, NOT EXISTS(another LATE supplier) a left-anti join,
    both keyed on l_orderkey with the supplier-inequality as a residual
    condition — Catalyst runs them as ExistenceJoins on the equi key, so
    no cross product; the two passes over lineitem reuse the same
    shuffle key (orderkey).  The schema has no receipt/commit dates, so
    "late" is stood in by l_returnflag = 'R'."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    late = li.filter(F.col("l_returnflag") == "R")
    orders_f = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l1 = late.join(orders_f, late.l_orderkey == orders_f.o_orderkey, "left_semi")
    l2 = li.select(
        F.col("l_orderkey").alias("r_orderkey"), F.col("l_suppkey").alias("r_suppkey")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("r_orderkey"), F.col("l_suppkey").alias("r_suppkey")
    )
    exists_other = (F.col("l_orderkey") == F.col("r_orderkey")) & (
        F.col("l_suppkey") != F.col("r_suppkey")
    )
    waiting = l1.join(l2, exists_other, "left_semi").join(l3, exists_other, "left_anti")
    supplier = F.broadcast(
        _t(spark, sf_dir, "supplier").join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).filter(
            F.col("n_name").isin("NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4")
        ).select("s_suppkey", "s_name")
    )
    return (
        waiting.join(supplier, waiting.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling — the reproducible alternative to
    seeded random sampling for corpus curation: keep rows whose md5(key)
    falls below a hex threshold (here 0x29/256 ~ 16%).  Unlike rand(),
    the same row is in or out on ANY engine, cluster size, or run —
    which is why data pipelines version their samples this way — and the
    filter is a narrow map that pushes membership decisions to the scan
    side with zero shuffle and no RNG state."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.md5(F.col("o_orderkey").cast("string")) < "29")
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice"), 2).alias("price"),
        )
    )


def q_pivot_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native DataFrame.pivot (the reshaping operator proper, vs the
    manual conditional-agg rendering in agg_conditional_pivot): one
    shuffle on the groupBy key; the pivot values are pinned explicitly
    so the plan skips the extra distinct-values job AND stays
    deterministic in column order."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .select(
            "l_linestatus",
            F.col("A").alias("qty_a"),
            F.col("N").alias("qty_n"),
            F.col("R").alias("qty_r"),
        )
    )


def merge_upsert(
    base: DataFrame, updates: DataFrame, key_cols: list[str]
) -> DataFrame:
    """SCD-1 MERGE (upsert) without a table format: full-outer join on
    the key; matched keys take the update row, unmatched base rows pass
    through, new keys insert.  This join is exactly what Delta/Iceberg
    MERGE compiles to minus the transaction log — expressed directly so
    the engine covers the pattern on plain parquet.  One shuffle on the
    merge key for each side; at 100 TB the base side should be bucketed
    on the key so repeated merges skip its shuffle (see SCALE.md,
    bucketing)."""
    cols = base.columns
    cond = None
    for k in key_cols:
        c = F.col(f"__b.{k}").eqNullSafe(F.col(f"__u.{k}"))
        cond = c if cond is None else (cond & c)
    return (
        base.alias("__b")
        .join(updates.alias("__u"), cond, "full_outer")
        .select(
            *[
                F.coalesce(F.col(f"__u.{c}"), F.col(f"__b.{c}")).alias(c)
                for c in cols
            ]
        )
    )


def scd2_merge(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    update_ts,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """SCD-2 MERGE (history-tracking upsert) on plain parquet: ``base``
    rows carry a [valid_from, valid_to) validity interval (open rows
    have NULL valid_to); ``updates`` is the new snapshot of
    key+compare columns effective at ``update_ts``.  Per key:

    * expired base rows (valid_to set) pass through untouched — history
      is immutable;
    * an open row whose compare columns match the update passes through
      (no spurious versions);
    * an open row that differs is CLOSED (valid_to = update_ts) and a
      new open version is inserted;
    * a brand-new key inserts an open version.

    This is what Delta/Iceberg `MERGE ... WHEN MATCHED THEN UPDATE SET
    valid_to / WHEN NOT MATCHED THEN INSERT` compiles to for slowly
    changing dimensions, minus the transaction log.  One shuffle per
    side on the merge key (bucket the base at scale — SCALE.md); change
    detection is null-safe so NULL compare values don't thrash
    versions.  Keys must be non-null (dimension contract)."""
    history = base.filter(F.col(to_col).isNotNull())
    current = base.filter(F.col(to_col).isNull())
    cond = None
    for k in key_cols:
        c = F.col(f"__c.{k}").eqNullSafe(F.col(f"__u.{k}"))
        cond = c if cond is None else (cond & c)
    j = current.alias("__c").join(updates.alias("__u"), cond, "full_outer")
    has_c = F.col(f"__c.{key_cols[0]}").isNotNull()
    has_u = F.col(f"__u.{key_cols[0]}").isNotNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"__c.{c}").eqNullSafe(F.col(f"__u.{c}"))
    base_cols = [*key_cols, *compare_cols, from_col, to_col]
    passthrough = j.filter(has_c & (~has_u | ~changed)).select(
        *[F.col(f"__c.{c}").alias(c) for c in [*key_cols, *compare_cols, from_col]],
        F.col(f"__c.{to_col}").alias(to_col),
    )
    closed = j.filter(has_c & has_u & changed).select(
        *[F.col(f"__c.{c}").alias(c) for c in [*key_cols, *compare_cols, from_col]],
        F.lit(update_ts).cast("date").alias(to_col),
    )
    new_rows = j.filter(has_u & (~has_c | changed)).select(
        *[F.col(f"__u.{c}").alias(c) for c in [*key_cols, *compare_cols]],
        F.lit(update_ts).cast("date").alias(from_col),
        F.lit(None).cast("date").alias(to_col),
    )
    return (
        history.select(*base_cols)
        .unionByName(passthrough)
        .unionByName(closed)
        .unionByName(new_rows)
    )


def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver surface for SCD-2: the customer dimension with a planted
    expired version for every 11th key (history passthrough), updates
    that change every 5th key (close + new version) and insert
    synthetic keys (new open rows)."""
    cust = _t(spark, sf_dir, "customer")
    open_rows = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("2020-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    expired = cust.filter(F.col("c_custkey") % 11 == 0).select(
        "c_custkey",
        F.lit("LEGACY").alias("c_mktsegment"),
        F.round(F.col("c_acctbal") - 50.0, 2).alias("acctbal"),
        F.lit("2019-01-01").cast("date").alias("valid_from"),
        F.lit("2020-01-01").cast("date").alias("valid_to"),
    )
    base = open_rows.unionByName(expired)
    updates = (
        cust.filter(F.col("c_custkey") % 5 == 0)
        .select(
            "c_custkey",
            F.lit("UPGRADED").alias("c_mktsegment"),
            F.round(F.col("c_acctbal") + 100.0, 2).alias("acctbal"),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 100 == 0).select(
                (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
                F.lit("FRESH").alias("c_mktsegment"),
                F.lit(0.0).alias("acctbal"),
            )
        )
    )
    return scd2_merge(
        base,
        updates,
        ["c_custkey"],
        ["c_mktsegment", "acctbal"],
        "2024-06-01",
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str], compare_cols: list[str]
) -> DataFrame:
    """CDC between two snapshots of the same table: emit one row per key
    that was added, removed, or changed (same key, different compare
    columns) — unchanged keys are filtered out before anything leaves
    the join, so the output is proportional to the churn, not the table.
    The standard full-outer-join diff that feeds incremental pipelines
    when no changelog exists."""
    o = old.select(*key_cols, *compare_cols).alias("__o")
    n = new.select(*key_cols, *compare_cols).alias("__n")
    cond = None
    for k in key_cols:
        c = F.col(f"__o.{k}").eqNullSafe(F.col(f"__n.{k}"))
        cond = c if cond is None else (cond & c)
    old_missing = F.col(f"__o.{key_cols[0]}").isNull()
    new_missing = F.col(f"__n.{key_cols[0]}").isNull()
    changed = None
    for c in compare_cols:
        d = ~F.col(f"__o.{c}").eqNullSafe(F.col(f"__n.{c}"))
        changed = d if changed is None else (changed | d)
    change_type = (
        F.when(old_missing, F.lit("added"))
        .when(new_missing, F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    keys = [
        F.coalesce(F.col(f"__n.{k}"), F.col(f"__o.{k}")).alias(k) for k in key_cols
    ]
    return (
        o.join(n, cond, "full_outer")
        .select(*keys, change_type.alias("change_type"))
        .filter(F.col("change_type") != "same")
    )


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver surface for MERGE: deterministic updates (every 5th
    customer upgraded) + inserts (synthetic keys above the domain)
    against the customer base."""
    base = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", F.round("c_acctbal", 2).alias("acctbal")
    )
    updates = (
        base.filter(F.col("c_custkey") % 5 == 0)
        .withColumn("c_mktsegment", F.lit("UPGRADED"))
        .withColumn("acctbal", F.round(F.col("acctbal") + 100.0, 2))
    ).unionByName(
        base.filter(F.col("c_custkey") % 100 == 0).select(
            (F.col("c_custkey") + 10000000).alias("c_custkey"),
            F.concat(F.lit("new-"), F.col("c_name")).alias("c_name"),
            F.lit("FRESH").alias("c_mktsegment"),
            F.lit(0.0).alias("acctbal"),
        )
    )
    return merge_upsert(base, updates, ["c_custkey"])


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver surface for snapshot CDC: new snapshot drops every 10th
    customer and re-segments every 3rd — diff must emit exactly the
    churn."""
    old = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("acctbal")
    )
    new = (
        old.filter(F.col("c_custkey") % 10 != 0)
        .withColumn(
            "c_mktsegment",
            F.when(F.col("c_custkey") % 3 == 0, F.lit("MOVED")).otherwise(
                F.col("c_mktsegment")
            ),
        )
    )
    return snapshot_diff(old, new, ["c_custkey"], ["c_mktsegment", "acctbal"])


def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over a partitioned frame —
    the value-navigation window family (complements rank/lag/lead)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(full).alias("first_order"),
        F.last("o_orderkey").over(full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(full).alias("second_order"),
    )


def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function battery over synthesized per-row arrays:
    sequence/slice/reverse/contains/union/position — all codegen HOFs."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 4)
    seq = F.sequence(F.lit(1), F.col("l_linenumber"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.size(seq).alias("seq_len"),
        F.array_join(F.reverse(seq), ",").alias("rev_csv"),
        F.array_join(F.slice(seq, 1, 2), ",").alias("first2_csv"),
        F.array_contains(seq, 3).alias("has_3"),
        F.array_position(seq, 2).cast("long").alias("pos_of_2"),
        # sorted before joining: array_union's first-occurrence order is
        # engine-specific, the sorted set is not
        F.array_join(
            F.sort_array(F.array_union(seq, F.array(F.lit(9), F.lit(1)))), ","
        ).alias("union_csv"),
    )


def q_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction, field access, and JSON serialization —
    nested-type plumbing the reference's flat schema never needed."""
    o = _t(spark, sf_dir, "orders")
    st = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("prio"),
    )
    return o.select(
        "o_orderkey",
        st.getField("status").alias("st_status"),
        st.getField("prio").alias("st_prio"),
        F.to_json(st).alias("st_json"),
    )


def q_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL passthrough (SURVEY §2 O19, ``Main.py:277-321``): the engine
    executes raw SQL text over catalog-registered tables — here the
    statement is written in the dialect subset both Spark and DuckDB
    parse identically, so the oracle runs the very same string."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(SQL_PASSTHROUGH_TEXT)


SQL_PASSTHROUGH_TEXT = (
    "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt "
    "FROM orders GROUP BY o_orderstatus, o_orderpriority"
)


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native UNPIVOT (wide -> long): melt the conditional-pivot output
    back into (group, bucket, qty) rows — the inverse reshaping
    operator.  Spark's unpivot is a zero-shuffle narrow transform over
    the already-aggregated frame."""
    wide = q_agg_conditional_pivot(spark, sf_dir)
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty_open", "qty_filled"],
        variableColumnName="bucket",
        valueColumnName="qty",
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped benchmark queries (dates adapted to the synthetic range
# 1995-2001; partsupp-free subset of the classic suite)
# ---------------------------------------------------------------------------

def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority (TPC-H Q3 shape): top 10 unshipped orders by
    revenue for one market segment."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-01-01")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-01-01")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (TPC-H Q5 shape): revenue by nation where
    customer and supplier share the nation, for one region and year."""
    region = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "AMERICA", "EUROPE"))
    )
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    supplier = F.broadcast(_t(spark, sf_dir, "supplier"))
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .withColumnRenamed("n_name", "nation")
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue-change (TPC-H Q6 shape): one tight scan with
    every predicate pushed to parquet, single global agg."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.09)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): top 20 customers by
    lost revenue from returned lineitems in one quarter-ish window."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.round(F.max("c_acctbal"), 2).alias("acctbal"),
        )
        .withColumnRenamed("n_name", "nation")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1, exact): the full 8-aggregate
    form incl. sum_charge (price*(1-disc)*(1+tax)) and avg_price.
    One scan with the shipdate predicate pushed down, one hash agg on a
    2-value x 2-value key — map-side partial aggregation collapses the
    shuffle to ~|groups| x partitions rows regardless of input size."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-mode priority (TPC-H Q12 shape): big-join then
    conditional aggregation on the join output.  The synthetic lineitem
    has no l_shipmode/commitdate, so l_returnflag stands in as the
    grouping dimension; the topology (lineitem shuffle-joins orders on
    orderkey, CASE-counts by o_orderpriority class) is Q12's."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (TPC-H Q14): % of revenue from PROMO parts in
    one month.  part is broadcast (dim side), lineitem's date predicate
    is pushed to the scan; the ratio-of-sums is computed in one agg."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    part = F.broadcast(_t(spark, sf_dir, "part").select("p_partkey", "p_type"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), disc_price).otherwise(0.0)
    promo_sum = F.sum(promo.cast("decimal(20,6)")).cast("double")
    total_sum = F.sum(disc_price.cast("decimal(20,6)")).cast("double")
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        F.round(100.0 * promo_sum / total_sum, 4).alias("promo_revenue")
    )


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape): semi-join-then-agg —
    count orders having at least one returned lineitem, by priority.
    The semi-join deduplicates lineitem matches BEFORE the aggregation
    (an inner join would overcount), and Spark's left-semi build keeps
    only the key column from the probe side."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    returned = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customer (TPC-H Q18 shape): HAVING-filtered agg
    subquery (orders whose total quantity clears a threshold) joined
    back to orders+customer, top-k by price.  The heavy agg runs FIRST
    and its tiny survivor set drives the joins — broadcast after AQE
    sees the post-HAVING cardinality."""
    big_orders = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        # HAVING filters the RAW sum (oracle semantics); rounding happens
        # only in the projection — filtering the rounded value would
        # diverge for fractional sums in (150, 150.005)
        .agg(F.sum("l_quantity").alias("qty_raw"))
        .filter(F.col("qty_raw") > 150)
        .select("l_orderkey", F.round(F.col("qty_raw"), 2).alias("total_qty"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(big_orders, orders.o_orderkey == big_orders.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice"), 2).alias("price"),
            "total_qty",
        )
        .orderBy(F.col("price").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping (TPC-H Q7 shape): revenue between two nation
    PAIRS by year — the double-dimension-join topology (nation joined
    twice under different roles).  Both nation copies broadcast; the
    pair predicate runs after both joins; the big lineitem⋈orders
    shuffle keys on orderkey."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    supplier = F.broadcast(_t(spark, sf_dir, "supplier"))
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
        )
    )
    # a band of nation pairs rather than one symmetric pair, so the
    # query has non-trivial output even at the smallest scale factors
    pair = F.col("supp_nation").isin("NATION_0", "NATION_1", "NATION_2") & F.col(
        "cust_nation"
    ).isin("NATION_3", "NATION_4", "NATION_5")
    return (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nkey"))
        .join(n2, F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("yr"))
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): a 6-way join feeding a
    ratio-of-conditional-sums per year — the share of one supplier
    nation (NATION_3) in a region's order volume for one part type family."""
    part = F.broadcast(
        _t(spark, sf_dir, "part").filter(F.col("p_type").startswith("STANDARD"))
    )
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = _t(spark, sf_dir, "customer")
    supplier = F.broadcast(_t(spark, sf_dir, "supplier"))
    n_cust = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
        )
    )
    n_supp = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    region = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target_volume = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(0.0)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n_cust, F.col("c_nationkey") == F.col("cn_key"))
        .join(region, F.col("cn_region") == region.r_regionkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(n_supp, F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.round(
                F.sum(target_volume.cast("decimal(20,6)")).cast("double")
                / F.sum(volume.cast("decimal(20,6)")).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (TPC-H Q19 shape): disjunction of conjunctive
    brand/size/quantity predicates spanning BOTH join sides.  Catalyst
    must split the OR into per-side pushable conjuncts (brand/size reach
    the part scan, quantity the lineitem scan) while the cross-side
    residual evaluates on the join output — the classic disjunctive-
    pushdown stress test."""
    li = _t(spark, sf_dir, "lineitem")
    part = F.broadcast(_t(spark, sf_dir, "part"))
    joined = li.join(part, li.l_partkey == part.p_partkey)
    case1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size") <= 10)
        & (F.col("l_quantity") >= 1)
        & (F.col("l_quantity") <= 15)
    )
    case2 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size") <= 25)
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 30)
    )
    return joined.filter(case1 | case2).agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=>): rows whose keys are BOTH null match
    each other, unlike ordinary equality where null never joins.
    Exercised over a derived nullable key."""
    orders = _t(spark, sf_dir, "orders")
    left = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "P", None)
        .otherwise(F.col("o_orderstatus"))
        .alias("k"),
    )
    right = (
        orders.select(
            F.when(F.col("o_orderstatus") == "P", None)
            .otherwise(F.col("o_orderstatus"))
            .alias("k")
        )
        .distinct()
        .withColumn("tag", F.concat(F.lit("grp-"), F.coalesce(F.col("k"), F.lit("null"))))
    )
    return (
        left.join(right, left.k.eqNullSafe(right.k))
        .select("o_orderkey", "tag")
    )


def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (small x small): region x order-status grid."""
    r = _t(spark, sf_dir, "region").select("r_name")
    s = _t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s)


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance (sample), correlation,
    covariance, and argmin/argmax (min_by/max_by)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
            F.min_by("l_orderkey", "l_extendedprice").alias("cheapest_order"),
            F.max_by("l_orderkey", "l_extendedprice").alias("priciest_order"),
        )
    )


def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (continuous quantiles) per group —
    Spark's percentile == DuckDB's quantile_cont."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("p50_qty"),
            F.round(F.percentile("l_extendedprice", F.lit(0.9)), 6).alias("p90_price"),
        )
    )


def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): one set per
    dimension, no combined or grand-total rows."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt, "
        "round(SUM(o_totalprice), 2) AS total FROM orders_gs "
        "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))"
    )


def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch (approx_count_distinct).  Sketch estimates
    are engine-defined -> rows-only driver check; the relative-error
    contract is asserted in tests instead."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"))
    )


def q_hll_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible error contract for the rows-only HLL sketch
    (the ``percentile_error_bound`` pattern): per group,
    approx_count_distinct at rsd=0.02 must land within 10% of the exact
    distinct count — 5x the sketch's one-sigma bound, so the boolean is
    deterministic-in-practice on the fixed testdata (measured at
    sf0.01: max relative error 0.011 across groups).  Group keys come
    from the data, the boolean is pinned, so the row is fully
    oracle-checkable.  Plan: ONE aggregation computes both the sketch
    and the exact count (two partial aggs over the same shuffle)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.count_distinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= 0.1 * F.col("exact_parts")
            ).alias("within_bound"),
        )
    )


def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile via the KLL-style quantile sketch
    (percentile_approx) — mergeable partials, bounded memory, the
    100 TB path for quantiles.  Sketch outputs are engine-defined ->
    rows-only driver check; the rank-error contract vs the exact
    percentile is pinned in tests."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50_price_approx"),
            F.percentile_approx("l_extendedprice", 0.9, 1000).alias("p90_price_approx"),
        )
    )


def q_percentile_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible error contract for the rows-only quantile sketch
    (the ``ann_recall`` pattern): the true rank of percentile_approx's
    p50 must land within [0.49, 0.51] of each group's distribution —
    the sketch guarantees rank error <= 1/accuracy = 0.001, checked
    with 10x slack.  Group keys come from the data, the boolean is
    pinned, so the row is fully oracle-checkable (measured at sf0.01:
    ranks within 0.0007 of 0.5 in every group).  Plan: one broadcast of
    the 3-row sketch output back onto the fact scan, two aggregations
    total."""
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    ap = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("ap50")
    )
    return (
        li.join(F.broadcast(ap), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            (
                F.sum((F.col("l_extendedprice") < F.col("ap50")).cast("long"))
                / F.count("*")
            ).alias("frac_lt"),
            (
                F.sum((F.col("l_extendedprice") <= F.col("ap50")).cast("long"))
                / F.count("*")
            ).alias("frac_le"),
        )
        .select(
            "l_returnflag",
            ((F.col("frac_lt") <= 0.51) & (F.col("frac_le") >= 0.49)).alias(
                "within_bound"
            ),
        )
    )


def merge_agg_states(
    base_agg: DataFrame, delta_agg: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Merge two partial-aggregate states (same schema: keys + summable
    measures) into one — the algebra behind incremental rollup
    maintenance: a stored agg table absorbs a delta batch's agg without
    rescanning base data.  Works for any commutative-monoid measures
    (count, sum — incl. DECIMAL money sums; avg must be carried as
    sum+count).  Full-outer join on the keys, null-safe measure adds."""
    measures = [c for c in base_agg.columns if c not in key_cols]
    cond = None
    for k in key_cols:
        c = F.col(f"__a.{k}").eqNullSafe(F.col(f"__d.{k}"))
        cond = c if cond is None else (cond & c)
    return (
        base_agg.alias("__a")
        .join(delta_agg.alias("__d"), cond, "full_outer")
        .select(
            *[
                F.coalesce(F.col(f"__a.{k}"), F.col(f"__d.{k}")).alias(k)
                for k in key_cols
            ],
            *[
                (
                    F.coalesce(F.col(f"__a.{m}"), F.lit(0))
                    + F.coalesce(F.col(f"__d.{m}"), F.lit(0))
                ).alias(m)
                for m in measures
            ],
        )
    )


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: orders split into a stored
    partition (90%) and a delta batch (every 10th key); each side is
    aggregated independently and the states are MERGED — the oracle
    recomputes the aggregate over the full table, so a hash match
    proves merge(agg(a), agg(b)) == agg(a ∪ b) on these measures.  At
    100 TB this is the difference between rescanning a petabyte rollup
    input and absorbing a day's delta: both sides' aggs are
    partial-agg-sized, and the merge joins |keys| rows."""
    orders = _t(spark, sf_dir, "orders")

    # the money state stays DECIMAL through the merge and rounds ONCE
    # at the end: merging two money_sum outputs (rounded doubles) would
    # re-introduce exactly the order-dependent double addition the
    # DECIMAL accumulator exists to avoid
    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus", "o_orderpriority").agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(20,6)")).alias("total_state"),
        )

    base = agg(orders.filter(F.col("o_orderkey") % 10 != 0))
    delta = agg(orders.filter(F.col("o_orderkey") % 10 == 0))
    merged = merge_agg_states(base, delta, ["o_orderstatus", "o_orderpriority"])
    return merged.select(
        "o_orderstatus",
        "o_orderpriority",
        "n_orders",
        F.round("total_state", 2).cast("double").alias("total_price"),
    )


def q_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile feature bucketing (the QuantileDiscretizer / feature-
    binning pass of a training pipeline): assign every lineitem its
    within-group price quartile via ntile(4) under a pinned total order
    (price, then orderkey/linenumber so ties are engine-independent),
    plus each quartile's exact row count.  One shuffle (the window
    partition); the oracle recomputes NTILE under the identical order.
    At scale the same shape bins by any feature column; for
    approximate-but-single-pass bins use percentile_approx boundaries
    instead (agg_approx_percentile)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    w = W.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    binned = li.withColumn("quartile", F.ntile(4).over(w).cast("int"))
    return (
        binned.groupBy("l_returnflag", "quartile")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
        )
    )


def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: per-order sorted quantity vector (collect_list
    -> sort_array for determinism) + array length.  The query surface
    serializes the array to a CSV string because the driver's pandas
    canonicalizer cannot sort list-typed cells; the underlying operator
    stays array-typed (quantities are integral, so a bigint cast is
    value-preserving on both engines)."""
    qtys = F.sort_array(F.collect_list(F.col("l_quantity").cast("bigint")))
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.array_join(F.transform(qtys, lambda x: x.cast("string")), ",").alias("qtys"),
            F.count("*").alias("n_lines"),
        )
    )


def q_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode (UNNEST): classic word count over documents."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.functions.columns import (
        tokens,
    )

    docs = cached_scan(spark, f"{sf_dir}/documents.parquet")
    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-algebra battery: nullif / coalesce / null-safe predicate."""
    c = _t(spark, sf_dir, "customer")
    seg_or_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg_or_null.alias("seg_nullable"),
        F.coalesce(seg_or_null, F.lit("SUPPRESSED")).alias("seg_filled"),
        F.col("c_mktsegment").eqNullSafe(F.lit("BUILDING")).alias("is_building"),
    )


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two overlapping key sets."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 250000).select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return a.union(b).distinct()


# ---------------------------------------------------------------------------
# Window functions (extension; O9 is the degenerate global case)
# ---------------------------------------------------------------------------

def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/row_number per customer by totalprice desc.
    Partitioned window -> fully parallel (no global funnel)."""
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rn", "rnk")
    )


def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each customer's order history (gap analysis)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey", 1).over(w).alias("prev_order"),
        F.lead("o_orderkey", 1).over(w).alias("next_order"),
        F.datediff("o_orderdate", F.lag("o_orderdate", 1).over(w)).cast("long").alias(
            "days_since_prev"
        ),
    )


def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: ntile / percent_rank / cume_dist."""
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-based window frame: trailing-30-day spend per customer.
    Range frames are tie-insensitive (same-day orders aggregate
    identically regardless of intra-day order)."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "day_no", F.datediff("o_orderdate", F.lit("1990-01-01").cast("date")).cast("long")
    )
    w = W.partitionBy("o_custkey").orderBy("day_no").rangeBetween(-30, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "day_no",
        F.round(F.sum(F.col("o_totalprice").cast("decimal(20,6)")).over(w), 2).cast("double").alias("spend_30d"),
    )


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) spend per customer — rows-unbounded frame."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.round(F.sum(F.col("o_totalprice").cast("decimal(20,6)")).over(w), 2).cast("double").alias("running_spend")
    )


# ---------------------------------------------------------------------------
# Set operations (O17 + extensions)
# ---------------------------------------------------------------------------

def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL accumulate (O17) of two disjoint projections."""
    o = _t(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 200000).select(
        "o_orderkey", F.lit("high").alias("bucket")
    )
    lo = o.filter(F.col("o_totalprice") <= 200000).select(
        "o_orderkey", F.lit("low").alias("bucket")
    )
    return hi.unionByName(lo)


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): custkeys appearing in both O- and F-status
    orders."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers minus those with a 'P'-status order."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.subtract(o)


# ---------------------------------------------------------------------------
# Scalar functions (O4 tail: string/date/json/case)
# ---------------------------------------------------------------------------

def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiplicity-preserving: min of the two counts)."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.intersectAll(b)


def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery: sqrt/ln/exp/power/abs/ceil/floor/mod."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.log(F.col("l_quantity") + 1), 6).alias("ln_qty"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.pow("l_quantity", 2), 2).alias("qty_sq"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.ceil("l_tax").alias("tax_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.pmod("l_orderkey", F.lit(7)).alias("key_mod7"),
    )


def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column algebra: create_map / element_at / map_keys /
    map_contains_key (values verified against their scalar origins)."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import (
        read_events,
    )

    ev = read_events(spark, sf_dir)
    m = F.create_map(
        F.lit("etype"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return ev.select(
        "event_id",
        F.element_at(m, "etype").alias("etype"),
        F.element_at(m, "uid").alias("uid_str"),
        # CSV-joined keys: the driver canonicalizer can't hash list cells.
        F.array_join(F.map_keys(m), ",").alias("keys"),
        F.map_contains_key(m, "etype").alias("has_etype"),
    )


def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery: substring/upper/length/concat/replace."""
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace(F.col("p_type"), " ", "_").alias("type_snake"),
    )


def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery: year/month/trunc/datediff vs a fixed epoch."""
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("days_since_95"),
    )


def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (the reference's from_json-shaped parse, O13 tail):
    events.props is a JSON object string -> pull int key 'k'."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import (
        read_events,
    )

    return read_events(spark, sf_dir).select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


def q_filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / regex predicates + regexp_extract (absent in the
    reference, SURVEY §2.2 extension)."""
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type").like("%ED%"))
        .select(
            "p_partkey",
            "p_type",
            F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
            F.col("p_name").rlike("o").alias("has_o"),
        )
    )


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: parts priced above the global
    average (SQL API; Catalyst plans the subquery as a broadcast)."""
    _t(spark, sf_dir, "part").createOrReplaceTempView("part_sq")
    return spark.sql(
        "SELECT p_partkey, round(p_retailprice, 2) AS price FROM part_sq "
        "WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part_sq)"
    )


def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: daily event counts per type with
    zero-filled missing days — sequence+explode builds the calendar
    spine, cross join with the type dimension, left join the counts.
    The spine is tiny (days x types), so both joins broadcast."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import (
        read_events,
    )

    ev = read_events(spark, sf_dir)
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    types = ev.select("event_type").distinct()
    grid = days.crossJoin(types)
    counts = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count("*").alias("cnt")
    )
    return grid.join(counts, ["day", "event_type"], "left").select(
        "day", "event_type", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )


def q_timeseries_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward imputation (the other standard
    gap policy next to gapfill's zero-fill): build the same daily
    calendar spine per event type, then fill missing days with
    last(value, ignorenulls) over an unbounded-preceding frame —
    windowed per type, so no global sort; days before the first
    observation stay NULL (locf has nothing to carry)."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import (
        read_events,
    )

    ev = read_events(spark, sf_dir)
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    types = ev.select("event_type").distinct()
    grid = days.crossJoin(types)
    daily = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        money_sum(F.col("value")).alias("day_value")
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(daily, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.last("day_value", ignorenulls=True).over(w).alias("locf_value"),
        )
    )


def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + conditional counts per segment."""
    c = _t(spark, sf_dir, "customer").withColumn(
        "bal_bucket",
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high"),
    )
    return c.groupBy("c_mktsegment", "bal_bucket").agg(F.count("*").alias("cnt"))


def q_literal_stamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal column append (O18): one driver-side constant on all rows."""
    return _t(spark, sf_dir, "region").select(
        "r_regionkey",
        "r_name",
        F.lit("run-0001").alias("run_tag"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("stamped_at"),
    )


# ---------------------------------------------------------------------------
# Data-quality expectations, funnel, heavy hitters, ratio-to-report, skyline
# ---------------------------------------------------------------------------

def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality audit: each expectation is an independent
    scan+aggregate (or anti-join) producing one (check_name, violations,
    passed) row; the union of single-row aggregates is driver-cheap and
    every check parallelizes over its own table.  Includes a check that
    FAILS on this corpus (error events present) so both verdict branches
    are exercised."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    lineitem = _t(spark, sf_dir, "lineitem")
    events = _t(spark, sf_dir, "events")

    def check(name: str, violations: DataFrame) -> DataFrame:
        return violations.select(
            F.lit(name).alias("check_name"),
            F.col("violations"),
            (F.col("violations") == 0).alias("passed"),
        )

    fk = check(
        "orders_custkey_fk",
        orders.join(
            customer.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_anti"
        ).agg(F.count("*").alias("violations")),
    )
    uniq = check(
        "customer_custkey_unique",
        customer.groupBy("c_custkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count("*").alias("violations")),
    )
    domain = check(
        "lineitem_qty_domain",
        lineitem.filter((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).agg(
            F.count("*").alias("violations")
        ),
    )
    dead_letter = check(
        "events_no_error_type",
        events.filter(F.col("event_type") == "error").agg(F.count("*").alias("violations")),
    )
    return fk.unionByName(uniq).unionByName(domain).unionByName(dead_letter)


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream: users whose
    first 'view' precedes a later 'click' precedes a later 'purchase'.
    Each stage is a conditional min-aggregate keyed by user_id joined
    back to the (filtered) stream — three shuffles on the same key, so
    AQE/co-partitioning reuses the exchange; no window over the full
    stream and no per-user event collection."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(step: int, name: str, users: DataFrame) -> DataFrame:
        return users.agg(F.count("*").alias("users")).select(
            F.lit(step).alias("step"), F.lit(name).alias("stage"), "users"
        )

    return (
        stage(1, "view", v)
        .unionByName(stage(2, "click", c))
        .unionByName(stage(3, "purchase", p))
    )


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: users holding > 0.8% of all events.  Two
    aggregations (per-key counts + a global count broadcast back); the
    threshold test uses integer cross-multiplication so no float enters
    the predicate.  At 100 TB this is the exact verifier downstream of a
    count-min/approx_top_k sketch pre-filter."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    total = ev.agg(F.count("*").alias("total"))
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("cnt") * 1000 > F.col("total") * 8)
        .select(
            "user_id",
            "cnt",
            (F.col("cnt").cast("double") / F.col("total")).alias("share"),
        )
    )


_CMS_D = 4          # hash rows
_CMS_W = 256        # counters per row
_CMS_P = 2_147_483_647  # Mersenne prime 2^31-1
_CMS_A = [982_451_653, 715_827_883, 179_424_673, 32_452_843]
_CMS_B = [12_345, 67_891, 24_679, 98_765]


def _cms_bucket(key: Column, i: int) -> Column:
    """i-th Count-Min bucket: ((k·a_i + b_i) mod p) mod w — pure int64
    arithmetic, identical on any engine (no engine-specific hash)."""
    return (
        (key.cast("long") % _CMS_P * _CMS_A[i] + _CMS_B[i]) % _CMS_P
    ) % _CMS_W


def q_cms_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over event user counts, reduced to its two laws
    as a driver-checkable row (the invariant-row pattern for sketches):

    * ``overestimate_ok`` — STRUCTURAL: a CMS estimate (min over d
      row-counters) can never undercount, because every occurrence of a
      key lands in each of its d counters.
    * ``bound_ok`` — every key's overestimate is within 2N/w of truth
      (the e/w·N Markov bound with slack; deterministic on fixed data).

    Why CMS at 100 TB: the exact ``heavy_hitters`` groupBy carries one
    state entry per DISTINCT key; the sketch is d·w integers NO MATTER
    the key cardinality, mergeable across partitions (counter-wise
    add), and its candidates feed the exact verifier.  Plan: the
    counter table is ONE explode->groupBy over (row, bucket) — at most
    d·w rows out; the law check joins exact per-key counts to their d
    counters (bucket equi-joins) and aggregates two booleans."""
    ev = _t(spark, sf_dir, "events").select(F.col("user_id").cast("long").alias("k"))
    buckets = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _cms_bucket(F.col("k"), i).alias("bucket")
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("rb")
    ).select("rb.row", "rb.bucket")
    counters = buckets.groupBy("row", "bucket").agg(F.count("*").alias("counter"))
    exact = ev.groupBy("k").agg(F.count("*").alias("true_cnt"))
    est = exact
    for i in range(_CMS_D):
        ci = counters.filter(F.col("row") == i).select(
            F.col("bucket").alias(f"b{i}"), F.col("counter").alias(f"c{i}")
        )
        est = est.join(F.broadcast(ci), _cms_bucket(F.col("k"), i) == F.col(f"b{i}"))
    estimate = F.least(*[F.col(f"c{i}") for i in range(_CMS_D)])
    total = ev.agg(F.count("*").alias("total"))
    return (
        est.select("k", "true_cnt", estimate.alias("est"))
        .crossJoin(F.broadcast(total))
        .agg(
            F.sum((F.col("est") < F.col("true_cnt")).cast("long")).alias("n_under"),
            F.sum(
                (
                    (F.col("est") - F.col("true_cnt")) * _CMS_W
                    > 2 * F.col("total")
                ).cast("long")
            ).alias("n_out_of_bound"),
        )
        .select(
            F.lit("count_min").alias("method"),
            (F.col("n_under") == 0).alias("overestimate_ok"),
            (F.col("n_out_of_bound") == 0).alias("bound_ok"),
        )
    )


def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index distinct counting (the groupBitmap / roaring
    pattern): per (day, event_type), distinct users via OR-folded
    bitmap chunks — each user sets bit (user mod 63) of chunk
    (user div 63); popcount of the OR'd chunks sums to the exact
    distinct count.  63 bits per chunk, not 64: shifting into a signed
    long's sign bit is an overflow ERROR in DuckDB (Spark wraps
    silently), so the cross-engine contract stays off bit 63.  The law
    column pins bitmap == count_distinct in the same row.

    Why at scale: count_distinct's partial state is a hash set of the
    keys seen (unbounded); the bitmap's partial state is
    ceil(|domain|/64) longs with counter-free exact merges (bitwise
    OR is idempotent AND commutative — re-delivered rows are free,
    unlike sketch adds), the exact-distinct analogue of the CMS
    trade.  Plan: one explode-free groupBy on (day, type, chunk) then
    a re-agg summing popcounts — two skinny shuffles."""
    ev = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.col("user_id").cast("long").alias("uid"),
    )
    chunks = (
        ev.groupBy(
            "day",
            "event_type",
            (F.col("uid") / 63).cast("long").alias("chunk"),
        )
        .agg(
            F.bit_or(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (F.col("uid") % 63).cast("int")
                )
            ).alias("bits")
        )
    )
    per_group = chunks.groupBy("day", "event_type").agg(
        F.sum(F.bit_count("bits")).alias("distinct_users_bitmap")
    )
    exact = ev.groupBy("day", "event_type").agg(
        F.count_distinct("uid").alias("distinct_users_exact")
    )
    return per_group.join(exact, ["day", "event_type"]).select(
        "day",
        "event_type",
        "distinct_users_bitmap",
        "distinct_users_exact",
        (F.col("distinct_users_bitmap") == F.col("distinct_users_exact")).alias(
            "bitmap_exact"
        ),
    )


def q_window_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report window: each order's share of its customer's
    lifetime spend.  The per-partition total accumulates in DECIMAL
    (money_sum discipline — window sums in double are
    partition-order-dependent) and only the final ratio is a double."""
    w = W.partitionBy("o_custkey")
    tot = F.sum(F.col("o_totalprice").cast("decimal(20,6)")).over(w)
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("price"),
        (F.col("o_totalprice") / tot.cast("double")).alias("share"),
    )


def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts where no other part is both
    cheaper-or-equal and larger-or-equal (strict somewhere) on
    (p_retailprice, p_size).  Physical plan is the O(n log n) sort-based
    skyline, NOT the naive quadratic NOT-EXISTS self-join: sort by
    (price asc, size desc); a point survives iff its size strictly
    exceeds the running max size of all strictly-better-sorted points.

    Two-phase for scale: phase 1 prunes partition-locally (same window
    keyed by the physical partition id — dominated points stay dominated
    globally, so the survivor set is a superset of the true skyline and
    the result is deterministic regardless of partition assignment);
    phase 2 runs the exact single-partition pass over the tiny survivor
    set.  The full table is never globally sorted."""
    d = (
        _t(spark, sf_dir, "part")
        .select(F.col("p_retailprice").alias("price"), F.col("p_size").alias("size"))
        .distinct()
    )
    order = [F.col("price").asc(), F.col("size").desc()]
    frame = (W.unboundedPreceding, -1)

    local = W.partitionBy("pid").orderBy(*order).rowsBetween(*frame)
    pruned = (
        d.withColumn("pid", F.spark_partition_id())
        .withColumn("mx", F.max("size").over(local))
        .filter(F.col("mx").isNull() | (F.col("size") > F.col("mx")))
        .drop("pid", "mx")
    )
    glob = W.orderBy(*order).rowsBetween(*frame)
    return (
        pruned.withColumn("mx", F.max("size").over(glob))
        .filter(F.col("mx").isNull() | (F.col("size") > F.col("mx")))
        .select("price", "size")
    )


def zorder_value(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton/Z-order interleave of the low ``bits`` bits of two keys —
    the standard lakehouse multi-column clustering value: sorting (or
    repartitionByRange-ing) by it keeps rows that are close in BOTH key
    dimensions inside the same files, so scans filtering on either key
    prune most files.  Pure integer column algebra (shifts/masks fold
    into one codegen projection); for production layouts raise ``bits``
    and feed range-bucketed (not raw) key values."""
    import functools

    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return functools.reduce(lambda a, b: a + b, terms)


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering mapping for orders on (custkey, orderkey):
    the z-value plus its range bucket (the file a range-partitioned
    writer would place the row in)."""
    o = _t(spark, sf_dir, "orders")
    z = zorder_value(
        F.col("o_custkey").bitwiseAND(F.lit(255)),
        F.col("o_orderkey").bitwiseAND(F.lit(255)),
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        z.cast("long").alias("zval"),
        F.floor(z / 1024).cast("long").alias("layout_bucket"),
    )


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler (the Deequ/Glue-crawler 'profile this
    table' primitive): per column — row count, null count, distinct
    count, min, max, all rendered as strings so one schema covers every
    column type.

    Plan (optimization r13, guide §2.2 shuffle fewer bytes): the plain
    metrics (count, null counts, min/max x5) ride ONE ungrouped agg —
    grouping keys are empty, so even the string-buffered SortAggregate
    needs no Sort — and each count_distinct runs as its OWN single-
    column branch (hash-dedup the column, then count: all-HashAggregate
    both phases).  The former single-aggregate form planned the classic
    multi-distinct Expand (6 projections = 6x the input rows) whose
    16-wide agg carried string min/max buffers, demoting BOTH agg
    phases to SortAggregate over two full sorts of 6n rows (plan
    before: 2 Sorts of 900k x 16 at sf0.1; at 100 TB that is sorting
    6x the table twice to profile it).  The split branches read the
    same total bytes (parquet column pruning: each distinct branch
    scans exactly one column), sort nothing, and join as six 1-row
    broadcasts.  The per-column rows are unpacked driver-free with
    inline() over a literal struct array; output O(columns).  At 100 TB
    swap count_distinct for approx_count_distinct per column (the HLL
    entry documents the bound); the profile shape is unchanged.  Values
    are stringified via date/long-safe casts only (no raw double
    rendering — engines disagree on float formatting)."""
    o = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null_{c}"),
            F.min(F.col(c)).cast("string").alias(f"min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"max_{c}"),
        ]
    wide = o.agg(*aggs)
    for c in cols:
        wide = wide.crossJoin(
            F.broadcast(o.agg(F.count_distinct(F.col(c)).alias(f"dist_{c}")))
        )
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_rows"),
                F.col(f"null_{c}").alias("n_null"),
                F.col(f"dist_{c}").alias("n_distinct"),
                F.col(f"min_{c}").alias("min_val"),
                F.col(f"max_{c}").alias("max_val"),
            )
            for c in cols
        ]
    )
    return wide.select(F.inline(rows))


def q_pyds_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource scan (Spark 4 DataSource API): read the
    deterministic synthetic tick source and aggregate per series — the
    proof that a Python-defined relation behaves as a first-class scan
    (partitioned, executor-side generation, schema'd).  The DuckDB
    oracle regenerates the identical relation from generate_series, so
    the hash match proves the source is replayable.  See
    sources/pyds.py for the 100 TB rationale."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources import pyds

    pyds.register(spark)
    ticks = (
        spark.read.format("synthetic_ticks")
        .option("n", "5000")
        .option("partitions", "8")
        .load()
    )
    return ticks.groupBy("series").agg(
        F.count("*").alias("n_ticks"),
        F.sum("cents").alias("sum_cents"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    )


def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariantType semi-structured path (Spark 4): parse the events
    props JSON into a VARIANT once, then extract typed fields with
    variant_get — the open-schema ingestion pattern (variant keeps the
    full document queryable without a pinned struct, at binary-encoded
    access speed instead of per-query string re-parsing; this is the
    engine-native successor to get_json_object chains).  Output is
    exact integers; the oracle is DuckDB's JSON path extraction over
    the same column."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'long')").alias("k"),
    ).withColumn("k_bucket", F.col("k") % 10).filter(F.col("k").isNotNull())


def zone_map(
    df: DataFrame,
    layout_key: Column,
    layout_name: str,
    stat_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Zone-map (data-skipping index) build: bucket rows by their
    position under a physical layout key and record per-bucket min/max
    of a predicate column — exactly the per-row-group statistics a
    parquet writer embeds and a 100 TB scan prunes with.  The bucket is
    ``floor(key * n / (max_key + 1))`` (scale-free range placement, one
    broadcast 1-row max agg), so the operator models "what would this
    layout's row groups look like" without writing files.  One scan +
    one |buckets|-row hash agg; all stats exact."""
    mx = df.agg(F.max(layout_key.cast("long")).alias("mx"))
    return (
        df.crossJoin(F.broadcast(mx))
        .withColumn(
            "zm_bucket",
            F.floor(
                layout_key.cast("long") * F.lit(int(n_buckets)) / (F.col("mx") + 1)
            ).cast("long"),
        )
        .groupBy("zm_bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(stat_col).alias("zmin"),
            F.max(stat_col).alias("zmax"),
        )
        .select(F.lit(layout_name).alias("layout"), "zm_bucket", "n_rows", "zmin", "zmax")
    )


def q_zonemap_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping audit: zone maps over lineitem's shipdate under
    two physical layouts — shipdate-ranged (what a time-partitioned /
    date-sorted table gives: zones are tight, so a 6-month predicate
    prunes almost everything) and suppkey-ranged (uncorrelated with the
    predicate column: every zone spans the full date range, nothing
    prunes).  ``scanned`` marks buckets a 1997-H1 shipdate predicate
    must read.  This is the measurement that justifies layout choices
    (zorder_layout's re-clustering, time-partitioned sinks) before
    rewriting 100 TB: pruning power is a property of layout-predicate
    correlation, quantified here from stats alone — no data rewrite,
    no second scan."""
    li = _t(spark, sf_dir, "lineitem")
    lo, hi = "1997-01-01", "1997-06-30"
    ship_days = F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01"))
    zm = zone_map(li, ship_days, "shipdate_range", "l_shipdate").unionAll(
        zone_map(li, F.col("l_suppkey"), "suppkey_range", "l_shipdate")
    )
    scanned = ~(
        (F.col("zmax") < F.lit(lo).cast("timestamp"))
        | (F.col("zmin") > F.lit(hi).cast("timestamp"))
    )
    return zm.select(
        "layout",
        "zm_bucket",
        "n_rows",
        F.col("zmin").cast("string").alias("zmin"),
        F.col("zmax").cast("string").alias("zmax"),
        scanned.alias("scanned"),
    )


# ---------------------------------------------------------------------------
# Rendezvous (highest-random-weight) shard assignment
# ---------------------------------------------------------------------------


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    out_col: str = "shard",
) -> DataFrame:
    """Rendezvous / HRW shard assignment (Thaler & Ravishankar 1996,
    the scheme behind Kafka/Riak-style placement): each key goes to the
    shard with the highest hash weight md5(key ':' shard) — the
    consistent placement whose defining property is MINIMAL MOVEMENT under
    elastic resharding (growing N -> N+1 relocates only the keys the
    NEW shard wins, ~1/(N+1) of them; every other key's winning weight
    is unchanged).  Modulo sharding (``key % N``) moves ~all keys on a
    resize — the difference is the whole point, and ``q_reshard_law``
    pins it as a driver-checked contract.

    Determinism: the weight is the first 14 hex chars of md5 (56 bits,
    exact in a long) — engine-neutral like every hash recipe in this
    repo (sample.py:390).  The argmax is ONE groupBy max over
    ``weight * 16 + shard`` (shard < 16 rides the low nibble, so max()
    decodes to the winning shard with ties broken toward the higher
    shard id — no window, no per-key sort; map-side combine does the
    fold).  Scale shape: |keys| x N narrow rows into a keyed hash agg;
    N is a small constant, so this is O(N) work per key with zero
    skew — exactly how a 1000-executor run places 100 TB of keys.
    """
    if not 0 < n_shards <= 16:
        raise ValueError("rendezvous_assign packs shard ids in a nibble: 1 <= N <= 16")
    k = F.col(key_col).cast("string")
    s = F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias("sh")
    w = F.conv(
        F.substring(F.md5(F.concat(k, F.lit(":"), F.col("sh").cast("string"))), 1, 14),
        16,
        10,
    ).cast("long")
    packed = df.select(F.col(key_col), s).withColumn("packed", w * 16 + F.col("sh"))
    return (
        packed.groupBy(key_col)
        .agg(F.max("packed").alias("mx"))
        .select(
            F.col(key_col),
            (F.col("mx") % 16).cast("int").alias(out_col),
            (F.col("mx") / F.lit(16)).cast("long").alias(f"{out_col}_weight"),
        )
    )


def q_rendezvous_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document HRW placement at N=8 and N=9 side by side, with the
    per-key movement flag.  Everything hashed is exact integers (md5
    weights, packed argmax) — no floats anywhere."""
    docs = cached_scan(spark, f"{sf_dir}/documents.parquet").select("doc_id")
    a8 = rendezvous_assign(docs, "doc_id", 8, "shard8")
    a9 = rendezvous_assign(docs, "doc_id", 9, "shard9")
    return (
        a8.join(a9, "doc_id")
        .select(
            "doc_id",
            "shard8",
            "shard9",
            (F.col("shard8") != F.col("shard9")).alias("moved"),
        )
    )


def q_reshard_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible elastic-resharding contract for rendezvous
    placement, one row:

      * ``moved_to_new_only`` — STRUCTURAL: a key whose shard changes
        when N grows 8 -> 9 can only have been won by the NEW shard 8
        (all other shards' weights are identical in both runs, so the
        old argmax stands unless shard 8 beats it).
      * ``moved_frac_ok`` — STATISTICAL: the moved fraction sits in a
        wide band around the ideal 1/9 (~11.1%); band [4%, 25%] holds
        at any sf (56-bit uniform weights; per-key move probability is
        exactly 1/9 independent across keys).
      * ``balance_ok`` — no shard under N=8 holds more than 3x the
        ideal 1/8 share (uniform weights spread keys evenly — the
        anti-hotspot property that makes HRW a placement you can ship).
    """
    pl = q_rendezvous_shard(spark, sf_dir)
    per_shard = pl.groupBy("shard8").agg(F.count("*").alias("c"))
    mx_share = per_shard.agg(F.max("c").alias("max_c"))
    law = pl.agg(
        F.count("*").alias("n_keys"),
        F.sum(F.when(F.col("moved"), 1).otherwise(0)).alias("n_moved"),
        F.sum(
            F.when(F.col("moved") & (F.col("shard9") != 8), 1).otherwise(0)
        ).alias("n_moved_elsewhere"),
    )
    return law.crossJoin(F.broadcast(mx_share)).select(
        "n_keys",
        "n_moved",
        (F.col("n_moved_elsewhere") == 0).alias("moved_to_new_only"),
        (
            (F.col("n_moved") * 100 >= F.col("n_keys") * 4)
            & (F.col("n_moved") * 100 <= F.col("n_keys") * 25)
        ).alias("moved_frac_ok"),
        (F.col("max_c") * 8 <= F.col("n_keys") * 3).alias("balance_ok"),
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE)
# ---------------------------------------------------------------------------

# Identical statement text runs on Spark and DuckDB (the
# sql_passthrough pattern): a synthetic decimal-digit hierarchy over
# part keys (parent = floor(key/10), root = 0) walked to the root with
# a recursive CTE, then a per-depth rollup.  Exercises Spark 4's
# WITH RECURSIVE execution (iterative union with a loop guard) —
# the declarative sibling of the hand-unrolled iterations in
# graph.pagerank / shortest_hops.  Depth is bounded by the key's digit
# count (~6 levels), so the fixpoint terminates without a LIMIT guard.
RECURSIVE_CTE_TEXT = (
    "WITH RECURSIVE walk AS ("
    "  SELECT p_partkey AS pk, p_partkey AS cur, 0 AS depth FROM part"
    "  UNION ALL"
    "  SELECT pk, CAST(floor(cur / 10.0) AS BIGINT) AS cur, depth + 1 AS depth"
    "  FROM walk WHERE cur > 0"
    ") "
    "SELECT depth, CAST(count(*) AS BIGINT) AS n_nodes, "
    "CAST(sum(pk) AS BIGINT) AS sum_pk, CAST(sum(cur) AS BIGINT) AS sum_cur "
    "FROM walk GROUP BY depth"
)


# per-process cache of the part-catalog row count feeding the
# recursion guard's provable bound (review r12: the eager count ran
# on every invocation, timed bench reps included)
_PART_COUNT_CACHE: dict[str, int] = {}


def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE ancestor walk (Spark 4 surface).  The engine and
    the oracle run the VERY SAME statement; all outputs are exact
    integers.  At 100 TB the recursive union materializes one
    generation per step with the same keyed-shuffle shape as the
    unrolled BFS in graph.shortest_hops — the CTE form simply lets the
    planner own the loop.

    Scale note (r12 sf1 sweep): Spark's runaway-recursion guard
    ``spark.sql.cteRecursionRowLimit`` defaults to 1e6 rows, which a
    >=48k-part catalog legitimately exceeds (each part walks one
    generation per decimal digit of its key: <= 20 generations + the
    seed, so <= 21*n_parts rows total — RECURSION_ROW_LIMIT_EXCEEDED
    fired at 2M parts).  The guard is scaled to that provable bound —
    never disabled — via one bounded driver-side count (the documented
    collect pattern); the 100-level depth guard stays far above the
    walk's 20.

    Guard scoping (review r12): the raised limit and the ``part`` temp
    view live on a child session (``spark.newSession()`` — shared
    SparkContext/cached data, ISOLATED SQLConf + view catalog), so the
    runaway-recursion guard on the caller's session is untouched for
    every later recursive query; and the driver-side count is cached
    per (sf_dir) so repeated invocations — bench timed reps included —
    pay it once per process."""
    n_parts = _PART_COUNT_CACHE.get(sf_dir)
    if n_parts is None:
        n_parts = _PART_COUNT_CACHE[sf_dir] = _t(spark, sf_dir, "part").count()
    sub = spark.newSession()
    ensure_engine_confs(sub)
    _t(sub, sf_dir, "part").createOrReplaceTempView("part")
    sub.conf.set(
        "spark.sql.cteRecursionRowLimit",
        str(max(1_000_000, n_parts * 21)),
    )
    return sub.sql(RECURSIVE_CTE_TEXT)


# ---------------------------------------------------------------------------
# Derived partsupp catalog + the five TPC-H shapes that need it
# ---------------------------------------------------------------------------


def partsupp_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H ``partsupp`` surface reconstructed from supply events:
    distinct (part, supplier) pairs OBSERVED in lineitem — FK-correct by
    construction, unlike an independent synthetic assignment — with
    deterministic integer availqty / supplycost-in-cents formulas.  The
    driver's testdata ships no partsupp table (VERDICT r4 noted
    Q2/Q9/Q11/Q16/Q20 as unimplementable for that reason); this derived
    catalog closes the gap with a recipe the DuckDB oracle replays
    verbatim.  Money is integer CENTS (no decimal division anywhere),
    so every downstream aggregate is exact int64.

    Plan shape: one distinct over (partkey, suppkey) longs — the only
    wide op; the formula columns are narrow arithmetic.  At 100 TB the
    distinct is a keyed shuffle of two longs per lineitem row."""
    li = _t(spark, sf_dir, "lineitem")
    ps = (
        li.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
        .withColumn(
            "ps_availqty",
            ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13) % 9999 + 1).cast(
                "long"
            ),
        )
        .withColumn(
            "ps_supplycost_cents",
            ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 99900 + 100).cast(
                "long"
            ),
        )
    )
    return ps


# The identical derivation as a SQL CTE for the DuckDB oracles.
PARTSUPP_CTE = (
    "partsupp AS (SELECT ps_partkey, ps_suppkey, "
    "CAST((ps_partkey * 7 + ps_suppkey * 13) % 9999 + 1 AS BIGINT) AS ps_availqty, "
    "CAST((ps_partkey * 31 + ps_suppkey * 17) % 99900 + 100 AS BIGINT) "
    "AS ps_supplycost_cents "
    "FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey "
    "FROM lineitem))"
)


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): for small ECONOMY parts,
    the EUROPE supplier(s) offering the part at the region's minimum
    supplycost.  The correlated MIN subquery is decorrelated into a
    per-part min aggregate joined back on (part, cost) — the standard
    Catalyst-friendly form; all dims (supplier, nation, region) ride
    broadcasts onto the derived partsupp.  Money exact integer cents.
    Ref shape: TPC-H Q2 with p_type/p_size adapted to the synthetic
    domain (SURVEY §8.2 date-adaptation precedent)."""
    ps = partsupp_frame(spark, sf_dir)
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "ECONOMY")
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_ps = ps.join(
        F.broadcast(eu_supp), ps.ps_suppkey == F.col("s_suppkey")
    ).join(F.broadcast(part), ps.ps_partkey == F.col("p_partkey"))
    min_cost = (
        eu_ps.groupBy("ps_partkey")
        .agg(F.min("ps_supplycost_cents").alias("min_cost_cents"))
        .select(F.col("ps_partkey").alias("mc_partkey"), "min_cost_cents")
    )
    return (
        eu_ps.join(
            min_cost,
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost_cents") == F.col("min_cost_cents")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "p_brand",
            "ps_supplycost_cents",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): profit by nation and order year
    for parts whose name contains 'red'.  profit is EXACT integer
    ten-thousandths: cents(extprice)·(100 - cents(discount)) -
    supplycost_cents·qty·100 summed per group — no decimal division,
    no double summation (the money_sum concern solved by staying
    integer end-to-end).  Plan: part filter broadcasts onto lineitem,
    the (part, supp)-keyed join attaches the derived catalog, orders
    joins on orderkey (the one big-big shuffle), supplier->nation
    broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    ps = partsupp_frame(spark, sf_dir)
    ep_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    d_c = F.round(F.col("l_discount") * 100).cast("long")
    qty = F.col("l_quantity").cast("long")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            (ep_c * (100 - d_c) - F.col("ps_supplycost_cents") * qty * 100).alias(
                "amount_1e4"
            ),
        )
    )
    return (
        joined.groupBy("nation", "o_year")
        .agg(F.sum("amount_1e4").alias("profit_1e4"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): partkeys whose inventory value at
    ASIA's suppliers exceeds 1.5x the nation's MEAN per-part value — TPC-H's fixed
    global fraction empties as the catalog grows, so the threshold is
    mean-relative and the scope is a REGION (a single nation can have
    zero suppliers at tiny scale — 10 suppliers over 25 nations); the HAVING is a broadcast
    1-row total and an integer cross-multiplied comparison
    (value·n·2 > total·3), no float threshold.  All exact cents."""
    ps = partsupp_frame(spark, sf_dir)
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nsup = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    nps = ps.join(F.broadcast(nsup), ps.ps_suppkey == F.col("s_suppkey"))
    val = nps.groupBy("ps_partkey").agg(
        F.sum(F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("value_cents")
    )
    total = val.agg(
        F.sum("value_cents").alias("total_cents"), F.count("*").alias("n_parts")
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * F.col("n_parts") * 2 > F.col("total_cents") * 3)
        .select("ps_partkey", "value_cents")
        .orderBy(F.col("value_cents").desc(), "ps_partkey")
    )


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (supplier relationship): distinct-supplier counts per
    (brand, type, size) for non-Brand#13, non-PROMO parts of 8 pinned
    sizes, EXCLUDING flagged suppliers (negative account balance — the
    synthetic stand-in for Q16's complaint predicate, the testdata
    carrying no s_comment).  The NOT IN subquery is the broadcast
    anti-join; part attrs broadcast onto the derived partsupp."""
    ps = partsupp_frame(spark, sf_dir)
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    flagged = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("ps_suppkey")
    )
    kept = ps.join(F.broadcast(flagged), "ps_suppkey", "left_anti").join(
        F.broadcast(part), ps.ps_partkey == F.col("p_partkey")
    )
    return (
        kept.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): NATION_3 suppliers holding
    excess stock — availqty > half the 1997 shipped quantity of that
    exact (part, supplier) pair — for parts named 'red ...'.  The
    nested correlated aggregate decorrelates into a (part, supp)-keyed
    1997 quantity rollup joined to the catalog; the comparison is
    integer cross-multiplied (availqty·2 > qty).  Semi-join reduces to
    a distinct-supplier projection joined to the nation dim."""
    ps = partsupp_frame(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty_1997"))
    )
    excess = (
        ps.join(F.broadcast(part), ps.ps_partkey == F.col("p_partkey"))
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey) & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("ps_availqty") * 2 > F.col("qty_1997"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(excess, supp.s_suppkey == excess.ps_suppkey)
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def q_cascade_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR-style cascade delete audit (right-to-be-forgotten): purge a
    deterministic customer set (md5-selected ~1.5%), cascade through
    orders to lineitem, and emit the per-table audit — rows before,
    deleted, after, and the REFERENTIAL ORPHAN COUNT after the purge
    (kept children whose parent was deleted; must be 0, and the audit
    computes it rather than asserting it — the dq_expectations stance
    that a compliance job proves its own invariant).

    Plan shape: the delete set and the cascaded order-key set drive
    broadcast anti-joins (delete sets are small relative to the
    corpus); every count is one agg; the orphan checks are anti-join
    counts over the kept side.  At 100 TB this is the standard
    tombstone-then-rewrite pass: nothing here requires more state than
    the broadcast key sets."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    del_cust = cust.filter(
        F.md5(F.col("c_custkey").cast("string")) < "04"
    ).select("c_custkey")
    del_orders = orders.join(
        F.broadcast(del_cust), orders.o_custkey == del_cust.c_custkey
    ).select("o_orderkey")
    kept_orders = orders.join(
        F.broadcast(del_cust), orders.o_custkey == del_cust.c_custkey, "left_anti"
    )
    kept_li = li.join(F.broadcast(del_orders), li.l_orderkey == del_orders.o_orderkey, "left_anti")
    kept_cust = cust.join(F.broadcast(del_cust), "c_custkey", "left_anti")

    # orphan audits over the KEPT side: children whose parent is gone
    orphan_orders = kept_orders.join(
        kept_cust.select("c_custkey"), kept_orders.o_custkey == F.col("c_custkey"), "left_anti"
    )
    orphan_li = kept_li.join(
        kept_orders.select(F.col("o_orderkey").alias("ko")),
        kept_li.l_orderkey == F.col("ko"),
        "left_anti",
    )

    def audit(name, before_df, kept_df, orphan_df):
        b = before_df.agg(F.count("*").alias("n_before"))
        k = kept_df.agg(F.count("*").alias("n_after"))
        o = orphan_df.agg(F.count("*").alias("n_orphans"))
        return (
            b.crossJoin(k)
            .crossJoin(o)
            .select(
                F.lit(name).alias("table_name"),
                "n_before",
                (F.col("n_before") - F.col("n_after")).alias("n_deleted"),
                "n_after",
                "n_orphans",
            )
        )

    empty = cust.limit(0)
    return (
        audit("customer", cust, kept_cust, empty)
        .unionByName(audit("orders", orders, kept_orders, orphan_orders))
        .unionByName(audit("lineitem", li, kept_li, orphan_li))
    )


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction PLANNER: assign daily ingest partitions
    (orders per o_orderdate day) to target-size output files with the
    first-fit running-sum quotient rule — file_id = exclusive running
    row sum div target — the planning half of compact_parquet_dir
    (sources/writers.py), computed from stats alone before any data is
    rewritten (the zonemap_prune stance: decide layout work from
    metadata, not a second scan).

    Outputs are exact integers; the running sum is a |days|-row window
    (partition counts, not rows) — at genuinely huge day counts the
    two-level carry decomposition of session_concurrency applies
    unchanged.  Contiguous days land in the same output file, so the
    compacted layout preserves date clustering (zone maps stay tight —
    the zonemap_prune measurement is the why)."""
    orders = _t(spark, sf_dir, "orders")
    target = 4096
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").alias("n_rows")
    )
    from pyspark.sql import Window as W

    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, -1)
    return (
        daily.withColumn("cum_before", F.coalesce(F.sum("n_rows").over(w), F.lit(0)))
        .select(
            "day",
            "n_rows",
            "cum_before",
            F.expr(f"cum_before div {target}").alias("file_id"),
        )
    )


def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join — per customer, the top-3
    orders by price under a pinned total order.  The API-surface point:
    Spark decorrelates the per-row ORDER BY ... LIMIT subquery into a
    per-key distributed top-k (WindowGroupLimit partial below the
    shuffle, final above — verified in-plan), NOT a nested loop, so the
    declarative 'for each row, run this query' form costs one keyed
    shuffle at any scale.  DuckDB executes the IDENTICAL statement
    text, so the oracle is the same string (the sql_passthrough
    pattern extended to lateral correlation — the oracle IS
    SQL_LATERAL_TEXT verbatim)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(SQL_LATERAL_TEXT)


SQL_LATERAL_TEXT = (
    "SELECT c.c_custkey, o.o_orderkey, o.o_totalprice "
    "FROM customer c, "
    "LATERAL (SELECT o_orderkey, o_totalprice FROM orders "
    "WHERE o_custkey = c.c_custkey "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o"
)


def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two generations of the same feed whose
    column sets drifted (v1 carries name, v2 carries balance + segment)
    union BY NAME with missing columns null-filled — the
    ``unionByName(allowMissingColumns=True)`` surface every long-lived
    ingestion hits, vs positional UNION ALL which would silently
    misalign.  A ``gen`` literal tags provenance.

    Plan: one scan feeding both projections (Spark reuses the
    exchange-free scan), zero shuffles — union is plan-level."""
    cust = cached_scan(spark, f"{sf_dir}/customer.parquet")
    v1 = cust.select(
        "c_custkey", "c_name", F.lit(1).cast("long").alias("gen")
    )
    v2 = cust.select(
        "c_custkey", "c_acctbal", "c_mktsegment",
        F.lit(2).cast("long").alias("gen"),
    )
    return v1.unionByName(v2, allowMissingColumns=True).select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "c_name",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
        "c_mktsegment",
        "gen",
    )


def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained conversion funnel: view -> click -> purchase
    where each transition must land within 7 DAYS of the previous
    stage's first occurrence — the funnel PMs actually read (an
    unbounded funnel credits a purchase eleven months after the view;
    the windowed one measures the campaign).  Per stage: surviving
    users, conversion ppm from the previous stage, and the exact mean
    transition lag in whole seconds.

    Same three co-keyed conditional min-agg shuffles as q_funnel (the
    exchange-reuse shape) plus the interval predicate; lags subtract
    microsecond epochs (NTZ cast — the shift cancels in the
    difference) and floor via positive-operand div.  Output: 3 rows."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    win = F.expr("INTERVAL 7 DAYS")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"), F.min("t2").alias("t2"))
    )

    def lag_s(a: str, b: str):
        return F.expr(
            f"(unix_micros(cast({b} as timestamp)) - "
            f"unix_micros(cast({a} as timestamp)))"
        )

    nv = v.agg(F.count("*").alias("nv"))
    nc = c.agg(
        F.count("*").alias("nc"), F.sum(lag_s("t1", "t2")).alias("lc")
    )
    np_ = p.agg(
        F.count("*").alias("np"), F.sum(lag_s("t2", "t3")).alias("lp")
    )
    wide = nv.crossJoin(nc).crossJoin(np_)
    return wide.select(
        F.expr(
            "stack(3, "
            "CAST(1 AS BIGINT), 'view', CAST(nv AS BIGINT), "
            "CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), "
            "CAST(2 AS BIGINT), 'click', CAST(nc AS BIGINT), "
            "CASE WHEN nv > 0 THEN (1000000 * nc) div nv END, "
            "CASE WHEN nc > 0 THEN (lc div nc) div 1000000 END, "
            "CAST(3 AS BIGINT), 'purchase', CAST(np AS BIGINT), "
            "CASE WHEN nc > 0 THEN (1000000 * np) div nc END, "
            "CASE WHEN np > 0 THEN (lp div np) div 1000000 END"
            ") AS (step, stage, users, conv_ppm, mean_lag_s)"
        )
    ).select(
        "step", "stage",
        F.col("users").cast("long").alias("users"),
        F.col("conv_ppm").cast("long").alias("conv_ppm"),
        F.col("mean_lag_s").cast("long").alias("mean_lag_s"),
    )


def q_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema's foreign
    keys: per relationship, child rows, orphans (child keys with no
    parent), and the orphan rate in exact ppm — the data-quality gate a
    warehouse runs after every load (an orphan lineitem silently
    vanishes from every inner join downstream; this row makes the loss
    loud BEFORE the revenue numbers quietly shrink).

    Plan: each check is one LEFT-ANTI join (parent side reduced to its
    key column, broadcast when dim-sized) plus a count — no row ever
    widens; NULL child keys count as orphans (they too vanish from
    inner joins).  Output: one row per audited relationship."""
    li = cached_scan(spark, f"{sf_dir}/lineitem.parquet")
    orders = cached_scan(spark, f"{sf_dir}/orders.parquet")
    cust = cached_scan(spark, f"{sf_dir}/customer.parquet")
    part = cached_scan(spark, f"{sf_dir}/part.parquet")
    supp = cached_scan(spark, f"{sf_dir}/supplier.parquet")

    def audit(name, child, ck, parent, pk):
        c = child.select(F.col(ck).alias("k"))
        p = parent.select(F.col(pk).alias("k")).distinct()
        n = c.agg(F.count("*").alias("n_child"))
        o = c.join(p, "k", "left_anti").agg(F.count("*").alias("n_orphans"))
        return n.crossJoin(o).select(
            F.lit(name).alias("relationship"),
            F.col("n_child").cast("long").alias("n_child"),
            F.col("n_orphans").cast("long").alias("n_orphans"),
            F.expr(
                "CASE WHEN n_child > 0 THEN (1000000 * n_orphans) "
                "div n_child END"
            ).cast("long").alias("orphan_ppm"),
        )

    rows = [
        audit("lineitem->orders", li, "l_orderkey", orders, "o_orderkey"),
        audit("lineitem->part", li, "l_partkey", part, "p_partkey"),
        audit("lineitem->supplier", li, "l_suppkey", supp, "s_suppkey"),
        audit("orders->customer", orders, "o_custkey", cust, "c_custkey"),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def q_dim_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-coverage audit — the converse of q_fk_integrity_audit:
    that one finds fact rows pointing at MISSING dimension rows; this
    one finds dimension rows no fact ever references (dead catalog
    entries, stale customers, suppliers that never shipped).  High
    unreferenced ppm is how a star schema quietly accretes load that
    every broadcast and every dim scan then pays for.

    Per relationship: dimension row count, referenced count (distinct
    fact keys ∩ dim — NULL fact keys never match, they're the OTHER
    audit's finding), and the exact unreferenced ppm.

    Plan: per relationship one distinct-key agg over the fact column
    (map-side partial) + one key join against the dim — at 100 TB the
    distinct-key side is dim-sized after the agg, so AQE broadcasts
    it; output exactly 3 rows."""
    li = cached_scan(spark, f"{sf_dir}/lineitem.parquet")
    od = cached_scan(spark, f"{sf_dir}/orders.parquet")
    rels = [
        ("orders->customer",
         cached_scan(spark, f"{sf_dir}/customer.parquet")
         .select(F.col("c_custkey").alias("k")),
         od.select(F.col("o_custkey").alias("fk"))),
        ("lineitem->part",
         cached_scan(spark, f"{sf_dir}/part.parquet")
         .select(F.col("p_partkey").alias("k")),
         li.select(F.col("l_partkey").alias("fk"))),
        ("lineitem->supplier",
         cached_scan(spark, f"{sf_dir}/supplier.parquet")
         .select(F.col("s_suppkey").alias("k")),
         li.select(F.col("l_suppkey").alias("fk"))),
    ]
    outs = []
    for name, dim, fact in rels:
        refd = fact.filter(F.col("fk").isNotNull()).distinct()
        outs.append(
            dim.join(refd, dim.k == refd.fk, "left")
            .agg(
                F.lit(name).alias("relationship"),
                F.count("*").cast("long").alias("n_dim_rows"),
                F.count("fk").cast("long").alias("n_referenced"),
            )
            .select(
                "relationship", "n_dim_rows", "n_referenced",
                F.expr(
                    "CASE WHEN n_dim_rows > 0 THEN (1000000 * "
                    "(n_dim_rows - n_referenced)) div n_dim_rows END"
                ).cast("long").alias("unreferenced_ppm"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (pandas ``merge_asof(direction='nearest')``):
    for every 'click', the same-user 'view' with the SMALLEST absolute
    time distance, looking both ways — the missing direction of the
    as-of family (q_join_asof backward, q_join_asof_fwd forward).

    Tie contract (pinned in the oracle, since 'nearest' leaves ties
    implementation-defined): at equal distance the BACKWARD match wins;
    among equal-ts backward views the MAX view_id (q_join_asof's
    contract), among equal-ts forward views the MIN view_id
    (q_join_asof_fwd's).  Distance is exact whole microseconds.

    Plan: the nearest view overall is necessarily either the nearest
    at-or-before or the nearest at-or-after, so BOTH candidates come
    from one union + ONE user-keyed sort (two window frames over the
    same partitioning — one exchange, no theta join, no per-key loop);
    the argmin is then a row-local comparison.  Same single-shuffle
    scale shape as the rest of the family."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import (
        read_events,
    )

    ev = read_events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id"),
        F.lit(0).alias("tag"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"),
        F.lit(1).alias("tag"),
    )
    merged = views.unionByName(
        clicks.withColumn("view_id", F.lit(None).cast("long")),
        allowMissingColumns=True,
    )
    us = F.expr("unix_micros(cast(ts as timestamp))")
    merged = merged.withColumn("us", us)
    # backward frame: equal-ts views sort before the click (tag 0 < 1)
    # and last() lands the MAX equal-ts view_id; forward frame: the
    # same ascending order means first() past the click lands the MIN
    # view_id, and equal-ts views (earlier in the order) are NOT in the
    # following frame — they are already the backward candidate at
    # distance 0, which wins every tie anyway.
    wb = (
        W.partitionBy("user_id").orderBy("ts", "tag", "view_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("user_id").orderBy("ts", "tag", "view_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = (
        merged
        .withColumn("b_id", F.last("view_id", ignorenulls=True).over(wb))
        .withColumn(
            "b_us",
            F.last(F.when(F.col("tag") == 0, F.col("us")),
                   ignorenulls=True).over(wb),
        )
        .withColumn("f_id", F.first("view_id", ignorenulls=True).over(wf))
        .withColumn(
            "f_us",
            F.first(F.when(F.col("tag") == 0, F.col("us")),
                    ignorenulls=True).over(wf),
        )
    )
    d_b = F.col("us") - F.col("b_us")
    d_f = F.col("f_us") - F.col("us")
    pick_b = F.col("b_id").isNotNull() & (
        F.col("f_id").isNull() | (d_b <= d_f)
    )
    return (
        carried.filter(F.col("tag") == 1)
        .filter(F.col("b_id").isNotNull() | F.col("f_id").isNotNull())
        .select(
            "click_id", "user_id",
            F.when(pick_b, F.col("b_id")).otherwise(F.col("f_id"))
            .cast("long").alias("nearest_view_id"),
            F.when(pick_b, d_b).otherwise(d_f)
            .cast("long").alias("abs_diff_us"),
        )
    )


def q_line_number_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-number density audit: per order status, how many orders'
    l_linenumber sequences are NOT dense 1..n — the partial-load /
    double-load screen for any ingest that appends line files (a gap
    means lines were dropped; a duplicate means a file replayed; both
    break every "lines per order" readout silently).  Dense means
    min = 1 AND max = n AND distinct = n, so duplicates cannot mask a
    gap (dup+gap keeps max = count but fails the distinct term).

    Exactness: all counts exact; gapped_ppm is the wrap-safe two-step
    floor per status.  Plan: one orderkey-keyed agg over (orderkey,
    linenumber) pairs (count-distinct expands internally), one keyed
    join to orders for the status, one <=|statuses|-key agg.  Output
    O(|statuses|) rows."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.analytics import (
        _ppm2,
    )

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.countDistinct("l_linenumber").alias("n_distinct"),
        F.min("l_linenumber").alias("mn"),
        F.max("l_linenumber").alias("mx"),
    )
    od = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    flagged = per_order.join(
        od, per_order["l_orderkey"] == od["o_orderkey"]
    ).withColumn(
        "gapped",
        (
            (F.col("mn") != 1)
            | (F.col("mx") != F.col("n_lines"))
            | (F.col("n_distinct") != F.col("n_lines"))
        ).cast("long"),
    )
    agg = flagged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum("gapped").alias("n_gapped"),
        F.max("n_lines").alias("max_lines"),
    )
    return agg.select(
        "o_orderstatus",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("n_gapped").cast("long").alias("n_gapped"),
        F.expr(_ppm2("n_gapped", "n_orders")).cast("long")
        .alias("gapped_ppm"),
        F.col("max_lines").cast("long").alias("max_lines"),
    )
