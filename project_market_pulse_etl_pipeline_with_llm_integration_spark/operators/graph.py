"""Graph operators: fixed-point integer PageRank over the
customer-supplier trade graph.

Companion to the pointer-jumping connected components in dedup.py —
together they cover the two classic iterative-graph shapes (label
propagation and weighted rank propagation) that a corpus-curation
pipeline needs (e.g. domain-authority weighting of crawl sources).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.guards import (
    guard_int64,
)
from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import cached_scan


# Fixed-point scale: ranks are longs in units of 1e-9 "rank mass".
PR_INIT = 1_000_000_000
# Damping 0.85 expressed as an integer ratio so every step is exact
# integer arithmetic (order-independent, cross-engine deterministic).
PR_NUM, PR_DEN = 85, 100
PR_TELEPORT = (100 - PR_NUM) * PR_INIT // PR_DEN  # 0.15 * INIT


def trade_rel(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """The distinct customer<->supplier relationship set behind the
    trade graph — and streaming twin #10's state: set union is a
    commutative IDEMPOTENT monoid, so the relationship catalog
    maintains incrementally (each lineitem micro-batch stream-static
    joins its orders slice and union+distincts into the stored set;
    re-delivered lines are absorbed by idempotence — no counting
    state to corrupt).  O(relationships) rows: the relationship
    catalog, not the order log."""
    return (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("cust"),
            (-F.col("l_suppkey")).alias("supp"),
        )
        .distinct()
    )


def trade_edges_from_rel(rel: DataFrame) -> DataFrame:
    """Bidirectional edge list from the relationship set (twin #10
    readout path shares it with every batch graph query)."""
    fwd = rel.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
    rev = rel.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    return fwd.unionAll(rev)


def trade_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Bidirectional customer<->supplier edge list from the order flow:
    an edge per distinct trading relationship.  Node ids are disjoint
    (customers keep their key, suppliers are offset to the negative
    range) so one rank vector covers both sides of the bipartite
    graph."""
    return trade_edges_from_rel(trade_rel(orders, lineitem))


def pagerank_fixed_point(edges: DataFrame, iters: int = 5) -> DataFrame:
    """PageRank in FIXED-POINT INTEGER arithmetic: rank r(v) is a long
    (scale 1e-9); one step is

        r'(v) = TELEPORT + sum over in-neighbors u of
                (85 * r(u)) div (100 * deg(u))

    Every operation is integer multiply / integer div / integer sum —
    exact, associative, order-independent — so after any fixed number
    of iterations both Spark and a SQL oracle produce bit-identical
    longs.  This is the SCALE.md determinism rule applied to an
    iterative algorithm: floats never enter the hashed contract at all
    (a float PageRank sums contributions in engine-dependent order and
    drifts in the last ulp per iteration).  The div truncation loses
    <1e-9 of mass per edge per step — irrelevant for ranking, decisive
    for determinism.

    Plan shape per iteration: one shuffle join (ranks ⋈ edges on src —
    both sides hash-partitioned on the same key, so AQE reuses the
    exchange layout across iterations) + one hash agg on dst with
    map-side partial sums.  Iteration count is FIXED (default 5): at
    100 TB each round is a bounded shuffle of |E| rows and the driver
    loop adds no data movement — the same pattern as the pointer-
    jumping CC (dedup.py), which converges in O(log d) rounds.  Out-
    degrees are computed once and joined into the edge list so the
    per-step join is rank ⋈ prepared-edges only."""
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # pin the loop-invariant relations: without the checkpoint, every
    # iteration's lineage re-derives the degree join and the node
    # distinct (5x the same shuffles inside one action); with it the
    # per-round plan is exactly one join + one agg (bench: 6.0 -> ~2 s)
    ed = (
        edges.join(deg, "src")
        .select("src", "dst", "deg")
        .localCheckpoint(eager=False)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ranks = nodes.withColumn("rank", F.lit(PR_INIT).cast("long"))
    for _ in range(iters):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr(f"({PR_NUM} * rank) div ({PR_DEN} * deg)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        # optimization r13 (guide §2.1 remove shuffles): the node set is
        # loop-invariant (ranks_0 = nodes; each round left-joins back to
        # the same set), so preserve zero-inflow nodes by joining the
        # CHECKPOINTED nodes leaf instead of ranks.select("node").
        # With ranks referenced twice per round the lineage doubled
        # every iteration (2^iters copies of the base plan — the
        # executed trace showed 31 Exchanges, only 8 reused); with it
        # referenced once the plan is linear in iters and every round's
        # join+agg executes exactly once.
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(PR_TELEPORT) + F.coalesce("inflow", F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
        )
    return ranks


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes of the trade graph by 5-iteration fixed-point
    PageRank; hashed contract is (node, rank, pr_rank) — all longs."""
    edges = trade_edges(
        cached_scan(spark, f"{sf_dir}/orders.parquet"),
        cached_scan(spark, f"{sf_dir}/lineitem.parquet"),
    ).localCheckpoint(eager=False)  # deg + ed + nodes all derive from it
    ranks = pagerank_fixed_point(edges, iters=5)
    top = ranks.orderBy(F.col("rank").desc(), "node").limit(20)
    from pyspark.sql import Window as W

    # row_number over the already-limited 20 rows — not the graph
    w = W.orderBy(F.col("rank").desc(), "node")
    return top.select(
        "node", "rank", F.row_number().over(w).cast("long").alias("pr_rank")
    ).orderBy("pr_rank")


def copurchase_edges(lineitem: DataFrame, min_support: int = 2) -> DataFrame:
    """Part co-purchase edges: (a, b) with a < b bought together in at
    least ``min_support`` orders.  The support threshold is the density
    lever — raising it prunes the long tail of coincidental pairs, and
    at 100 TB it is what keeps the edge set (and any triangle join over
    it) sparse.  Same distinct-before-self-join discipline as
    market_basket_pairs."""
    op = (
        lineitem.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .distinct()
        .localCheckpoint(eager=False)  # both self-join sides
    )
    a = op.select("ok", F.col("pk").alias("a"))
    b = op.select("ok", F.col("pk").alias("b"))
    return (
        a.join(b, "ok")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
        .select("a", "b")
    )


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the co-purchase graph: one exact-integer row
    (n_nodes, n_edges, n_triangles) — the classic clustering-structure
    probe (triangle density distinguishes community-structured graphs
    from random ones).

    Plan: edges are stored in a<b orientation, so the enumeration join
    e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c) counts each triangle EXACTLY once with
    no post-hoc dedup — this is the degree-ordered-orientation trick
    (each triangle has a unique smallest-id apex) that bounds the
    intermediate wedge count by Σ out_deg², not Σ deg².  Both joins are
    keyed shuffles; the min_support filter on the edge builder keeps
    the graph sparse enough that wedges stay bounded at scale.  Output
    is three longs — everything exact."""
    edges = copurchase_edges(
        cached_scan(spark, f"{sf_dir}/lineitem.parquet"), min_support=2
    ).localCheckpoint(eager=False)  # e1/e2/e3 + the node census
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = edges.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = edges.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y")
    tris = wedges.join(e3, ["x", "z"])
    nodes = edges.select(F.col("a").alias("n")).unionAll(
        edges.select(F.col("b").alias("n"))
    ).distinct()
    return (
        nodes.agg(F.count("*").alias("n_nodes"))
        .crossJoin(edges.agg(F.count("*").alias("n_edges")))
        .crossJoin(tris.agg(F.count("*").alias("n_triangles")))
    )


def q_shortest_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS reachability profile of the trade graph: hop-distance
    histogram (hop, n_nodes) from the minimum customer key after 4
    rounds of frontier expansion — the connectivity-audit companion to
    pagerank (a supply-chain 'how far is everyone from this account'
    probe).

    Iteration is min-label propagation: d_{k+1}(v) = min(d_k(v),
    1 + min over in-neighbors d_k(u)) — all integer mins, so the fixed
    4-round unrolled SQL oracle matches exactly.  Per round: one
    frontier ⋈ edges shuffle + one min agg; distances only decrease, so
    the state stays one long per reached node.  Same fixed-iteration
    posture as pagerank: at 100 TB each round is a bounded keyed
    shuffle, and the hop histogram output is O(diameter) rows."""
    orders = cached_scan(spark, f"{sf_dir}/orders.parquet")
    lineitem = cached_scan(spark, f"{sf_dir}/lineitem.parquet")
    edges = trade_edges(orders, lineitem).localCheckpoint(eager=False)
    src = orders.agg(F.min("o_custkey").alias("node")).withColumn(
        "hop", F.lit(0).cast("long")
    )
    dist = src
    for _ in range(4):
        nxt = (
            edges.join(dist, edges["src"] == dist["node"])
            .select(F.col("dst").alias("node"), (F.col("hop") + 1).alias("hop"))
        )
        dist = (
            dist.unionAll(nxt)
            .groupBy("node")
            .agg(F.min("hop").alias("hop"))
            # optimization r13 (guide §2.1): dist is inherently
            # referenced TWICE per round (nxt's join input + the union
            # arm), so without a per-round pin the lineage doubles
            # every round — 2^4 copies of the base plan, 61 executed
            # Exchanges with only 10 AQE-reused.  The lazy checkpoint
            # bounds each round to one join + one min-agg executed
            # exactly once (~16 Exchanges total).
            .localCheckpoint(eager=False)
        )
    return dist.groupBy("hop").agg(F.count("*").alias("n_nodes"))


# Packed-argmax radix for label_propagation's adoption agg: labels are
# trade-graph node ids — customers positive, suppliers NEGATIVE
# (trade_rel offsets them to the negative range) — so the low-36-bit
# field stores (2^35 - 1 - label) for |label| < 2^35 (3.4e10 ids per
# side) and vote counts occupy the bits above (c <= 2^27 - 1 per
# (node, label) per round); both bounds enforced by a loud in-plan
# guard.  See the adoption step below.
_LP_PACK_BITS = 36
_LP_PACK = 1 << _LP_PACK_BITS
_LP_HALF = 1 << 35


def label_propagation(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) with a
    DETERMINISTIC tie-break: every node starts labelled with its own
    id; each round, a node adopts the most frequent label among its
    in-neighbors, ties broken by MINIMUM label.  A fixed round count
    (not convergence) keeps the contract engine-exact — the same
    unrolled-rounds recipe as ``pagerank_fixed_point`` and the BPE
    trainer, so a SQL oracle replays each round bit-identically on
    all-integer state.

    The argmax-with-min-tiebreak needs no per-node window: one hash
    agg per round computes ``max(struct(count, -label))`` — struct
    ordering makes the count dominant and the negated label turn MAX
    into min-label-among-ties.  Plan per round: one shuffle join
    (labels ⋈ edges on src, same key both sides, exchange layout
    reused across rounds) + two hash aggs with map-side combine — the
    pagerank shuffle budget.  Loop invariants (edge list, node set)
    sit behind lazy localCheckpoints; rounds are O(|E|) keyed shuffles,
    never all-pairs."""
    ed = edges.select("src", "dst").localCheckpoint(eager=False)
    nodes = (
        ed.select(F.col("src").alias("node"))
        .unionAll(ed.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = nodes.withColumn("label", F.col("node"))
    for _ in range(rounds):
        votes = (
            ed.join(labels, ed["src"] == labels["node"])
            .select(F.col("dst").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count("*").alias("c"))
        )
        # Packed argmax (optimization r13, guide §5 hash-vs-sort agg):
        # max(struct(c, -label)) carries a struct agg buffer, which
        # HashAggregate cannot hold — every round's adoption agg fell
        # back to SortAggregate (sort the whole per-node vote table,
        # twice per round with the partial/final split).  For
        # |label| < 2^35 and c <= 2^27 - 1, lexicographic (c, -label)
        # order equals numeric order of c·2^36 + (2^35 - 1 - label) in
        # one long (both bounds checked by the loud in-plan guard —
        # silent wrap would corrupt adoption).
        votes = guard_int64(
            votes,
            (F.abs(F.col("label")) < F.lit(_LP_HALF))
            & (F.col("c") <= F.lit((2 ** 63 - 1 - (_LP_PACK - 1)) // _LP_PACK)),
            "label_propagation: packed-argmax bound exceeded "
            "(|label| >= 2^35 or vote count > 2^27-1)",
        )
        labels = (
            votes.select(
                "node",
                (F.col("c") * F.lit(_LP_PACK)
                 + (F.lit(_LP_HALF - 1) - F.col("label"))).alias("p"),
            )
            .groupBy("node")
            .agg(F.max("p").alias("p"))
            .select(
                "node",
                (F.lit(_LP_HALF - 1)
                 - F.col("p").bitwiseAND(_LP_PACK - 1)).alias("label"),
            )
        )
    return labels


def kcore_peel(edges: DataFrame, k: int = 3, rounds: int = 4) -> list[DataFrame]:
    """Fixed-round k-core peeling (Seidman 1983 / the Batagelj-Zaversnik
    iterative form): each round drops every node with degree < k and
    all incident edges, for exactly ``rounds`` synchronous rounds — the
    graph-sparsification gate that bounds any downstream triangle /
    community join to the dense core.  Fixed rounds (not to-fixpoint)
    keep the contract engine-exact, the pagerank / label_propagation /
    BFS recipe; the peeling sequence is monotone (edge sets only
    shrink), so round r is the true k-core whenever it equals round
    r-1, and the caller can see convergence directly in the profile.

    Input edges must be BIDIRECTIONAL (both directions present, the
    ``trade_edges`` layout), so out-degree == degree and every live
    node appears as a src.  Returns the per-round edge frames
    [e_1 .. e_rounds]; each sits behind a lazy localCheckpoint so a
    profile query touching all rounds computes every round ONCE
    (without the pin, round-1 stats would re-derive inside round-4's
    lineage — the pagerank loop-invariant lesson).

    Plan shape per round: one degree hash-agg (map-side combine) + two
    semi-joins keyed by node — bounded keyed shuffles of the CURRENT
    edge set, which only shrinks; never all-pairs, no windows."""
    out: list[DataFrame] = []
    e = edges.select("src", "dst")
    for _ in range(rounds):
        keep = (
            e.groupBy("src").agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= k)
            .select(F.col("src").alias("node"))
        )
        e = (
            e.join(keep.withColumnRenamed("node", "src"), "src", "semi")
            .join(keep.withColumnRenamed("node", "dst"), "dst", "semi")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        out.append(e)
    return out


def q_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peeling profile of the trade graph at k=3: one row per round
    with the surviving node and (directed) edge counts — all exact
    longs.  Cited parity: reference has no graph ops (Main.py is a
    pandas ETL); this is north-star extension surface."""
    edges = trade_edges(
        cached_scan(spark, f"{sf_dir}/orders.parquet"),
        cached_scan(spark, f"{sf_dir}/lineitem.parquet"),
    ).localCheckpoint(eager=False)
    stats = None
    for i, e in enumerate(kcore_peel(edges, k=3, rounds=4), start=1):
        row = e.agg(
            F.count_distinct("src").cast("long").alias("n_nodes"),
            F.count("*").cast("long").alias("n_edges"),
        ).select(F.lit(i).cast("long").alias("round"), "n_nodes", "n_edges")
        stats = row if stats is None else stats.unionAll(row)
    return stats


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community sizes after 3 label-propagation rounds on the trade
    graph — hashed contract is (community, n_members), all longs."""
    edges = trade_edges(
        cached_scan(spark, f"{sf_dir}/orders.parquet"),
        cached_scan(spark, f"{sf_dir}/lineitem.parquet"),
    ).localCheckpoint(eager=False)
    return (
        label_propagation(edges, rounds=3)
        .groupBy(F.col("label").alias("community"))
        .agg(F.count("*").cast("long").alias("n_members"))
    )


def link_prediction_ra(edges: DataFrame, top_k: int = 50) -> DataFrame:
    """Resource-Allocation link prediction over an undirected a<b edge
    list (Zhou/Lü/Zhang 2009 — the strongest of the classic local
    similarity indices): for each NON-adjacent pair (x, y), RA(x, y) =
    Σ_{z ∈ N(x)∩N(y)} 1/deg(z).  Here it ranks part pairs the
    co-purchase graph says SHOULD be bought together but aren't yet —
    the complete-the-bundle recommender view.

    Exactness: the score is Σ 1e9 div deg(z) — per-term integer floors
    summed order-independently (the repo's standard transcendental-free
    recipe), so ranking and tie-breaks ((ra desc, x, y)) are engine-
    exact.  Plan: degree rides one agg over the adjacency; the wedge
    enumeration is ONE self-join on the center z (Σ deg(z)² rows — the
    min_support lever on the edge builder is what keeps hubs bounded,
    same posture as triangle_count); known edges drop via a broadcast-
    able anti-join; the top-k is TakeOrdered, never a global sort."""
    adj = edges.select(F.col("a").alias("z"), F.col("b").alias("x")).unionAll(
        edges.select(F.col("b").alias("z"), F.col("a").alias("x"))
    ).localCheckpoint(eager=False)  # wedge sides + degree
    deg = adj.groupBy("z").agg(F.count("*").cast("long").alias("d"))
    zd = adj.join(deg, "z")
    w1 = zd.select("z", F.col("x").alias("pa"), "d")
    w2 = adj.select("z", F.col("x").alias("pb"))
    scored = (
        w1.join(w2, "z")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(
            F.count("*").cast("long").alias("n_common"),
            F.sum(F.expr("1000000000 div d")).cast("long").alias("ra_e9"),
        )
    )
    cand = scored.join(
        edges.select(F.col("a").alias("pa"), F.col("b").alias("pb")),
        ["pa", "pb"],
        "left_anti",
    )
    top = cand.orderBy(F.desc("ra_e9"), "pa", "pb").limit(top_k)
    w = Window.orderBy(F.desc("ra_e9"), "pa", "pb")
    return top.select(
        F.col("pa").alias("part_a"),
        F.col("pb").alias("part_b"),
        "n_common",
        F.col("ra_e9").alias("ra_score_e9"),
        F.row_number().over(w).cast("long").alias("lp_rank"),
    ).orderBy("lp_rank")


def q_link_prediction_ra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 predicted co-purchase links on the part graph."""
    edges = copurchase_edges(
        cached_scan(spark, f"{sf_dir}/lineitem.parquet"), min_support=2
    ).localCheckpoint(eager=False)  # adjacency (x2) + the anti-join side
    return link_prediction_ra(edges, top_k=50)


def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the trade graph: (degree, n_nodes) plus each
    bucket's share ppm — the graph-health audit read before any
    iterative op (a hub-dominated distribution says 'salt the joins /
    raise min_support'; pagerank, triangle_count and link_prediction_ra
    all have their wedge/contrib costs bounded by exactly this
    distribution).

    Exact integers end-to-end; plan is two hash aggs (node degree, then
    histogram) over the bidirectional edge list — output O(distinct
    degrees), no windows, no collects."""
    return degree_distribution_from_rel(trade_rel(
        cached_scan(spark, f"{sf_dir}/orders.parquet"),
        cached_scan(spark, f"{sf_dir}/lineitem.parquet"),
    ))


def degree_distribution_from_rel(rel: DataFrame) -> DataFrame:
    """The q_degree_distribution histogram from the relationship-set
    state alone (streaming twin #10) — never a log rescan."""
    deg = (
        trade_edges_from_rel(rel).groupBy("src").agg(F.count("*").alias("deg"))
        .localCheckpoint(eager=False)  # histogram + total: one edge build
    )
    hist = deg.groupBy("deg").agg(F.count("*").alias("n_nodes"))
    total = deg.agg(F.count("*").alias("n_total"))
    return hist.crossJoin(F.broadcast(total)).select(
        F.col("deg").cast("long").alias("degree"),
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.expr("(1000000 * n_nodes) div n_total").cast("long")
        .alias("share_ppm"),
    )


# Decimal-domain bound for the modularity expected-term: the guard
# keeps 1e6·(2m)² STRICTLY inside DECIMAL(38,0) (and m·1000 inside
# int64 for the within-share _ppm2), so neither engine can silently
# NULL/wrap.  4e6·m² < 10³⁸ needs m < 5e15 strictly — at exactly 5e15
# the worst-case d_c = 2m numerator lands ON 1e38 and Spark's
# non-ANSI decimal NULLs it silently (review r11); 4.9e15 leaves a
# real margin (9.6e37).
MODULARITY_M_LIMIT = 4_900_000_000_000_000  # 4.9e15 edges


def q_nation_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the customer-supplier trade MULTIGRAPH
    under the nation partition — "does geography explain the trade
    structure?".  Every lineitem is one edge between its customer and
    its supplier node; a node's community is its nation.  Per nation c
    the readout emits the within-community edge count e_c, the
    endpoint (degree) mass d_c, and the two modularity terms as exact
    ppm floors:

        within_share_ppm = floor(1e6 · e_c / m)
        expected_ppm     = floor(1e6 · d_c² / (4m²))
        modularity_contrib_ppm = within_share_ppm − expected_ppm

    so Σ_c contrib is the graph's modularity Q in ppm (up to the
    per-term flooring).  Q ≈ 0 says nations trade uniformly; a large
    positive Q says trade is geographically clustered — the readout
    that decides whether nation is a useful blocking/partitioning key
    for the graph family (pagerank, label_propagation).

    Exactness: the within term uses the two-step rational floor
    (_ppm2 — 1e6·e_c would wrap past 9.2e12 edges); the expected term
    forms 1e6·d_c² and 4m² in DECIMAL(38,0) (d_c ≤ 2m, so the guard
    bound m ≤ 5e15 keeps every intermediate inside 38 digits; DuckDB
    runs the same formula in HUGEINT) and the quotient ≤ 1e6 fits the
    BIGINT that Spark's decimal `div` returns.  The subtraction is of
    two already-floored longs — no signed division anywhere, so
    truncate-vs-floor never comes up.

    Plan: one orderkey-keyed join (lineitem·orders), one custkey join
    for the customer nation (AQE broadcasts the dim at small sf,
    sort-merge above), supplier dim broadcast, then ONE hash agg down
    to the <= |nations|² (625) origin-destination matrix — everything
    after that is arithmetic on the tiny matrix (lazily checkpointed:
    it feeds m, the within slice, and the endpoint rollup).  Output
    O(|nations|) rows, no windows, no collects."""
    li = cached_scan(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    ords = cached_scan(spark, f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cust = cached_scan(spark, f"{sf_dir}/customer.parquet").select(
        "c_custkey", F.col("c_nationkey").cast("long").alias("cn")
    )
    supp = cached_scan(spark, f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", F.col("s_nationkey").cast("long").alias("sn")
    )
    nat = cached_scan(spark, f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").cast("long").alias("natkey"),
        F.col("n_name").alias("nation"),
    )
    mat = trade_matrix_state(li, ords, cust, supp)
    return nation_modularity_from_matrix(mat, nat)


def trade_matrix_state(
    li: DataFrame, ords: DataFrame, cust: DataFrame, supp: DataFrame
) -> DataFrame:
    """The <=|nations|² (cn, sn) edge-count matrix — a pure SUM-monoid,
    so the whole modularity readout maintains incrementally from a
    lineitem STREAM: each micro-batch dim-joins its lines and folds
    its partial matrix into state via relational.merge_agg_states
    keyed (cn, sn) (streaming twin pinned in tests/test_streaming.py —
    a GRAPH readout maintained from 625 rows of state)."""
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("cn", "sn")
        .agg(F.count("*").alias("n"))
    )


def nation_modularity_from_matrix(
    mat: DataFrame, nat: DataFrame
) -> DataFrame:
    """The q_nation_modularity readout from the (cn, sn) matrix state
    alone — tiny-frame arithmetic, never an edge rescan."""
    mat = mat.localCheckpoint(eager=False)  # m + within + endpoints
    m = mat.agg(F.sum("n").cast("long").alias("m"))
    m = guard_int64(
        m,
        F.col("m") <= F.lit(MODULARITY_M_LIMIT),
        F.format_string(
            "nation_modularity: %s edges exceeds the DECIMAL(38,0) "
            f"domain bound ({MODULARITY_M_LIMIT}) for 1e6*(2m)^2 — "
            "shard by period (docstring bound)",
            F.col("m"),
        ),
    )
    within = (
        mat.filter(F.col("cn") == F.col("sn"))
        .select(F.col("cn").alias("natkey"), F.col("n").alias("e_w"))
    )
    ends = (
        mat.select(F.col("cn").alias("natkey"), "n")
        .unionAll(mat.select(F.col("sn").alias("natkey"), "n"))
        .groupBy("natkey")
        .agg(F.sum("n").cast("long").alias("endpoint_mass"))
    )
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.analytics import (
        _ppm2,
    )

    per = (
        ends.join(F.broadcast(within), "natkey", "left")
        .withColumn("e_within", F.coalesce(F.col("e_w"), F.lit(0)))
        .crossJoin(F.broadcast(m))
        .withColumn(
            "within_share_ppm",
            F.expr(_ppm2("e_within", "m")).cast("long"),
        )
        .withColumn(
            "expected_ppm",
            F.expr(
                "cast(1000000 as decimal(38,0)) "
                "* cast(endpoint_mass as decimal(38,0)) "
                "* cast(endpoint_mass as decimal(38,0)) "
                "div (cast(4 as decimal(38,0)) "
                "* cast(m as decimal(38,0)) * cast(m as decimal(38,0)))"
            ).cast("long"),
        )
    )
    return per.join(F.broadcast(nat), "natkey").select(
        "nation",
        F.col("e_within").cast("long").alias("e_within"),
        "endpoint_mass",
        F.col("m").alias("m_edges"),
        "within_share_ppm",
        "expected_ppm",
        (F.col("within_share_ppm") - F.col("expected_ppm"))
        .cast("long").alias("modularity_contrib_ppm"),
    )


def q_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade balance: for every unordered nation pair, the
    order flow in each direction (customer in A buying from supplier
    in B, and the reverse) with DECIMAL-exact revenue cents and a
    SIGNED imbalance ppm — the who-runs-the-surplus readout on the
    same customer-supplier matrix nation_modularity reduces to
    (modularity asks "do nations trade inward"; this asks "is the
    cross-border flow symmetric").

    Exactness: revenue follows the discount_ladder DECIMAL recipe
    (extendedprice·(1−discount) accumulates in DECIMAL(20,6), rounds
    to cents once); the imbalance is the signed two-step rational
    floor _ppm2((cents_ab − cents_ba), (cents_ab + cents_ba)) — range
    [−1e6, 1e6], +1e6 = all flow A→B.  guard_int64 raises loudly past
    the _ppm2 domain (pair total ≤ 9.2e15 cents).  Same-nation flow is
    excluded (the diagonal is nation_modularity's within term).

    Plan: the same two keyed joins + broadcast dims as
    nation_modularity down to ONE <=625-row (cn, sn) matrix with count
    and cents, then a mirrored self-join of the tiny matrix on
    (a < b).  Output O(|nations|²/2) rows, no windows."""
    li = cached_scan(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(20,6)").alias("rev"),
    )
    ords = cached_scan(spark, f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cust = cached_scan(spark, f"{sf_dir}/customer.parquet").select(
        "c_custkey", F.col("c_nationkey").cast("long").alias("cn")
    )
    supp = cached_scan(spark, f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", F.col("s_nationkey").cast("long").alias("sn")
    )
    nat = cached_scan(spark, f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").cast("long").alias("natkey"), "n_name"
    )
    mat = (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .filter(F.col("cn") != F.col("sn"))
        .groupBy("cn", "sn")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("rev") * 100, 0).cast("long").alias("cents"),
        )
        .localCheckpoint(eager=False)  # both mirrored join sides
    )
    ab = mat.select(
        F.col("cn").alias("nat_a"), F.col("sn").alias("nat_b"),
        F.col("n_lines").alias("lines_ab"), F.col("cents").alias("cents_ab"),
    ).filter(F.col("nat_a") < F.col("nat_b"))
    ba = mat.select(
        F.col("sn").alias("nat_a"), F.col("cn").alias("nat_b"),
        F.col("n_lines").alias("lines_ba"), F.col("cents").alias("cents_ba"),
    ).filter(F.col("nat_a") < F.col("nat_b"))
    pairs = (
        ab.join(ba, ["nat_a", "nat_b"], "full_outer")
        .select(
            "nat_a", "nat_b",
            F.coalesce("lines_ab", F.lit(0)).cast("long").alias("lines_ab"),
            F.coalesce("lines_ba", F.lit(0)).cast("long").alias("lines_ba"),
            F.coalesce("cents_ab", F.lit(0)).cast("long").alias("cents_ab"),
            F.coalesce("cents_ba", F.lit(0)).cast("long").alias("cents_ba"),
        )
    )
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.analytics import (
        _ppm2,
    )
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.guards import (
        PPM2_LIMIT,
    )

    pairs = guard_int64(
        pairs,
        (F.col("cents_ab") + F.col("cents_ba")) <= F.lit(PPM2_LIMIT),
        F.format_string(
            "trade_balance: pair (%s, %s) total %s cents exceeds the "
            f"two-step ppm bound ({PPM2_LIMIT}) — shard by period",
            F.col("nat_a"), F.col("nat_b"),
            F.col("cents_ab") + F.col("cents_ba"),
        ),
    )
    na = nat.select(F.col("natkey").alias("nat_a"),
                    F.col("n_name").alias("nation_a"))
    nb = nat.select(F.col("natkey").alias("nat_b"),
                    F.col("n_name").alias("nation_b"))
    return (
        pairs.join(F.broadcast(na), "nat_a")
        .join(F.broadcast(nb), "nat_b")
        .select(
            "nation_a", "nation_b",
            "lines_ab", "lines_ba", "cents_ab", "cents_ba",
            F.expr("CASE WHEN cents_ab + cents_ba > 0 THEN "
                   + _ppm2("cents_ab - cents_ba", "cents_ab + cents_ba")
                   + " END").cast("long").alias("imbalance_ppm"),
        )
    )


def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the bipartite trade graph (Newman 2002):
    across the distinct customer<->supplier relationships, do
    high-degree customers trade with high-degree suppliers?  Positive =
    hub-to-hub concentration (correlated fragility: one big supplier
    outage hits the biggest buyers), negative = hub-to-periphery
    (star-like supply).  The one-number companion of
    degree_distribution's two marginals.

    Exactness: the Pearson correlation needs a sqrt, which would put a
    transcendental in the contract — so the readout is the SIGNED
    SQUARED correlation in ppm, sign(r)·r²·1e6 = (1e6·num·|num|) div
    (varx·vary), every term an exact integer: num = n·Σxy − Σx·Σy,
    varx/vary the matching variance terms, moments accumulated in
    DECIMAL(38,0) and guarded (|num|, varx, vary ≤ 3.16e17 keeps every
    two-step intermediate inside DECIMAL(38,0)/HUGEINT; the raw moments are
    additionally guarded into int64 before they're emitted).  The
    signed division truncates toward zero in BOTH engines (pinned by
    division_semantics_law); degenerate zero-variance graphs NULL out.

    Plan: one distinct (the relationship catalog), two tiny degree
    aggs joined back on their keys, one scalar agg — output exactly 1
    row; at 100 TB the wide ops are the distinct and the two keyed
    degree joins, all on two-long rows."""
    ords = cached_scan(spark, f"{sf_dir}/orders.parquet")
    li = cached_scan(spark, f"{sf_dir}/lineitem.parquet")
    return degree_assortativity_from_rel(trade_rel(ords, li))


def degree_assortativity_from_rel(rel: DataFrame) -> DataFrame:
    """The q_degree_assortativity readout from the distinct
    relationship SET alone — the same idempotent union+distinct state
    streaming twin #10 maintains (set union absorbs re-delivered
    batches), so the assortativity number maintains incrementally with
    zero extra state (streaming twin #12, pinned replay==batch in
    tests/test_streaming.py)."""
    rel = rel.localCheckpoint(eager=False)  # read 3x
    dc = rel.groupBy("cust").agg(F.count("*").alias("dc"))
    ds = rel.groupBy("supp").agg(F.count("*").alias("ds"))
    dec = "cast(%s as decimal(38,0))"
    agg = (
        rel.join(dc, "cust").join(ds, "supp")
        .agg(
            F.count("*").alias("n"),
            F.expr(f"sum({dec % 'dc'})").alias("sx"),
            F.expr(f"sum({dec % 'ds'})").alias("sy"),
            F.expr(f"sum({dec % 'dc'} * {dec % 'ds'})").alias("sxy"),
            F.expr(f"sum({dec % 'dc'} * {dec % 'dc'})").alias("sxx"),
            F.expr(f"sum({dec % 'ds'} * {dec % 'ds'})").alias("syy"),
        )
    )
    for m in ("sx", "sy", "sxy", "sxx", "syy"):
        agg = guard_int64(
            agg,
            F.col(m) <= F.lit(2 ** 63 - 1).cast("decimal(38,0)"),
            F.format_string(
                f"degree_assortativity: moment {m} = %s exceeds int64 — "
                "shard the relationship catalog (docstring bound)",
                F.col(m),
            ),
        )
    num = f"({dec % 'n'} * sxy - sx * sy)"
    vx = f"({dec % 'n'} * sxx - sx * sx)"
    vy = f"({dec % 'n'} * syy - sy * sy)"
    # widened r13 guard (the first sf1 sweep fired the original 3.1e15
    # bound on LEGITIMATE variance terms at 2.2e16): with the ppm
    # landing through a two-step rational floor over N2 = num² and
    # D = vx·vy, the true DECIMAL(38,0)/HUGEINT constraints are
    # N2·1000 ≤ 1e38 and (N2·1000 % D)·1000 ≤ 1e38 — both satisfied
    # while |num|, vx, vy ≤ 3.16e17 (D ≤ 1e35, N2 ≤ 1e35), two decades
    # looser than the naive 1e6·num² form
    lim = "cast(316000000000000000 as decimal(38,0))"
    agg = guard_int64(
        agg,
        F.expr(
            f"abs({num}) <= {lim} AND {vx} <= {lim} AND {vy} <= {lim}"
        ),
        F.format_string(
            "degree_assortativity: |num|/var terms %s/%s/%s exceed the "
            "DECIMAL(38,0) square domain (3.16e17) — shard the catalog "
            "(docstring bound)",
            F.expr(f"abs({num})"), F.expr(vx), F.expr(vy),
        ),
    )
    n2 = f"({num} * {num})"
    d = f"({vx} * {vy})"
    ppm_mag = (
        f"(({n2} * 1000) div {d}) * 1000 + "
        f"((({n2} * 1000) % {d}) * 1000) div {d}"
    )
    return agg.select(
        F.col("n").cast("long").alias("n_edges"),
        F.col("sx").cast("long").alias("sum_dc"),
        F.col("sy").cast("long").alias("sum_ds"),
        F.col("sxy").cast("long").alias("sum_dcds"),
        F.col("sxx").cast("long").alias("sum_dc2"),
        F.col("syy").cast("long").alias("sum_ds2"),
        F.expr(
            f"CASE WHEN {vx} > 0 AND {vy} > 0 THEN "
            f"(CASE WHEN {num} >= 0 THEN {ppm_mag} "
            f"ELSE -({ppm_mag}) END) END"
        ).cast("long").alias("assort_r2_signed_ppm"),
    )
