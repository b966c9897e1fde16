"""Distributed graph analytics over DataFrame edge lists.

The corpus-dedup family already does two graph jobs — connected
components (textdedup.connected_components, pointer-jumping label
propagation) and hierarchy flattening (relational.tree_root_depth,
pointer doubling). This module adds the other two staples a
large-scale pipeline reaches for:

- PageRank (Page et al. 1999) as the canonical *weighted* iterative
  fixpoint — the template for any "importance flows along edges"
  computation (canonical-document selection in a near-dup cluster,
  domain authority for crawl prioritization, entity salience).
- Triangle counting as the canonical *enumeration* problem whose
  naive form explodes: the degree-ordered node-iterator join
  (Schank & Wagner 2005; Suri & Vassilvitskii WWW'11) bounds the
  wedge blow-up by orienting every edge from the lower-degree
  endpoint to the higher-degree one.

Both operate on a plain (src, dst) DataFrame, so any upstream edge
construction (co-purchase, LSH candidate pairs, hyperlinks) plugs in.

Scale shape (the part that must survive 100 TB):
- Edges are the big side. ``pagerank`` materializes the
  degree-annotated edge list ONCE, repartitioned on the join key and
  PERSISTED (an InMemoryTableScan keeps outputPartitioning; a
  localCheckpoint RDD scan loses it and would re-shuffle the edges
  every round), so each iteration shuffles only the small
  (node, rank) table into the cached edge partitioning, never the
  edges themselves.
- Iterations are bounded and the per-iteration plan is constant-depth
  (each rank table is localCheckpointed, the dd8 iterative contract);
  lineage cannot grow with the iteration count.
- The only driver-side values are two scalars (node count, and the
  checkpoint barriers) — no edge or rank row ever leaves the
  executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copurchase_edges(
    lineitem: DataFrame,
    key: str = "l_orderkey",
    item: str = "l_partkey",
    max_basket: int | None = None,
) -> DataFrame:
    """Undirected co-occurrence edges: two items are linked when they
    appear under the same key (parts co-purchased in one order, docs
    sharing an LSH bucket, ...). Returns BOTH directions of each
    edge — callers that need each undirected edge once should build
    the a<b orientation themselves (triangle counting does).

    Scale: the self-join is per-key, so the blow-up is sum(k_i^2)
    over per-key item counts — bounded when keys are small baskets
    (orders average ~4 lineitems). ``max_basket`` is the explicit cap
    for pathological keys (a crawl "order" with 10^5 items): a key
    with MORE than max_basket distinct items contributes NO edges —
    dd4b's stop-shingle (maxdf) discipline, where a token shared by
    everything carries no pairing signal and only its quadratic cost.
    The basket-size filter runs before the self-join, so the
    quadratic stage never sees the hub key at all; the join itself is
    a plain equi-join AQE can skew-split (receipt: the
    j6_unsalted_hot_join grid cell in tools/scale_sanity.py and the
    plan-pinned skew=true engagement test in tests/test_scale.py).
    """
    kp = lineitem.select(F.col(key).alias("k"), F.col(item).alias("p")).distinct()
    if max_basket is not None:
        sizes = kp.groupBy("k").agg(F.count(F.lit(1)).alias("__bs"))
        kp = kp.join(
            sizes.filter(F.col("__bs") <= max_basket).select("k"), "k", "left_semi"
        )
    a, b = kp.alias("a"), kp.alias("b")
    # the symmetrizing union consumes `pairs` TWICE, and Catalyst
    # compiles the basket self-join once per branch (ReuseExchange
    # only dedupes the shuffle, not the join work above it). A lazy
    # localCheckpoint materializes the a<b orientation once and both
    # branches read the checkpointed blocks: g1_pagerank 4.52->3.67s
    # at sf0.1 (min-of-4 interleaved, quiet box). eager=False so no
    # job runs at plan-build time; storage is the |E|/2-row pair list.
    pairs = (
        a.join(b, on=(F.col("a.k") == F.col("b.k")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    return pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def cap_degree(edges: DataFrame, max_degree: int) -> DataFrame:
    """Hub-degree cap for the wedge-join family (triangle_count,
    link_prediction, label_propagation): drop every edge incident to
    a node whose degree on the INPUT list exceeds ``max_degree``.
    Wedge volume is sum(deg²), so one crawl-hub node at 100× data is
    the difference between m^1.5 and effectively-unbounded — the cap
    is dd4b's maxdf discipline applied to nodes (a hub adjacent to
    everything carries no pairwise signal, only quadratic cost).

    One-shot semantics (degrees measured once on the input, both
    endpoints must be under the cap; no recursive re-measure) — the
    deterministic contract the law test pins: with max_degree >= the
    true max degree the output IS the input edge set. Degree per node
    is ``greatest(out_degree, in_degree)``: on a symmetrized edge
    list out == in, so this is EXACTLY the out-degree the oracle SQL
    mirrors; on a directed input it gives every endpoint a degree row
    — measuring only groupBy(src) would leave dst-only nodes rowless
    and the dst-side semi-join would silently drop every edge into
    them regardless of their actual degree (label_propagation
    explicitly supports directed inputs). Cost: two |V|-sized partial
    aggs + one node-table outer join plus two semi-joins; the
    survivor list is |nodes ≤ cap|-sized and AQE broadcasts it when
    small. The input is lazily checkpointed — it feeds THREE
    consumers (both degree aggs and the semi-join probe side), and an
    unmaterialized construction plan would recompile per consumer
    (the copurchase self-join costs real work even with its own pair
    checkpoint; measured on g4's weighted-pair graph)."""
    edges = edges.localCheckpoint(eager=False)
    out_d = edges.groupBy(F.col("src").alias("n")).agg(
        F.count(F.lit(1)).alias("__out")
    )
    in_d = edges.groupBy(F.col("dst").alias("n")).agg(
        F.count(F.lit(1)).alias("__in")
    )
    deg = out_d.join(in_d, "n", "full_outer").select(
        "n",
        F.greatest(
            F.coalesce(F.col("__out"), F.lit(0)),
            F.coalesce(F.col("__in"), F.lit(0)),
        ).alias("__d"),
    )
    ok = deg.filter(F.col("__d") <= max_degree).select(F.col("n").alias("src"))
    return edges.join(ok, "src", "left_semi").join(
        ok.withColumnRenamed("src", "dst"), "dst", "left_semi"
    ).select("src", "dst")


def _pagerank_round(
    edges_deg: DataFrame,
    ranks: DataFrame,
    nodes: DataFrame,
    base: float,
    damping: float,
    small: bool,
) -> DataFrame:
    """One PageRank iteration, UN-checkpointed: contributions
    aggregate per destination, then every node's rank updates as
    base + damping * mass. Extracted so the twin plan pin in
    tests/test_plans.py can watch the per-round shape (broadcast
    regime: the rank side broadcasts and the contribution aggregate
    runs inside the cached dst partitioning with no edge-sized
    exchange) — the production loop checkpoints each round's ranks,
    truncating this subtree to a LogicalRDD stub."""
    rank_side = F.broadcast(ranks) if small else ranks
    contrib = (
        edges_deg.join(rank_side, on=(edges_deg["src"] == ranks["node"]))
        .groupBy("dst")
        .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("mass"))
    )
    return nodes.join(
        contrib, on=(nodes["node"] == contrib["dst"]), how="left"
    ).select(
        "node",
        (
            F.lit(base)
            + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
        ).alias("rank"),
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    broadcast_nodes: int = 2_000_000,
) -> DataFrame:
    """PageRank over a (src, dst) edge list, fixed iteration count.

    Returns (node, rank) for every node appearing as a source (on a
    symmetrized graph that is every node). Ranks sum to 1 when the
    graph has no dangling nodes — symmetrized graphs never do, and a
    directed caller should add self-loops or accept the standard
    leaked-mass formulation (both engines of the oracle pair compute
    the identical recurrence, so verification is unaffected).

    The MapReduce-era recurrence (Page et al. 1999; Pregel,
    Malewicz et al. SIGMOD'10), Spark-first:

    - ``edges ⋈ deg`` is computed once, repartitioned on the
      regime's join key (``dst`` when ranks broadcast, ``src`` when
      they shuffle — see the regime comment in the body) and
      PERSISTED: the heavy table pays ONE shuffle total. persist (not
      localCheckpoint) is load-bearing — an InMemoryTableScan carries
      outputPartitioning into later plans, so every iteration's
      contribution pass reuses the cached partitioning and moves only
      the (node, rank) table (|V| rows, two columns) or nothing at
      all (broadcast regime); a checkpointed RDD scan loses the
      metadata and would re-shuffle the edges every round — verified
      in the physical plan both ways.
    - contribution aggregation is groupBy(dst).sum — partial
      aggregation runs map-side inside the edge partitions. The rank
      UPDATE (nodes left-join contrib) also re-uses cached
      partitioning: nodes' distinct leaves it hash-partitioned on
      node, contrib's agg leaves it partitioned on dst.
    - each iteration's rank table is localCheckpointed so the plan
      stays constant-depth regardless of ``iterations`` (same
      contract as textdedup.connected_components, which
      tests/test_plans.py pins for the iterative family).
    - the single driver scalar is |V| (one count), the same class of
      one-row collect as the pl2 watermark.
    """
    # one materialization of the upstream edge construction: nodes,
    # degrees and the per-iteration joins all read this checkpoint
    # instead of replaying the (possibly expensive) construction plan
    spark = edges.sparkSession
    edges = edges.localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).distinct().persist()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        return spark.createDataFrame([], "node long, rank double")
    # Two physical regimes for the per-iteration contribution pass:
    # - |V| <= broadcast_nodes: cache the edges partitioned by DST
    #   and BROADCAST the (node, rank) table each round. The
    #   contribution groupBy(dst) then aggregates inside the cached
    #   dst partitioning with NO edge-sized exchange per round —
    #   measured 1.5x on the sf0.1 co-purchase graph (per-round
    #   ~0.9s vs ~1.5s), and the per-round shuffle volume drops from
    #   |E| partial-agg rows to zero.
    # - larger graphs: ranks cannot broadcast; cache by SRC so the
    #   rank table (the small side) shuffles into the cached edge
    #   partitioning and the groupBy(dst) exchange moves map-side
    #   combined partials — the original large-|V| plan.
    small = n <= broadcast_nodes
    edges_deg = (
        edges.join(deg, on="src").repartition("dst" if small else "src").persist()
    )
    edges_deg.count()  # materialize the cache before iterating
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    try:
        # r14 fixed-cost consolidation (the connected_components
        # pattern): intermediate rounds checkpoint LAZILY — each
        # still truncates to a LogicalRDD at plan time (constant
        # depth) but materializes inside the FINAL round's one
        # eager job instead of paying a driver-synchronized job per
        # round. The last round must be eager: the caches unpersist
        # in finally, so the returned plan may not lazily reference
        # them. No probes read intermediate rounds (fixed iteration
        # count), so laziness is observationally identical.
        for i in range(iterations):
            ranks = _pagerank_round(
                edges_deg, ranks, nodes, base, damping, small
            ).localCheckpoint(eager=(i == iterations - 1))
    finally:
        # every iteration's output is checkpointed, so the caches are
        # no longer reachable from the returned plan
        edges_deg.unpersist()
        nodes.unpersist()
    return ranks


def bfs_levels(edges: DataFrame, source: int, max_depth: int = 3) -> DataFrame:
    """Single-source BFS levels (node, dist) for every node within
    ``max_depth`` hops of ``source`` — the Pregel-style frontier
    traversal (Malewicz et al. SIGMOD'10), the template for crawl
    frontier expansion / neighborhood feature extraction.

    Each round: frontier ⋈ edges (the frontier side shuffles into the
    edge list's CACHED partitioning — persist, not localCheckpoint,
    because only an InMemoryTableScan carries outputPartitioning into
    later plans; see pagerank), distinct, anti-join against the
    visited set — so a node's recorded dist is its first (minimal)
    reach, the BFS invariant. Frontier and visited are
    localCheckpointed per round (constant plan depth); edges pay one
    shuffle + one materialization total. Rounds are bounded by
    ``max_depth``; each moves only frontier-sized data.
    """
    spark = edges.sparkSession
    edges = edges.repartition("src").persist()
    edges.count()  # materialize the cache before iterating
    visited = spark.createDataFrame(
        [(source, 0)], "node long, dist long"
    ).localCheckpoint(eager=True)
    frontier = visited
    try:
        # NOTE: bfs keeps EAGER per-round checkpoints — the r14 lazy
        # consolidation (see pagerank) was measured neutral-to-
        # slightly-negative here (nxt feeds three consumers across
        # rounds; the interleaved A/B leaned 1.04x), so the simpler
        # eager contract stays.
        for d in range(1, max_depth + 1):
            nxt = (
                frontier.join(edges, frontier["node"] == edges["src"])
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(visited.select("node"), on="node", how="left_anti")
                .withColumn("dist", F.lit(d).cast("long"))
                .localCheckpoint(eager=True)
            )
            visited = visited.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
    finally:
        edges.unpersist()
    return visited


def triangle_count(
    edges: DataFrame, max_degree: int | None = None
) -> DataFrame:
    """Global triangle count over a SYMMETRIZED (src, dst) edge list,
    returned as one row (n_nodes, n_edges, n_triangles).

    ``max_degree`` folds the hub cap INTO the orientation's own
    degree table (identical semantics to cap_degree(edges, d) —
    one-shot input-degree cap on both endpoints, law-tested equal —
    but one fewer edge-list aggregation and no semi-join passes,
    since the orientation join already carries every node's degree).

    The node-iterator++ plan (Schank & Wagner 2005; the standard
    MapReduce formulation is Suri & Vassilvitskii WWW'11): orient
    every undirected edge from its lower-(degree, id) endpoint to the
    higher one. Every triangle then has exactly one "pivot" node with
    two out-edges, so wedges = oriented ⋈ oriented on the pivot, and
    a semi-join against the oriented edges closes them. The
    orientation is the entire scale story: a star node with degree d
    contributes d² wedges un-oriented but ~(d choose 2 capped by
    ranking) oriented — the worst-case join output drops from
    sum(d_i²) to m^1.5.

    The edge list feeds FIVE consumers (degree agg, the two wedge
    sides, the closing join, the node/edge counts) — it is
    localCheckpointed once so the upstream construction (e.g. the
    co-purchase basket self-join) runs exactly once, and the small
    oriented list is checkpointed again so the degree join is not
    replayed per consumer. Without that, Catalyst happily inlines the
    construction into every consumer (the first cut of this operator
    compiled to 93 exchanges / 36 scans; this one is 10 / 0).
    """
    edges = edges.localCheckpoint(eager=True)
    und = edges.filter(F.col("src") < F.col("dst")).distinct()
    deg = (
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        .select(F.col("src").alias("node"), "d")
    )
    # orient: keep (lo, hi) ordered by (degree, id); the cap rides
    # the same joins as a plain filter on the carried degrees
    e = (
        und.join(deg.withColumnRenamed("node", "src").withColumnRenamed("d", "ds"), on="src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("d", "dd"), on="dst")
    )
    if max_degree is not None:
        e = e.filter(
            (F.col("ds") <= max_degree) & (F.col("dd") <= max_degree)
        )
    e = (
        e.select(
            F.when(
                (F.col("ds") < F.col("dd"))
                | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))),
                F.struct(F.col("src").alias("u"), F.col("dst").alias("v")),
            )
            .otherwise(F.struct(F.col("dst").alias("u"), F.col("src").alias("v")))
            .alias("e")
        )
        .select(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
        .localCheckpoint(eager=True)
    )
    w1 = e.select(F.col("u").alias("pivot"), F.col("v").alias("a"))
    w2 = e.select(F.col("u").alias("pivot"), F.col("v").alias("b"))
    wedges = w1.join(w2, on="pivot").filter(F.col("a") < F.col("b"))
    # e holds each undirected edge exactly once (reoriented), so the
    # canonical a<b closing-edge list is a projection of e — no replay
    closing = e.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    )
    tri = wedges.join(closing, on=["a", "b"]).agg(F.count(F.lit(1)).alias("n_triangles"))
    # n_nodes from the ORIENTED list's endpoints: identical to the
    # input's distinct sources on an (uncapped) symmetrized graph,
    # and correct under max_degree (a node whose every edge was
    # capped away is no longer in the graph)
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
    )
    counts = closing.agg(
        F.count(F.lit(1)).alias("n_edges"),
    ).crossJoin(nodes.agg(F.count(F.lit(1)).alias("n_nodes")))
    return counts.crossJoin(tri).select("n_nodes", "n_edges", "n_triangles")


def link_prediction(
    edges: DataFrame, top_k: int = 100, min_common: int = 1
) -> DataFrame:
    """Common-neighbor link prediction over a SYMMETRIZED (src, dst)
    edge list (Liben-Nowell & Kleinberg CIKM'03): for every UNLINKED
    pair (a, b) sharing >= min_common neighbors, emit the
    common-neighbor count and the Jaccard coefficient
    |N(a) ∩ N(b)| / |N(a) ∪ N(b)|, keeping the global top_k by
    (common desc, jaccard desc, a, b) — a fully deterministic order.

    Plan: wedges through each pivot w (w→a ⋈ w→b, a < b) — one
    equi-join on the pivot — aggregated to pair counts; existing
    edges leave via anti-join; degrees broadcast back. The edge list
    feeds four consumers (two wedge sides, degrees, the anti-join),
    so it is localCheckpointed once (the triangle_count lesson:
    without the barrier Catalyst replays the upstream edge
    construction per consumer).

    Scale: wedge volume is sum(deg_w^2) — the caller bounds it by
    pruning hub nodes / weighting edges BEFORE this operator (the
    g4 query keeps co-purchase edges with support >= 2, the dd4b
    stop-key discipline); top-k compiles to TakeOrderedAndProject
    (per-partition bounded heaps, no global sort)."""
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    e1 = edges.select(F.col("src").alias("w"), F.col("dst").alias("a"))
    e2 = edges.select(F.col("src").alias("w"), F.col("dst").alias("b"))
    cn = (
        e1.join(e2, "w")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    linked = edges.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    cand = cn.join(linked, ["a", "b"], "left_anti")
    da = deg.select(F.col("src").alias("a"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("src").alias("b"), F.col("d").alias("deg_b"))
    scored = (
        cand.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "n_common",
            "deg_a",
            "deg_b",
            F.expr(
                "FLOOR(CAST(n_common AS DOUBLE) / (deg_a + deg_b - n_common)"
                " * 10000e0 + 0.5e0) / 10000e0"
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("n_common").desc(), F.col("jaccard").desc(), "a", "b"
    ).limit(top_k)


def label_propagation(edges: DataFrame, rounds: int = 4) -> DataFrame:
    """Synchronous label propagation (community detection): every
    node starts labeled with itself; each round a node adopts the
    most frequent label among its NEIGHBORS, ties broken to the
    smallest label (Raghavan et al., Phys. Rev. E 2007 — the
    deterministic synchronous variant). Runs a FIXED ``rounds``
    count: sync LPA is not guaranteed to converge (bipartite
    structures oscillate), so the operator's contract is "the label
    state after R deterministic rounds" — the same recurrence the
    oracle replays as chained CTEs, and what a production run pins
    for reproducibility (async/randomized LPA trades determinism for
    convergence). Returns (node, label).

    Scale shape (the pagerank discipline): the symmetrized edge list
    pays ONE shuffle (repartition by dst) and is persisted —
    InMemoryTableScan keeps outputPartitioning, so every round's
    gather joins against cached partitioning and moves only the
    (node, label) table. Per round: one |V|-row label shuffle into
    the edge cache, a partial-agg (node, label) count, and a
    per-node arg-max as a HASH AGGREGATE — max(struct(count,
    -label)) encodes "most frequent, ties to smallest label" in
    struct ordering, so no per-node sort ever runs (measured ~8%
    whole-query at sf0.1 vs the row_number window, and the win grows
    with degree since the sort was per-node over the count table).
    Rounds are localCheckpointed — constant plan depth."""
    spark = edges.sparkSession
    edges = edges.repartition("dst").persist()
    edges.count()
    # nodes = src UNION dst: on a directed edge list a pure-sink node
    # must still start self-labeled (and vote through its in-edges) —
    # src-only init would silently drop it from the output
    labels = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    try:
        # intermediate rounds lazy, final eager (the r14
        # consolidation — see pagerank): labels is read twice per
        # round (gather join + keep-label left join), sharing the
        # cached RDD on first materialization inside the final job.
        for r in range(rounds):
            gathered = (
                edges.join(labels, edges["dst"] == labels["node"])
                .select(F.col("src").alias("node"), "label")
                .groupBy("node", "label")
                .agg(F.count(F.lit(1)).alias("__c"))
            )
            voted = (
                gathered.groupBy("node")
                .agg(
                    F.max(
                        F.struct(F.col("__c"), (-F.col("label")).alias("__nl"))
                    ).alias("__m")
                )
                .select("node", (-F.col("__m.__nl")).alias("__new"))
            )
            # a node with no out-edges (directed input) receives no
            # votes this round — it KEEPS its label instead of
            # vanishing from the state (symmetrized graphs never hit
            # this: every node votes and is voted for)
            labels = (
                labels.join(voted, "node", "left")
                .select(
                    "node",
                    F.coalesce(F.col("__new"), F.col("label")).alias("label"),
                )
                .localCheckpoint(eager=(r == rounds - 1))
            )
    finally:
        edges.unpersist()
    return labels
