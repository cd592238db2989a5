"""Weighted PageRank — the iterative graph-algorithm pattern on Spark
(joining k-means' Lloyd recurrence and the large/small-star connected
components in the iterative family).

Spark shape per iteration: ranks ⋈ edges on the source key (one shuffle,
co-partitionable by the node key across iterations), groupBy destination
(second shuffle), exact long fold of the contribution sum. Driver state
is a single integer (the node count); ranks never leave the executors.
At 100 TB the edge table is the big side — pre-partition both frames by
node id and the per-iteration joins become local.

Determinism pins — the recurrence is INTEGER arithmetic end to end, so an
ANSI oracle replays it exactly (like O_KMEANS) with zero float-rounding
hazards:
- ranks live as integer units of 1e-10 (``U = 10^10``); init
  ``r0_u = U // N`` (floor division, both engines);
- per-edge contribution ``c_u = round(r_u · share)`` — the only
  float→int rounding in the loop, on an arbitrary double product (w/W is
  a generic rational), so exact .5 ties are measure-zero. Summed as
  longs (exact, order-independent);
- damping d = 0.85 applied as the exact rational 17/20:
  ``r'_u = (3·U // N + 17·S_u) // 20`` — pure integer ops. A
  "round(base + 0.85·S)" float form is NOT usable here: the state is
  grid-quantized, and ×17/20 maps grid points systematically onto .5
  rounding boundaries where Spark's and DuckDB's ROUND disagree
  (observed: 1-5% of nodes off by one grid unit before this pin);
- output rank = u / 1e10 in double — one deterministic division, no
  rounding.

Magnitude bounds: total mass ≈ U = 1e10, so Σ contributions and
17·S_u ≤ ~2e11 stay far inside both long and exact-double range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: integer rank scale: 1 rank unit = 1e-10
U = 10**10


def pagerank(edges: DataFrame, n_iter: int = 2, damping_num: int = 17,
             damping_den: int = 20, src: str = "src", dst: str = "dst",
             weight: str = "weight", checkpoint_edges: bool = True,
             complete_in_degree: bool = False,
             n_nodes: int | None = None,
             copartition: bool = False) -> DataFrame:
    """Weighted PageRank over a directed edge list; returns (node, rank).

    ``damping_num/damping_den`` is the damping factor as an exact rational
    (default 17/20 = 0.85). Every node must have at least one outgoing
    edge (no dangling-mass redistribution — the symmetric/bipartite graphs
    this engine builds satisfy that by construction; callers with dangling
    nodes should add self-loops first).

    ``complete_in_degree=True`` asserts every node ALSO has an incoming
    edge (true for any symmetric union by construction): the per-iteration
    ``nodes`` left-join that re-attaches in-degree-0 nodes is then skipped
    entirely — the contribution aggregate already covers every node — which
    removes one join+shuffle per iteration with identical values (the
    coalesce fallback never fired).

    Iteration 1 never joins: the initial rank is the uniform constant
    U//N, so the first contribution pass is a narrow map over the share
    table (round(const·share)) — the ranks⋈edges join only starts paying
    from iteration 2, where ranks genuinely vary by node.

    ``n_nodes``: with ``complete_in_degree`` the distinct-nodes frame is
    only ever consulted for its COUNT (uniform init is a constant, the
    re-attach join is skipped); a caller that can compute N more cheaply
    than distinct-over-2·|E| (e.g. a bipartite build summing two
    count_distincts on the pre-union pair table) passes it here and the
    nodes frame is never built.

    ``copartition=True`` is the 100 TB posture this docstring's scale
    note prescribes: the share table (the edge-sized frame every
    iteration joins) is hash-partitioned on its source key at the
    session's shuffle parallelism, sorted within partitions, and
    persisted ONCE, and each iteration truncates the rank lineage with a
    localCheckpoint. EnsureRequirements then consumes the cached scan
    directly in EVERY iteration's join — the edge-sized side is never
    exchanged OR re-sorted again (test_plan_quality.py pins zero
    Exchange/Sort above the cached share scan) — so per-iteration
    shuffle traffic is O(V) only: the inherent src→dst transpose of the
    contribution aggregate plus (when AQE coalescing re-lays-out the
    checkpointed ranks) one rank-sized re-exchange, instead of
    re-shuffling the O(E) edges every iteration. Values are
    bit-identical to the default path (the contribution fold is an
    order-independent long sum); the cached frame is released by
    release_owned_caches(). Cost: one up-front edge shuffle + an
    edge-sized cache, amortized over n_iter joins — worth it from 2
    iterations up; the default stays off for parity with the measured
    lazy-rebuild A/B below.
    """
    # materialize the edge build ONCE: nodes, out-weights and the share
    # table all branch from `edges`, and without this checkpoint each
    # branch re-evaluates the caller's whole edge-construction subtree
    # (for the trade graph: a fact join + groupBy, three times over).
    # Callers that already checkpointed their edge construction pass
    # checkpoint_edges=False to skip the redundant materialization.
    if checkpoint_edges:
        edges = edges.localCheckpoint()
    if complete_in_degree and n_nodes is not None and n_iter > 0:
        nodes = None  # never consulted (see docstring)
    else:
        nodes = (
            edges.select(F.col(src).alias("node"))
            .unionByName(edges.select(F.col(dst).alias("node")))
            .distinct()
            .localCheckpoint()  # reused every iteration AND for the final join
        )
        n_nodes = nodes.count()  # O(1) driver scalar, like kmeans' k·dim state
    base_num = (damping_den - damping_num) * U // n_nodes  # 3·U/N for 0.85

    outw = edges.groupBy(src).agg(F.sum(weight).alias("w_out"))
    share = edges.join(outw, src).select(
        F.col(src).alias("e_src"),
        F.col(dst).alias("e_dst"),
        (F.col(weight) / F.col("w_out")).alias("share"),
    )
    # Default path: NOT materialized — the share build does re-run once
    # per iteration (no ReusedExchange — each reference sits under a
    # different join ancestor), but with `edges` already checkpointed the
    # rebuild is two small exchanges over materialized rows, and a
    # controlled A/B at sf0.1 (warm, median of repeats) measured
    # persist() and localCheckpoint() at-or-above the lazy rebuild
    # (3.4s / 2.9s vs 2.9s end-to-end): an edge-sized cache write costs
    # more than the n_iter-1 rebuilds it saves at 2 iterations.
    # copartition=True flips that trade deliberately (see docstring): the
    # cache is what PINS the hash(e_src, N) layout + in-partition order
    # that makes every later iteration's join exchange- and sort-free.
    if copartition:
        from ..cache import owned_persist

        n_part = int(
            edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        share = owned_persist(
            share.repartition(n_part, "e_src").sortWithinPartitions("e_src")
        )

    ranks = None  # None ⇒ the uniform constant U//N (iteration-1 fast path)
    for it in range(n_iter):
        if ranks is None:
            contrib = share.select(
                F.col("e_dst").alias("node"),
                F.round(F.lit(U // n_nodes).cast("long") * F.col("share"))
                .cast("long").alias("c_u"),
            )
        else:
            contrib = share.join(
                ranks, share["e_src"] == ranks["node"]
            ).select(
                F.col("e_dst").alias("node"),
                F.round(F.col("rank_u") * F.col("share")).cast("long").alias("c_u"),
            )
        agg = contrib.groupBy("node").agg(
            F.floor(
                (F.lit(base_num) + damping_num * F.sum("c_u")) / damping_den
            ).cast("long").alias("rank_u")
        )
        if complete_in_degree:
            ranks = agg
        else:
            # the coalesce is the documented no-incoming fallback (= base
            # mass only) for graphs where some node receives no edge
            ranks = nodes.join(agg, "node", "left").select(
                "node",
                F.coalesce("rank_u", F.lit(base_num // damping_den)).alias("rank_u"),
            )
        if copartition and it < n_iter - 1:
            # truncate the rank lineage each iteration (the standard
            # iterative-algorithm posture — unbounded lineage is its own
            # 100 TB hazard). This is also what makes the share cache
            # actually hit EVERY iteration: leaving the full unrolled
            # tree in place nests each earlier share reference inside
            # the next iteration's self-join, and DeduplicateRelations'
            # re-aliased copies of a LogicalRDD-based plan fail the
            # cache manager's sameResult check (verified empirically:
            # only the outermost reference substituted; the inner
            # iterations silently rebuilt the share from raw edges).
            # The checkpointed ranks frame is O(V) and LogicalRDD
            # preserves its hash(node, N) partitioning, so the next
            # join stays exchange-free on both sides.
            ranks = ranks.localCheckpoint()
    if ranks is None:  # n_iter == 0: uniform ranks
        ranks = nodes.select("node", F.lit(U // n_nodes).cast("long").alias("rank_u"))
    return ranks.select(
        "node", (F.col("rank_u").cast("double") / U).alias("rank")
    )


def triangle_stats(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Triangle count + global clustering coefficient for an UNDIRECTED
    simple graph given as canonical edges (``a`` < ``b``, no duplicates);
    returns ONE row (n_nodes, n_edges, n_wedges, n_triangles,
    clustering_ppm).

    Spark shape — the edge-iterator algorithm on the DEGREE-DESCENDING
    orientation (Suri & Vassilvitskii's MR-NodeIterator++, WWW 2011):
    each undirected edge is directed toward its higher-degree endpoint
    (id tie-break, so the direction is a total order and deterministic),
    giving every vertex out-degree O(√|E|) even on arbitrarily skewed
    graphs. Every triangle x≺y≺z under the (degree, id) order is counted
    exactly once as the out-wedge y←x→z closed by the oriented edge y→z,
    so the plan is two equi-joins on the oriented edge table with wedge
    fan-out bounded by Σ outdeg² = O(|E|^1.5) REGARDLESS of the degree
    distribution — the id-ordered orientation this replaced blows up
    O(d_max²) when a hub vertex has the smallest id. The triangle COUNT
    is orientation-invariant, so the simpler id-ordered DuckDB oracle
    replays the result unchanged. Reported wedge totals come from the
    undirected degree fold (Σ d·(d−1)/2 — d·(d−1) is even, so the
    division is exact integer).

    clustering_ppm = floor(3e6 · triangles / wedges): integer DIV on longs,
    zero float hazards (the repo-wide ppm convention).
    """
    from ..cache import owned_persist

    e = edges.select(F.col(a).alias("a"), F.col(b).alias("b"))
    # deg feeds THREE consumers (the wedge-count fold plus both endpoint
    # joins) and oriented feeds three more (both wedge sides + the closure
    # probe); without pinning them, Spark re-executes the degree groupBy
    # and the double endpoint join once per consumer — measured 8.8×
    # growth at 10× input (SCALING_r07 pre-fix) purely from the
    # re-evaluated lineage. Both frames are O(|V|) / O(|E|) — the same
    # rows a production deployment would keep as the adjacency summary —
    # and are released by the harness via release_owned_caches().
    # endpoint EXPLODE, not a two-branch union (r15 optimization round,
    # guide §2.4): the union form scanned the edge table once per branch
    # (2× the map tasks and, under a cache, 2× the cache reads); one
    # explode of the 2-element endpoint array emits the same rows in a
    # single narrow pass. Same degree table.
    deg = owned_persist(
        e.select(F.explode(F.array(F.col("a"), F.col("b"))).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    base = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        # Σd counts every edge at both endpoints, so n_edges = Σd/2 —
        # folding it here removes the separate edge-count aggregate and
        # its broadcast job from the protocol (r15, guide §1.2: fewer
        # passes); coalesce keeps the empty-graph value at 0 exactly like
        # the count() it replaces. DIV is exact (Σd is even).
        F.expr("CAST(coalesce(sum(d), 0) DIV 2 AS BIGINT)").alias("n_edges"),
        # d·(d−1) is even so the halving is exact; DIV keeps it on the
        # integer grid (a double `/` would round past 2^53)
        F.expr("CAST(sum(d * (d - 1)) DIV 2 AS BIGINT)").alias("n_wedges"),
    )
    # orient a—b toward the higher (d, id): two node-keyed joins attach
    # endpoint degrees (AQE broadcasts deg when it is small — it has
    # n_nodes rows against |E| edges), then a narrow projection flips.
    # `dd` carries the DESTINATION's degree so the wedge canonicalization
    # below needs no third join.
    da, db = deg.alias("da"), deg.alias("db")
    ed = (
        e.join(da, F.col("a") == F.col("da.v"))
        .join(db, F.col("b") == F.col("db.v"))
        .select(
            "a", "b",
            F.col("da.d").alias("d_a"), F.col("db.d").alias("d_b"),
        )
    )
    a_first = (F.col("d_a") < F.col("d_b")) | (
        (F.col("d_a") == F.col("d_b")) & (F.col("a") < F.col("b"))
    )
    oriented = owned_persist(
        ed.select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
            F.when(a_first, F.col("d_b")).otherwise(F.col("d_a")).alias("dd"),
        )
    )
    # out-wedges at the lowest-order vertex of each candidate triangle:
    # (u→v, u→w) with ord(v) < ord(w), closed iff oriented edge v→w exists
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src"))
        & (
            (F.col("o1.dd") < F.col("o2.dd"))
            | (
                (F.col("o1.dd") == F.col("o2.dd"))
                & (F.col("o1.dst") < F.col("o2.dst"))
            )
        ),
    ).select(F.col("o1.dst").alias("x"), F.col("o2.dst").alias("z"))
    closure = oriented.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    tri = (
        wedges.join(closure, ["x", "z"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return (
        base.crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.expr(
                "(n_triangles * CAST(3000000 AS BIGINT))"
                " DIV greatest(n_wedges, CAST(1 AS BIGINT))"
            ).alias("clustering_ppm"),
        )
    )
