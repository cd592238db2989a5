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
             weight: str = "weight", checkpoint_edges: bool = True) -> DataFrame:
    """Weighted PageRank over a directed edge list; returns (node, rank).

    ``damping_num/damping_den`` is the damping factor as an exact rational
    (default 17/20 = 0.85). Every node must have at least one outgoing
    edge (no dangling-mass redistribution — the symmetric/bipartite graphs
    this engine builds satisfy that by construction; callers with dangling
    nodes should add self-loops first).
    """
    # materialize the edge build ONCE: nodes, out-weights and the share
    # table all branch from `edges`, and without this checkpoint each
    # branch re-evaluates the caller's whole edge-construction subtree
    # (for the trade graph: a fact join + groupBy, three times over).
    # Callers that already checkpointed their edge construction pass
    # checkpoint_edges=False to skip the redundant materialization.
    if checkpoint_edges:
        edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()  # reused every iteration AND for the final join
    )
    n_nodes = nodes.count()  # O(1) driver scalar, like kmeans' k·dim state
    base_num = (damping_den - damping_num) * U // n_nodes  # 3·U/N for 0.85

    outw = edges.groupBy(src).agg(F.sum(weight).alias("w_out"))
    # NOT checkpointed: with `edges` materialized, re-deriving the share
    # table per iteration is a cheap narrow join whose exchanges Spark
    # dedupes (ReusedExchange); measured faster than materializing the
    # full edge-sized frame a second time
    share = edges.join(outw, src).select(
        F.col(src).alias("e_src"),
        F.col(dst).alias("e_dst"),
        (F.col(weight) / F.col("w_out")).alias("share"),
    )

    ranks = nodes.select("node", F.lit(U // n_nodes).alias("rank_u"))
    for _ in range(n_iter):
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
        # symmetric graphs give every node an in-edge; the coalesce is the
        # documented no-incoming fallback (= base mass only)
        ranks = nodes.join(agg, "node", "left").select(
            "node",
            F.coalesce("rank_u", F.lit(base_num // damping_den)).alias("rank_u"),
        )
    return ranks.select(
        "node", (F.col("rank_u").cast("double") / U).alias("rank")
    )
