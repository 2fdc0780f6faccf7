"""Iterative graph algorithms over DataFrames.

Companion to the min-label propagation in ``operators/dedup.py``
(connected components); this module holds the rank-flow family. The
iteration discipline is the same: the edge table is checkpointed once,
each round is one hash-partitioned join + one aggregate, and the rank
vector is ``localCheckpoint``'d per round to truncate the growing
lineage (a persisted table at 100 TB). No driver-side data movement —
the loop body is pure DataFrame algebra; only the loop *counter* lives
on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Power-iteration PageRank.

    ``nodes``: one column ``node``; ``edges``: directed ``(src, dst)``.
    Runs a fixed number of iterations (deterministic output — the
    oracle replays the same unrolled recurrence). Uses the simplified
    recurrence without dangling-mass redistribution: a node with no
    in-edges holds exactly the teleport mass ``(1-d)/N``; with the
    bidirectional edge construction used by the registered query, every
    non-isolated node has out-degree >= 1, so no rank mass leaks.

    Returns ``(node, rank)`` for every node, ranks summing to ~1.
    """
    edges = edges.localCheckpoint()
    od = edges.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("outdeg"))
    # (src, dst, outdeg) reused every round — checkpoint once
    flow = edges.join(od, "src").localCheckpoint()
    n = nodes.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    teleport = F.lit(1.0 - damping) / F.col("n_nodes")
    for _ in range(iters):
        incoming = (
            flow.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inc"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n))
            .join(incoming.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (teleport + F.lit(damping) * F.coalesce("inc", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint()
        )
    return ranks


def bfs_hops(seeds: DataFrame, edges: DataFrame, max_hops: int) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any seed node.

    ``seeds``: one column ``node``; ``edges``: directed ``(src, dst)``
    (feed both directions for an undirected graph). Returns
    ``(node, hop)`` for every node within ``max_hops`` of a seed
    (hop 0 = the seeds themselves), where ``hop`` is the SHORTEST
    distance — guaranteed level-by-level, no min-aggregate needed.

    The frontier discipline is what distinguishes BFS from the dense
    fixed-iteration loops above: each round joins only the NEWEST layer
    against the edge table (|frontier| x avg-degree work, not
    |visited|), dedups the expansion, and anti-joins the visited set so
    a node is labeled exactly once at its first (= minimum) depth.
    Depth is fixed (``max_hops``), keeping the loop free of driver-side
    count() actions — the standard trade for deterministic plans; an
    early-exit variant would add one cheap `isEmpty` probe per round.
    Both running frames are ``localCheckpoint``'d per round (persisted
    tables at 100 TB) to truncate the growing lineage.
    """
    edges = edges.localCheckpoint(eager=False)
    # dedup defensively: a seed list built from a fanning-out join would
    # otherwise carry duplicate hop-0 rows through every round
    visited = (
        seeds.select("node")
        .distinct()
        .select("node", F.lit(0).alias("hop"))
        .localCheckpoint(eager=False)
    )
    frontier = visited.select("node")
    for h in range(1, max_hops + 1):
        expansion = (
            edges.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(h).alias("hop"))
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(expansion).localCheckpoint(eager=False)
        frontier = expansion.select("node")
    return visited
