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
