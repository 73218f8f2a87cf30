"""Weighted single-source shortest paths (distributed Bellman-Ford /
min-plus propagation) over an integer-weighted undirected edge list —
the weighted companion to ``algos/bfs.py``.

cost(v) = min over paths Σ edge-weight (edge weight used directly as
traversal cost; weights are positive integers here — the co-action
counts of ``graph.weighted_edges_from_events`` — so every arithmetic
step is exact and the unrolled SQL oracle matches bit-for-bit at a
fixed round count).

Scale shape per round: one join + one partial-aggregated min, with the
join's left side the FRONTIER (vertices whose cost improved last
round) — the same delta argument as unweighted BFS: min-plus is
monotone, so a vertex that didn't improve re-generates only candidate
costs that already lost an earlier fold. Unlike BFS, a vertex can
improve more than once (a longer-hop cheaper path arriving later
re-enters the frontier) — exactly Bellman-Ford's relaxation order,
still |frontier|-bound per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sssp_weighted(
    wedges: DataFrame,
    sources: list[int],
    fixed_iterations: int = 8,
) -> DataFrame:
    """Returns ``DataFrame[vid: long, cost: long]`` — the cheapest
    path cost from the nearest source (multi-source fold, exact
    integer min) for every vertex reached within the round budget."""
    from linkgraph.rolling import RollingCheckpoint

    spark = wedges.sparkSession
    roll = RollingCheckpoint()
    roll_f = RollingCheckpoint()
    from linkgraph.graph import join_ready

    # per-round frontier joins reuse the cached edge-side partitioning
    wsym = join_ready(
        wedges.select("src", "dst", "weight").unionAll(
            wedges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        ),
        "src",
    ).cache()
    dist = spark.createDataFrame(
        [(int(s), 0) for s in sources], "vid long, cost long"
    )
    frontier = dist
    for _ in range(fixed_iterations):
        nbr = wsym.join(frontier, wsym["src"] == frontier["vid"]).select(
            F.col("dst").alias("vid"),
            (F.col("cost") + F.col("weight")).alias("cost"),
        )
        cand = nbr.groupBy("vid").agg(F.min("cost").alias("cost"))
        frontier = roll_f(
            cand.join(
                dist.select("vid", F.col("cost").alias("_old")), "vid", "left"
            )
            .where(F.col("_old").isNull() | (F.col("cost") < F.col("_old")))
            .select("vid", "cost")
        )
        dist = roll(
            frontier.unionByName(dist)
            .groupBy("vid")
            .agg(F.min("cost").alias("cost"))
        )
    return dist
