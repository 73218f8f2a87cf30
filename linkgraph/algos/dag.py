"""Bounded-depth topological layering over the degree-free orientation
DAG.

The co-occurrence edge table is emitted with ``src < dst``
(linkgraph.extract — mirroring the reference's canonical edge form,
graphs/graph.cpp edge normalization), so the directed view of that
table is acyclic by construction. ``topo_levels`` assigns each vertex
the length of the longest path that ends at it using at most
``max_depth`` edges — the classic dependency-layering pass a build
system or repo-import analyzer runs over a source-code link graph
("how deep is this file in the include chain"), bounded so a single
pathological chain can't run the job forever.

Level is monotone non-decreasing across rounds and each round relaxes
every edge once (Bellman-Ford style), so round k discovers exactly the
paths of length k: propagating only the vertices whose level IMPROVED
last round (frontier delta) is complete, and the fixed round count
makes the result bit-equal to the unrolled cumulative-max SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def topo_levels(edges: DataFrame, max_depth: int = 6) -> DataFrame:
    """DataFrame[vid, level] — longest-path-to-vertex length, capped at
    ``max_depth`` edges. ``edges`` must be the canonical ``src < dst``
    co-occurrence table (a DAG under the natural orientation).

    Scale shape: per round one co-partitioned frontier-to-edges join +
    a MAX aggregate (map-side partial combine collapses hub fan-in
    before the shuffle). The frontier only ever shrinks relative to
    the improved set, and rounds are fixed — no driver-side graph
    state, no convergence actions.
    """
    from linkgraph.graph import join_ready
    from linkgraph.rolling import RollingCheckpoint

    roll = RollingCheckpoint()
    roll_f = RollingCheckpoint()
    # one upfront shuffle+sort; each round's frontier join reuses the
    # cached partitioning/ordering of the edge side (guide §2.4)
    e = join_ready(edges.select("src", "dst"), "src").cache()
    verts = (
        e.select(F.col("src").alias("vid"))
        .unionAll(e.select(F.col("dst").alias("vid")))
        .distinct()
    )
    lv = roll(verts.select("vid", F.lit(0).cast("long").alias("level")))
    frontier = lv
    for _ in range(max_depth):
        cand = (
            frontier.join(e, frontier["vid"] == e["src"])
            .select(F.col("dst").alias("vid"), (F.col("level") + 1).alias("level"))
            .groupBy("vid")
            .agg(F.max("level").alias("level"))
        )
        frontier = roll_f(
            cand.join(lv.select("vid", F.col("level").alias("_old")), "vid")
            .where(F.col("level") > F.col("_old"))
            .select("vid", "level")
        )
        lv = roll(
            frontier.unionByName(lv).groupBy("vid").agg(F.max("level").alias("level"))
        )
    e.unpersist()
    return lv.select("vid", F.col("level").cast("long").alias("level"))
