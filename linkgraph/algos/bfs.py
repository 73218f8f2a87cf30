"""Multi-source BFS distances (unweighted shortest paths) — the
fourth classic Pregel kernel next to PageRank/CC/LPA.

dist(v) starts at 0 on the source set; each round propagates
min(dist(u) + 1) over neighbors and folds it with the current
distance — integer min, so results are exact and the unrolled SQL
oracle matches bit-for-bit at a fixed round count. Unreached vertices
simply don't appear (the frontier never visits them).

Scale shape per round: one join + one partial-aggregated min — the CC
superstep budget; rounds = eccentricity of the source set (small on
link graphs). The distance table is rolled through localCheckpoint
every round (referenced twice: propagation + fold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_distances(
    edges: DataFrame,
    sources: list[int],
    max_iterations: int = 20,
    fixed_iterations: int | None = None,
) -> DataFrame:
    """Returns ``DataFrame[vid: long, dist: long]`` for every vertex
    reachable from ``sources`` (sources themselves at dist 0)."""
    from linkgraph.graph import symmetrize
    from linkgraph.rolling import RollingCheckpoint

    spark = edges.sparkSession
    roll = RollingCheckpoint()
    sym = symmetrize(edges).cache()
    dist = spark.createDataFrame(
        [(int(s), 0) for s in sources], "vid long, dist long"
    )
    rounds = fixed_iterations if fixed_iterations is not None else max_iterations
    prev = None
    for _ in range(rounds):
        nbr = sym.join(dist, sym["src"] == dist["vid"]).select(
            F.col("dst").alias("vid"), (F.col("dist") + 1).alias("dist")
        )
        dist = roll(
            nbr.unionByName(dist).groupBy("vid").agg(F.min("dist").alias("dist"))
        )
        if fixed_iterations is None:
            # reached-count grows monotonically; distance sum shrinks —
            # both unchanged ⇔ fixpoint
            cur = dist.agg(
                F.count("*").alias("n"), F.sum("dist").alias("s")
            ).first()
            sig = (cur["n"], cur["s"])
            if sig == prev:
                break
            prev = sig
    return dist
