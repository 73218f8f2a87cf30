"""Synchronous label propagation (community detection), deterministic.

Each round every vertex adopts the most frequent label among its
neighbors; ties break to the *minimum* label (deterministic under any
execution order — required for oracle-exact parity, SURVEY.md §2.5).
Fixed iteration count (synchronous LPA need not converge; oscillation
is expected on bipartite-ish structures, so determinism comes from the
fixed round count).

Execution per round: (1) neighbor-label count — groupBy(vid, label)
with map-side partial aggregation (hub-degree skew collapses per task);
(2) argmax per vertex via a window over the *aggregated* counts (group
size ≤ #distinct neighbor labels, not degree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame, iterations: int = 10, checkpoint_every: int = 3
) -> DataFrame:
    """Returns ``DataFrame[vid: long, label: long]``."""
    from linkgraph.graph import join_ready, symmetrize, vertices

    from linkgraph.rolling import RollingCheckpoint

    roll = RollingCheckpoint()
    # one upfront shuffle+sort; every round's label join then reuses
    # the cached partitioning/ordering of the edge side (guide §2.4)
    sym = join_ready(symmetrize(edges), "src").cache()
    labels = vertices(edges).withColumn("label", F.col("vid"))

    w = Window.partitionBy("vid").orderBy(F.desc("cnt"), F.asc("label"))
    for i in range(iterations):
        counts = (
            sym.join(labels, sym["src"] == labels["vid"])
            .select(F.col("dst").alias("vid"), "label")
            .groupBy("vid", "label")
            .agg(F.count("*").alias("cnt"))
        )
        new_labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vid", "label")
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            new_labels = roll(new_labels)
        labels = new_labels
    return labels.select("vid", "label")


def label_propagation_weighted(
    wedges: DataFrame, iterations: int = 4, checkpoint_every: int = 1
) -> DataFrame:
    """Weighted label propagation over ``DataFrame[src, dst, weight]``
    (src < dst): each round a vertex adopts the label with the largest
    summed incident edge weight among its neighbors; ties break to the
    minimum label (deterministic — integer weight sums, no float
    order sensitivity). Same execution shape as the unweighted LPA:
    partial-aggregated (vid, label) weight sums, then an argmax window
    over the aggregated counts (group size ≤ #distinct neighbor
    labels). Returns ``DataFrame[vid, label]``."""
    from linkgraph.rolling import RollingCheckpoint

    from linkgraph.graph import join_ready

    roll = RollingCheckpoint()
    sym = join_ready(
        wedges.select("src", "dst", "weight").unionByName(
            wedges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        ),
        "src",
    ).cache()
    labels = (
        sym.select(F.col("src").alias("vid"))
        .distinct()
        .withColumn("label", F.col("vid"))
    )
    w = Window.partitionBy("vid").orderBy(F.desc("wsum"), F.asc("label"))
    for i in range(iterations):
        votes = (
            sym.join(labels, sym["src"] == labels["vid"])
            .select(F.col("dst").alias("vid"), "label", "weight")
            .groupBy("vid", "label")
            .agg(F.sum("weight").cast("long").alias("wsum"))
        )
        new_labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vid", "label")
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            new_labels = roll(new_labels)
        labels = new_labels
    return labels.select("vid", "label")
