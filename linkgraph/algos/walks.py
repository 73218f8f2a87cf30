"""Seeded random-walk sampling (GNN/embedding training substrate).

One walk per start vertex, ``walk_len`` steps: at step s the walk at
vertex v moves to the neighbor u minimizing the engine-portable hash
``int(md5(f"{v}:{s}:{u}:{seed}")[:8], 16)`` — a deterministic
pseudo-random choice (the same md5 derandomization the partitioner
stream order uses, computable identically in DuckDB), so walks are
reproducible across engines, runs, and cluster sizes, and the driver
gate can value-check them exactly (no RNG state).

Scale shape per step: frontier ⋈ symmetric edges (shuffle on the
current vertex) + a per-walk ``min_by`` aggregate — the same budget
as one CC superstep; the frontier is one row per walk. The argmin is
a groupBy aggregate (NOT a window) so map-side partial aggregation
collapses a hub's adjacency to one row per walk per input partition
before the shuffle — a 10^8-degree hub never ships its whole
neighbor list into a single task. Dead ends (isolated
vertices can't occur on a symmetrized edge list, but a walk could in
principle hit one on filtered graphs) terminate the walk early via
the inner join. The frontier is rolled through localCheckpoint each
step (single reference, but lineage still grows linearly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    seed: int = 985,
    step_plans: list[str] | None = None,
) -> DataFrame:
    """Returns ``DataFrame[start_vid, step, vid]`` — step 0 is the
    start vertex, steps 1..walk_len the visited vertices.
    ``step_plans`` (optional, tests) collects each step's physical
    plan string before checkpointing — the evidence that the argmin
    partially aggregates map-side."""
    from linkgraph.graph import symmetrize, vertices
    from linkgraph.rolling import RollingCheckpoint

    # two rollers: the frontier's old generations are freed as the walk
    # advances, so the growing output union must materialize into its
    # OWN checkpoint each step — a union over freed frontier blocks
    # would hit checkpointRDDBlockIdNotFound at collect time
    roll = RollingCheckpoint()
    roll_out = RollingCheckpoint()
    sym = symmetrize(edges).cache()
    cur = vertices(edges).select(
        F.col("vid").alias("start_vid"), F.col("vid").alias("vid")
    )
    out = cur.withColumn("step", F.lit(0).cast("long"))
    for s in range(1, walk_len + 1):
        nxt = (
            cur.join(sym, cur["vid"] == sym["src"])
            .withColumn(
                "h",
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":", "src", F.lit(s), "dst", F.lit(seed)
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long"),
            )
            # argmin over (h, dst) as a partial-aggregating min_by —
            # identical winner to the former row_number window, but a
            # hub's fan-out collapses map-side instead of serializing
            # through one window task
            .groupBy("start_vid")
            .agg(
                F.min_by(F.col("dst"), F.struct("h", "dst")).alias("vid")
            )
        )
        if step_plans is not None:
            step_plans.append(
                nxt._jdf.queryExecution().executedPlan().toString()
            )
        cur = roll(nxt)
        out = roll_out(
            out.unionByName(cur.withColumn("step", F.lit(s).cast("long")))
        )
    return out.select("start_vid", "step", "vid")
