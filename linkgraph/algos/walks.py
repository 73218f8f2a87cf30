"""Seeded random-walk sampling (GNN/embedding training substrate).

One walk per start vertex, ``walk_len`` steps: at step s the walk at
vertex v moves to the neighbor u minimizing the engine-portable hash
``int(md5(f"{v}:{s}:{u}:{seed}")[:8], 16)`` — a deterministic
pseudo-random choice (the same md5 derandomization the partitioner
stream order uses, computable identically in DuckDB), so walks are
reproducible across engines, runs, and cluster sizes, and the driver
gate can value-check them exactly (no RNG state).

Scale shape per step: frontier ⋈ symmetric edges (shuffle on the
current vertex) + a per-walk argmin window — the same budget as one
CC superstep; the frontier is one row per walk. Dead ends (isolated
vertices can't occur on a symmetrized edge list, but a walk could in
principle hit one on filtered graphs) terminate the walk early via
the inner join. The frontier is rolled through localCheckpoint each
step (single reference, but lineage still grows linearly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def random_walks(
    edges: DataFrame, walk_len: int = 4, seed: int = 985
) -> DataFrame:
    """Returns ``DataFrame[start_vid, step, vid]`` — step 0 is the
    start vertex, steps 1..walk_len the visited vertices."""
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
    w = Window.partitionBy("start_vid").orderBy("h", "dst")
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
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("start_vid", F.col("dst").alias("vid"))
        )
        cur = roll(nxt)
        out = roll_out(
            out.unionByName(cur.withColumn("step", F.lit(s).cast("long")))
        )
    return out.select("start_vid", "step", "vid")
