"""Strongly connected components by distributed min-label coloring
(the FW-BW / "coloring" algorithm family — the standard Pregel-style
SCC next to the CC/PR/LPA/BFS kernels; reference computes undirected
CC only, e.g. its partition-quality completeness checks, so this is
the directed-graph extension).

Outer round:
1. FORWARD phase — propagate min vid along edge direction to a
   fixpoint: color(v) = min{u : u ⇝ v} (including v). Every vertex v
   with color(v) = v is a *pivot*: no smaller vertex reaches it.
2. BACKWARD phase — from all pivots simultaneously, walk edges
   BACKWARD restricted to same-color endpoints. The marked set of
   pivot c is exactly SCC(c): a marked v has c ⇝ v (color) and
   v ⇝ c (backward walk), and every SCC member keeps color c (a
   smaller ancestor of a member would also be an ancestor of c).
3. Emit (vid, scc = pivot vid), delete the settled vertices, repeat.

Because a pivot is the minimum over its SCC's ancestors, the emitted
label is the SCC's minimum vid — a canonical graph property
independent of iteration schedule, so the driver gate checks it
against a pure-Python Tarjan literal oracle
(linkgraph/oracle/literal.py::sql_scc).

Scale shape: every phase is the CC superstep budget (one join on the
frontier/color table + a partial-aggregated min); the backward phase
propagates from the frontier delta only. Each outer round settles at
least every current pivot (≥1), and in practice link graphs settle in
2-4 outer rounds — the giant SCC goes first, the DAG-ish remainder is
all pivots. All iterated tables roll through localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def strongly_connected_components(
    edges: DataFrame, max_outer: int = 30, max_inner: int = 60
) -> DataFrame:
    """``edges``: DIRECTED DataFrame[src, dst]. Returns
    ``DataFrame[vid: long, scc: long]`` with scc = min vid of the
    strongly connected component."""
    from linkgraph.rolling import RollingCheckpoint

    roll_e = RollingCheckpoint()
    roll_v = RollingCheckpoint()
    roll_c = RollingCheckpoint()
    roll_f = RollingCheckpoint()
    roll_m = RollingCheckpoint()
    roll_out = RollingCheckpoint()

    remaining = roll_e(edges.select("src", "dst").distinct())
    verts = roll_v(
        remaining.select(F.col("src").alias("vid"))
        .unionByName(remaining.select(F.col("dst").alias("vid")))
        .distinct()
    )
    result: DataFrame | None = None
    for _ in range(max_outer):
        if verts.limit(1).count() == 0:
            break
        # -- forward min-label propagation, frontier-delta ------------
        # only vertices whose color improved last round propagate (min
        # is monotone — a stable vertex re-sends what already lost);
        # the improved-count Observation is populated by the eager
        # localCheckpoint, so convergence costs zero extra jobs
        colors = roll_c(verts.withColumn("color", F.col("vid")))
        fcolor = colors
        for _ in range(max_inner):
            msg = remaining.join(
                fcolor, remaining["src"] == fcolor["vid"]
            ).select(F.col("dst").alias("vid"), "color")
            cand = msg.groupBy("vid").agg(F.min("color").alias("color"))
            obs = Observation()
            fcolor = roll_f(
                cand.join(
                    colors.select("vid", F.col("color").alias("_old")),
                    "vid",
                )
                .where(F.col("color") < F.col("_old"))
                .select("vid", "color")
                .observe(obs, F.count(F.lit(1)).alias("n"))
            )
            if obs.get["n"] == 0:
                break
            colors = roll_c(
                colors.join(
                    fcolor.select("vid", F.col("color").alias("_new")),
                    "vid",
                    "left",
                ).select(
                    "vid",
                    F.coalesce("_new", "color").alias("color"),
                )
            )
        # -- same-color edge subgraph (the only edges SCCs can use) ---
        ce = (
            remaining.join(
                colors.select(
                    F.col("vid").alias("src"), F.col("color").alias("c_src")
                ),
                "src",
            )
            .join(
                colors.select(
                    F.col("vid").alias("dst"), F.col("color").alias("c_dst")
                ),
                "dst",
            )
            .where(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst")
        ).cache()
        # -- backward reach from all pivots, frontier-delta -----------
        marked = roll_m(
            colors.where(F.col("color") == F.col("vid")).select("vid", "color")
        )
        frontier = marked
        while True:
            reach = ce.join(
                frontier, ce["dst"] == frontier["vid"]
            ).select(F.col("src").alias("vid"), "color")
            cand = reach.groupBy("vid").agg(F.min("color").alias("color"))
            obs = Observation()
            frontier = roll_m(
                cand.join(marked.select("vid"), "vid", "left_anti").observe(
                    obs, F.count(F.lit(1)).alias("n")
                )
            )
            if obs.get["n"] == 0:
                break
            marked = roll_m(marked.unionByName(frontier))
        # ALWAYS materialize the accumulator into its own roller —
        # scc_found lazily references roll_m generations that the next
        # outer round's roll_m calls will free (the
        # checkpointRDDBlockIdNotFound gotcha from random_walks)
        scc_found = marked.select("vid", F.col("color").alias("scc"))
        result = roll_out(
            scc_found
            if result is None
            else result.unionByName(scc_found)
        )
        # -- peel the settled vertices --------------------------------
        settled = marked.select("vid")
        verts = roll_v(verts.join(settled, "vid", "left_anti"))
        remaining = roll_e(
            remaining.join(
                settled.select(F.col("vid").alias("src")), "src", "left_anti"
            ).join(
                settled.select(F.col("vid").alias("dst")), "dst", "left_anti"
            )
        )
        ce.unpersist()
    if result is None:  # empty edge list
        spark = edges.sparkSession
        return spark.createDataFrame([], "vid long, scc long")
    return result
