"""Multi-source BFS distances (unweighted shortest paths) — the
fourth classic Pregel kernel next to PageRank/CC/LPA.

dist(v) starts at 0 on the source set; each round propagates
min(dist(u) + 1) over neighbors and folds it with the current
distance — integer min, so results are exact and the unrolled SQL
oracle matches bit-for-bit at a fixed round count. Unreached vertices
simply don't appear (the frontier never visits them).

Scale shape per round: one join + one partial-aggregated min — the CC
superstep budget — but the join's left side is the FRONTIER (vertices
whose distance improved last round), not the whole reached set, so
per-round edge fan-out is |frontier|-bound: late rounds touching a
handful of fringe vertices cost a handful of joins, not |reached|
re-propagations. Exact: unit-weight min is monotone, so a vertex that
didn't improve last round generates exactly the candidate distances
it already generated before — dropping it changes nothing. Both the
distance table and the frontier are rolled through localCheckpoint
every round (each is referenced twice per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def landmark_distances(
    edges: DataFrame,
    landmarks: list[int],
    fixed_iterations: int = 8,
) -> DataFrame:
    """Per-landmark BFS distances — ``DataFrame[lm, vid, dist]`` with
    one row per (landmark, reachable vertex). Unlike
    ``bfs_distances`` (which folds all sources into one min), the
    state is keyed by (lm, vid), so all |landmarks| BFS trees advance
    in ONE batched superstep loop: per round one join + one
    partial-aggregated min, fan-out bounded by |frontier| summed over
    landmarks — the standard landmark/sketch substrate (harmonic /
    closeness centrality estimates, Bourgain embeddings) at 100 TB,
    where per-landmark sequential sweeps would multiply the superstep
    count by |landmarks|."""
    from linkgraph.graph import join_ready, symmetrize
    from linkgraph.rolling import RollingCheckpoint

    spark = edges.sparkSession
    roll = RollingCheckpoint()
    roll_f = RollingCheckpoint()
    # per-round frontier joins reuse the cached edge-side partitioning
    sym = join_ready(symmetrize(edges), "src").cache()
    dist = spark.createDataFrame(
        [(int(s), int(s), 0) for s in landmarks], "lm long, vid long, dist long"
    )
    frontier = dist
    for _ in range(fixed_iterations):
        nbr = sym.join(frontier, sym["src"] == frontier["vid"]).select(
            "lm", F.col("dst").alias("vid"), (F.col("dist") + 1).alias("dist")
        )
        cand = nbr.groupBy("lm", "vid").agg(F.min("dist").alias("dist"))
        frontier = roll_f(
            cand.join(
                dist.select("lm", "vid", F.col("dist").alias("_old")),
                ["lm", "vid"],
                "left",
            )
            .where(F.col("_old").isNull() | (F.col("dist") < F.col("_old")))
            .select("lm", "vid", "dist")
        )
        dist = roll(
            frontier.unionByName(dist)
            .groupBy("lm", "vid")
            .agg(F.min("dist").alias("dist"))
        )
    return dist


def harmonic_centrality(
    edges: DataFrame,
    landmarks: list[int],
    fixed_iterations: int = 8,
) -> DataFrame:
    """Landmark-estimated harmonic centrality: C_H(v) = Σ_{s∈L, v≠s}
    1/d(s, v) over the landmark set (the standard sampled estimator —
    exact harmonic centrality is all-pairs and off the table at any
    scale). Exact integer distances feed a 6-decimal-rounded float
    sum, so the unrolled-CTE oracle matches."""
    d = landmark_distances(edges, landmarks, fixed_iterations)
    return (
        d.where(F.col("dist") > 0)
        .groupBy("vid")
        .agg(F.round(F.sum(F.lit(1.0) / F.col("dist")), 6).alias("harmonic"))
    )


def eccentricity_lb(
    edges: DataFrame,
    landmarks: list[int],
    fixed_iterations: int = 8,
) -> DataFrame:
    """Landmark eccentricity lower bound: ecc(v) ≥ max_{s∈L} d(s, v)
    — the double-sweep-style per-vertex diameter diagnostic (the max
    over any landmark set is a valid lower bound; the graph's true
    diameter ≥ the largest value emitted). Integer max over the
    shared landmark-BFS state — exact cross-engine; one extra
    partial-aggregated max on top of ``landmark_distances``."""
    d = landmark_distances(edges, landmarks, fixed_iterations)
    return d.groupBy("vid").agg(
        F.count("*").cast("long").alias("n_landmarks"),
        F.max("dist").cast("long").alias("ecc_lb"),
    )


def bfs_distances(
    edges: DataFrame,
    sources: list[int],
    max_iterations: int = 20,
    fixed_iterations: int | None = None,
    frontier_counts: list[int] | None = None,
) -> DataFrame:
    """Returns ``DataFrame[vid: long, dist: long]`` for every vertex
    reachable from ``sources`` (sources themselves at dist 0).
    ``frontier_counts`` (optional) collects the per-round frontier
    sizes — the scale evidence that late rounds shrink."""
    from linkgraph.graph import join_ready, symmetrize
    from linkgraph.rolling import RollingCheckpoint

    spark = edges.sparkSession
    roll = RollingCheckpoint()
    roll_f = RollingCheckpoint()
    # per-round frontier joins reuse the cached edge-side partitioning
    sym = join_ready(symmetrize(edges), "src").cache()
    dist = spark.createDataFrame(
        [(int(s), 0) for s in sources], "vid long, dist long"
    )
    frontier = dist  # round 1 propagates from the sources
    rounds = fixed_iterations if fixed_iterations is not None else max_iterations
    if frontier_counts is not None:
        frontier_counts.append(len(sources))
    for _ in range(rounds):
        # propagate from the frontier only (delta); candidates a
        # non-frontier vertex would re-generate already lost the min
        # fold in an earlier round — dropping them is exact
        nbr = sym.join(frontier, sym["src"] == frontier["vid"]).select(
            F.col("dst").alias("vid"), (F.col("dist") + 1).alias("dist")
        )
        cand = nbr.groupBy("vid").agg(F.min("dist").alias("dist"))
        frontier = roll_f(
            cand.join(
                dist.select("vid", F.col("dist").alias("_old")), "vid", "left"
            )
            .where(F.col("_old").isNull() | (F.col("dist") < F.col("_old")))
            .select("vid", "dist")
        )
        dist = roll(
            frontier.unionByName(dist)
            .groupBy("vid")
            .agg(F.min("dist").alias("dist"))
        )
        if frontier_counts is not None or fixed_iterations is None:
            n_new = frontier.count()
            if frontier_counts is not None:
                frontier_counts.append(n_new)
            # empty frontier ⇔ fixpoint (min is monotone)
            if fixed_iterations is None and n_new == 0:
                break
    return dist


def distance_histogram(
    edges: DataFrame,
    landmarks: list[int],
    fixed_iterations: int = 8,
) -> DataFrame:
    """Landmark-sampled distance distribution — the neighborhood-
    function / effective-diameter estimator (ANF-style, with exact
    per-landmark BFS instead of sketches). Returns one row per
    distance value: ``(dist, n_pairs, cum_share)`` where cum_share is
    the fraction of reached (landmark, vertex) pairs at distance ≤
    dist; the effective diameter reads off as the smallest dist with
    cum_share ≥ 0.9. Integer counts + a fixed-order window over the
    ≤ fixed_iterations+1 histogram rows — exact cross-engine."""
    from pyspark.sql import Window

    d = landmark_distances(edges, landmarks, fixed_iterations)
    hist = d.groupBy("dist").agg(F.count("*").cast("long").alias("n_pairs"))
    w = Window.orderBy("dist")
    total = Window.orderBy("dist").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return hist.select(
        "dist",
        "n_pairs",
        F.round(F.sum("n_pairs").over(w) / F.sum("n_pairs").over(total), 6)
        .alias("cum_share"),
    )
