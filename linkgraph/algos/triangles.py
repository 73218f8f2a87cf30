"""Triangle counting via ordered two-join enumeration.

Input: canonical one-direction undirected edges (src < dst, no
self-loops, deduplicated). A triangle {a,b,c} (a<b<c) is found exactly
once as e(a,b) ⋈ e(b,c) ⋈ e(a,c).

Scale note (``degree_oriented=True``, the default): edges are first
re-oriented from the (degree, vid)-smaller endpoint to the larger —
the standard compact-forward optimization. The wedge join then fans
out by *oriented out-degree*, which is O(√m) per vertex even on
power-law graphs, instead of by raw hub degree. Result set is
identical (each triangle still enumerated exactly once under the
strict total order), so the simple a<b<c SQL oracle matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _orient_by_degree(edges: DataFrame) -> DataFrame:
    from linkgraph.graph import degrees

    # no broadcast hint: the degree table is O(|V|) — AQE broadcasts it
    # from runtime stats when it fits and falls back to a shuffled join
    # when it doesn't (a forced hint OOMs the driver at 10^9 vertices)
    deg = degrees(edges)
    ds = deg.withColumnRenamed("vid", "src").withColumnRenamed("degree", "deg_src")
    dd = deg.withColumnRenamed("vid", "dst").withColumnRenamed("degree", "deg_dst")
    e = edges.join(ds, "src").join(dd, "dst")
    lower_first = (F.col("deg_src") < F.col("deg_dst")) | (
        (F.col("deg_src") == F.col("deg_dst")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )


def triangle_list(edges: DataFrame, degree_oriented: bool = True) -> DataFrame:
    """Enumerate triangles once each → DataFrame[a, b, c] (orientation
    order, not sorted)."""
    e = _orient_by_degree(edges) if degree_oriented else edges.select("src", "dst")
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")


def triangle_counts(edges: DataFrame, degree_oriented: bool = True) -> DataFrame:
    """Per-vertex triangle counts → DataFrame[vid: long, triangles:
    long]. Vertices in no triangle are included with 0 (reference
    "true vertices" semantics — every vertex with ≥1 edge appears)."""
    from linkgraph.graph import vertices

    tri = triangle_list(edges, degree_oriented)
    members = (
        tri.select(F.col("a").alias("vid"))
        .unionAll(tri.select(F.col("b").alias("vid")))
        .unionAll(tri.select(F.col("c").alias("vid")))
    )
    counts = members.groupBy("vid").agg(F.count("*").cast("long").alias("triangles"))
    return (
        vertices(edges)
        .join(counts, "vid", "left")
        .select("vid", F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"))
    )


def triangle_total(edges: DataFrame, degree_oriented: bool = True) -> DataFrame:
    """Global triangle count → one row DataFrame[n_triangles: long]."""
    return triangle_list(edges, degree_oriented).agg(
        F.count("*").cast("long").alias("n_triangles")
    )


def transitivity(edges: DataFrame, degree_oriented: bool = True) -> DataFrame:
    """Global transitivity (graph clustering coefficient):
    3·triangles / wedges, the closed-wedge fraction — the one-row
    census companion to the per-vertex ``clustering_coefficients``.

    Wedges are tallied per vertex as d(d−1) div 2 (integer division
    per row — exact even when Σd² would overflow a double's 53-bit
    mantissa at web scale), so both engines divide the same two longs.
    NULL on wedge-free graphs (a perfect matching). Cost: one
    triangle enumeration + one degree aggregate.
    """
    from linkgraph.graph import degrees

    tri = triangle_total(edges, degree_oriented)
    wedges = degrees(edges).agg(
        F.sum(F.expr("degree * (degree - 1) div 2")).cast("long").alias("n_wedges")
    )
    return tri.crossJoin(wedges).select(
        "n_triangles",
        "n_wedges",
        F.round(
            F.try_divide(F.lit(3) * F.col("n_triangles"), F.col("n_wedges")), 6
        ).alias("transitivity"),
    )


TRI_SAMPLE_PCT = 50


def triangle_estimate(edges: DataFrame, pct: int = TRI_SAMPLE_PCT) -> DataFrame:
    """Sampled triangle-count estimate with its exact-count audit.

    Each edge is kept iff H(src,dst) mod 100 < ``pct`` (the portable
    md5-prefix hash, so the "coin flips" replay identically in the SQL
    oracle); a triangle survives iff all three edges do, so
    E[T_sampled] = (pct/100)^3 · T and T̂ = T_sampled · (100/pct)^3 is
    unbiased (Tsourakakis et al.'s DOULION estimator). At 100 TB this
    is the cheap first pass — the wedge join runs on a pct^2-smaller
    edge set — and the exact column exists so the small-SF gate pins
    the arithmetic; production drops it.
    """
    from linkgraph.hashing import md5_prefix_hash

    h = md5_prefix_hash(F.lit("tri"), F.col("src"), F.col("dst"))
    sampled = edges.where((h % 100) < pct)
    exact = triangle_total(edges).withColumnRenamed("n_triangles", "n")
    samp = triangle_total(sampled).withColumnRenamed("n_triangles", "ns")
    factor = float((100 / pct) ** 3)
    return exact.crossJoin(samp).select(
        F.col("n").alias("n_triangles"),
        F.col("ns").alias("n_sampled"),
        F.round(F.col("ns") * F.lit(factor), 6).alias("estimate"),
        F.round(
            F.try_divide(F.col("ns") * F.lit(factor) - F.col("n"), F.col("n")), 6
        ).alias("rel_err"),
    )
