"""Link prediction: Adamic-Adar scores over two-hop candidates.

score(u, w) = Σ_{z ∈ N(u) ∩ N(w)} 1 / ln(deg(z)) for non-adjacent
(u, w) — the standard common-neighbor weighting (rare shared neighbors
count more). Candidates are enumerated by the wedge self-join on the
shared center z (the triangle-counting shape), existing edges removed
with a left-anti join against the canonical edge list.

Scale shape: the wedge join shuffles by the center vertex; per-center
fan-out is deg(z)², so hub centers are THE blowup risk at corpus
scale — ``max_center_degree`` excludes them (default 10_000; a center
with deg 10^6 contributes 1/ln(10^6) ≈ 0.07 per pair across 10^12
pairs — astronomically more cost than signal, so capping is both the
safe and the accurate choice). Degree-1 centers cannot form a wedge,
so ln(deg) ≥ ln 2 and the reciprocal is finite.

Determinism for the driver gate: scores rounded to 6dp and ordered by
(rounded score desc, u asc, w asc) before the limit — the DuckDB
oracle sorts the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def adamic_adar_topk(
    edges: DataFrame,
    top: int = 20,
    max_center_degree: int = 10_000,
) -> DataFrame:
    """Returns ``DataFrame[u, w, aa_score]`` — the ``top`` highest-
    scoring non-adjacent pairs (u < w)."""
    from linkgraph.graph import degrees, symmetrize

    sym = symmetrize(edges)
    ctr = degrees(edges).where(
        (F.col("degree") >= 2) & (F.col("degree") <= max_center_degree)
    )
    za = sym.join(ctr, sym["src"] == ctr["vid"]).select(
        F.col("src").alias("z"), F.col("dst").alias("u"), F.col("degree").alias("dz")
    )
    a = za.alias("a")
    b = za.select(F.col("z"), F.col("u").alias("w")).alias("b")
    wedge = a.join(b, "z").where(F.col("a.u") < F.col("b.w")).select(
        "a.u", "b.w", "a.dz"
    )
    cand = wedge.join(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("w")),
        ["u", "w"],
        "left_anti",
    )
    scored = cand.groupBy("u", "w").agg(
        F.round(F.sum(F.lit(1.0) / F.log(F.col("dz"))), 6).alias("aa_score")
    )
    return scored.orderBy(
        F.desc("aa_score"), F.asc("u"), F.asc("w")
    ).limit(top)
