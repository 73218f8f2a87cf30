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

from pyspark.sql import DataFrame, Window
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


def negative_samples(
    edges: DataFrame,
    n_neg: int = 3,
    n_prop: int = 8,
    seed: int = 985,
) -> DataFrame:
    """Deterministic negative edge sampling → DataFrame[u, neg_vid,
    rnk] — up to ``n_neg`` non-adjacent vertices per vertex, the
    training counterpart of ``adamic_adar_topk`` (every link-prediction
    / embedding loss needs negatives).

    Proposals are hash-driven: candidate i for vertex u is the vertex
    whose dense rank is H(u, i, seed) mod n (the engine-portable md5
    hash over ``dense_vertex_ids`` — no RNG state, reproducible across
    engines and cluster sizes). Self-proposals and existing edges are
    removed (broadcast-able dense-id join + anti-join against the
    symmetric edge list); survivors keep proposal order. With n_prop
    proposals for n_neg keeps, a vertex adjacent to less than
    (n_prop − n_neg) of its proposals gets its full n_neg (the driver
    corpus: all 2000 vertices do); callers needing guaranteed counts on
    denser graphs raise n_prop. Scale shape: an n·n_prop-row explode,
    two joins, a per-vertex window — no all-pairs anywhere."""
    from linkgraph.graph import dense_vertex_ids, symmetrize

    d = dense_vertex_ids(edges).cache()
    n = d.count()
    props = d.select(F.col("vid").alias("u")).select(
        "u", F.explode(F.array(*[F.lit(i) for i in range(1, n_prop + 1)])).alias("i")
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", "u", "i", F.lit(seed))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    cand = props.withColumn("idx", F.pmod(h, F.lit(n)))
    cand = cand.join(
        d.select("idx", F.col("vid").alias("neg_vid")), "idx"
    ).where(F.col("neg_vid") != F.col("u"))
    sym = symmetrize(edges).select(
        F.col("src").alias("u"), F.col("dst").alias("neg_vid")
    )
    cand = cand.join(sym, ["u", "neg_vid"], "left_anti")
    w = Window.partitionBy("u").orderBy("i")
    return (
        cand.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= n_neg)
        .select("u", "neg_vid", "rnk")
    )


def jaccard_topk(
    edges: DataFrame,
    top: int = 20,
    max_center_degree: int = 10_000,
) -> DataFrame:
    """Jaccard link prediction → ``DataFrame[u, w, jaccard]`` — the
    ``top`` highest-scoring non-adjacent pairs (u < w) by
    |N(u) ∩ N(w)| / |N(u) ∪ N(w)|. Same wedge enumeration and
    hub-center cap as ``adamic_adar_topk`` (a capped center cannot
    contribute its common-neighbor count — at the default cap that
    center would add ≤ 1/10_000 of a unit of Jaccard mass per pair
    while costing deg² wedge rows; the SQL oracle applies the same
    cap, so the gate pins the capped semantics exactly)."""
    from linkgraph.graph import degrees, symmetrize

    sym = symmetrize(edges)
    deg = degrees(edges)
    ctr = deg.where(
        (F.col("degree") >= 2) & (F.col("degree") <= max_center_degree)
    )
    za = sym.join(ctr, sym["src"] == ctr["vid"]).select(
        F.col("src").alias("z"), F.col("dst").alias("u")
    )
    a = za.alias("a")
    b = za.select(F.col("z"), F.col("u").alias("w")).alias("b")
    wedge = a.join(b, "z").where(F.col("a.u") < F.col("b.w")).select(
        "a.u", "b.w"
    )
    cand = wedge.join(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("w")),
        ["u", "w"],
        "left_anti",
    )
    common = cand.groupBy("u", "w").agg(F.count("*").alias("common"))
    du = deg.select(F.col("vid").alias("u"), F.col("degree").alias("du"))
    dw = deg.select(F.col("vid").alias("w"), F.col("degree").alias("dw"))
    # no broadcast hint on the O(|V|) degree table — AQE broadcasts it
    # when runtime stats fit, shuffles otherwise (scale-safe)
    scored = (
        common.join(du, "u")
        .join(dw, "w")
        .select(
            "u",
            "w",
            F.round(
                F.col("common")
                / (F.col("du") + F.col("dw") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(F.desc("jaccard"), F.asc("u"), F.asc("w")).limit(top)


def common_neighbor_scores(
    edges: DataFrame,
    top: int = 20,
    max_center_degree: int = 10_000,
) -> DataFrame:
    """Three classic link-prediction scores in ONE wedge pass →
    ``DataFrame[u, w, cn, ra_score, pa_score]`` for the ``top``
    non-adjacent pairs (u < w) ranked by common-neighbor count:

    - ``cn``      = |N(u) ∩ N(w)|            (common neighbors)
    - ``ra_score``= Σ_{z ∈ N(u)∩N(w)} 1/deg(z) (resource allocation,
                    Zhou et al. 2009 — like Adamic-Adar but 1/d not
                    1/ln d)
    - ``pa_score``= deg(u)·deg(w)            (preferential attachment)

    Candidate enumeration, hub-center cap, and the anti-join against
    existing edges are shared with ``adamic_adar_topk`` (reference
    parity: GraphPartitioners has no link prediction — this is the
    beyond-reference training-pipeline tier). CN and PA are integer
    (exact); RA is a sum of exact dyadic-ish rationals rounded to 6dp
    AFTER the full sum — the DuckDB oracle mirrors the same rounding.
    Scale shape: identical to the other wedge ops — shuffle by center,
    deg² fan-out bounded by the center cap, then one groupBy and two
    broadcast degree joins."""
    from linkgraph.graph import degrees, symmetrize

    sym = symmetrize(edges)
    deg = degrees(edges)
    ctr = deg.where(
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
        F.count("*").cast("long").alias("cn"),
        F.round(F.sum(F.lit(1.0) / F.col("dz")), 6).alias("ra_score"),
    )
    du = deg.select(F.col("vid").alias("u"), F.col("degree").alias("du"))
    dw = deg.select(F.col("vid").alias("w"), F.col("degree").alias("dw"))
    # no broadcast hint on the O(|V|) degree table — AQE decides
    out = (
        scored.join(du, "u")
        .join(dw, "w")
        .select(
            "u",
            "w",
            "cn",
            "ra_score",
            (F.col("du") * F.col("dw")).cast("long").alias("pa_score"),
        )
    )
    return out.orderBy(F.desc("cn"), F.asc("u"), F.asc("w")).limit(top)
