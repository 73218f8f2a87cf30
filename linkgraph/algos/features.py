"""GNN-style neighbor feature aggregation over the link graph.

Beyond-reference (SURVEY.md §2.6): the standard pre-training /
graph-ML feature step — each vertex aggregates its neighbors'
embedding vectors (one message-passing layer; stack for k hops).
Joins the ``embeddings`` table onto the co-occurrence graph.

Cross-engine determinism: floating-point SUMS depend on reduction
order, so a naive avg would be unhashable across Spark/DuckDB. The
operator therefore QUANTIZES each feature element first —
``q = round(x * 10^6)`` as a long. The inputs are bit-identical
float32s in both engines, the product is the same IEEE double, and
both engines round identical doubles identically — so the quantized
values agree exactly, and integer sums are order-free. The output is
the per-dimension summed quantized features plus the neighbor count
(mean = sum / n in micro-units, left to the caller so everything
stays integer-exact).

Scale shape: edges ⨝ features (shuffle on the feature key, feature
rows are narrow), posexplode to (vertex, dim) — a 64× fan-out of the
edge-feature join, NOT of the raw corpus — then a partially-aggregated
groupBy(vertex, dim) sum and a bounded per-vertex array rebuild
(sort_array over ≤ dims elements). No windows over unbounded groups;
a hub's aggregation is a plain combinable sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000


def feature_propagation(
    edges: DataFrame,
    features: DataFrame,
    id_col: str = "vec_id",
    feat_col: str = "embedding",
) -> DataFrame:
    """One message-passing layer over the undirected graph. Returns
    ``DataFrame[vid, n_nbrs, feat_sum: array<long>]`` — for each
    vertex with ≥1 neighbor that has a feature row, the element-wise
    sum of the neighbors' quantized (×10^6, rounded) feature vectors
    and the number of contributing neighbors."""
    from linkgraph.graph import symmetrize

    sym = symmetrize(edges)
    qfeat = features.select(
        F.col(id_col).cast("long").alias("fid"),
        F.transform(
            F.col(feat_col),
            lambda x: F.round(x.cast("double") * QUANT).cast("long"),
        ).alias("qv"),
    )
    contrib = sym.join(qfeat, sym["src"] == qfeat["fid"]).select(
        F.col("dst").alias("vid"), F.posexplode("qv").alias("pos", "v")
    )
    dim_sums = contrib.groupBy("vid", "pos").agg(
        F.sum("v").alias("s"),
        # every dimension of one neighbor contributes exactly once, so
        # any fixed pos carries the neighbor count
        F.count("*").alias("n"),
    )
    return (
        dim_sums.groupBy("vid")
        .agg(
            F.max("n").cast("long").alias("n_nbrs"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda st: st["s"],
            ).alias("feat_sum"),
        )
    )
