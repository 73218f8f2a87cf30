"""Bipartite projection + directed-graph census operators.

Beyond-reference additions (SURVEY.md §2.6) in the training-data
graph family: a web/commerce corpus is full of bipartite incidences
(user-item, doc-domain, page-anchor); projecting one side onto
co-incidence edges is how co-purchase / co-click / co-citation link
graphs get built in the first place — i.e. these feed the engine's
own partitioners and analytics.

Scale shape: the projection's cost is Σ_right (fan-out choose 2),
which a single mega-hub on the right side (a part every customer
bought, a domain every doc links) turns quadratic. ``hub_cap`` drops
right-side hubs above the cap BEFORE the self-join — the standard
guard (same role as the LSH mega-bucket cap in pipeline/dedup.py):
hubs contribute near-zero signal (everyone shares them) at quadratic
cost. The remaining self-join is shuffle-keyed on the right id with
bounded per-key fan-out; the weight aggregation is a plain partial
count. No windows, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bipartite_projection(
    incidence: DataFrame,
    left_col: str,
    right_col: str,
    hub_cap: int = 1000,
) -> DataFrame:
    """Project a bipartite incidence list onto its LEFT side.

    Returns ``DataFrame[u, w, weight]`` with u < w and weight = number
    of distinct right-side entities the two left entities share.
    Right-side entities incident to more than ``hub_cap`` distinct
    left entities are dropped before pairing (quadratic-blowup guard).
    """
    inc = (
        incidence.select(
            F.col(left_col).cast("long").alias("l"),
            F.col(right_col).cast("long").alias("r"),
        )
        .distinct()
    )
    fan = inc.groupBy("r").agg(F.count("*").alias("fan"))
    kept = inc.join(fan.where(F.col("fan") <= hub_cap).select("r"), "r")
    a = kept.select("r", F.col("l").alias("u"))
    b = kept.select("r", F.col("l").alias("w"))
    return (
        a.join(b, "r")
        .where(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count("*").cast("long").alias("weight"))
    )


def co_purchase_edges(spark, sf_dir: str, hub_cap: int = 40) -> DataFrame:
    """Customer co-purchase graph: the customer-part incidence from
    orders ⨝ lineitem, projected onto customers. ``hub_cap=40``
    exercises the hub guard at sf0.01 (max part fan-out 49) while
    keeping sf0.001 (max 39) unfiltered."""
    from linkgraph.graph import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    inc = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).select("o_custkey", "l_partkey")
    return bipartite_projection(inc, "o_custkey", "l_partkey", hub_cap=hub_cap)


def reciprocity(edges: DataFrame) -> DataFrame:
    """Directed-graph reciprocity census: one row
    ``(n_edges, n_mutual, reciprocity)`` where n_mutual counts edges
    whose reverse also exists and reciprocity = n_mutual / n_edges
    (the web-graph bowtie diagnostic). One self-join keyed on the
    reversed pair + one aggregate — no driver state."""
    de = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).distinct()
    rev = de.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        F.lit(1).alias("has_rev"),
    )
    return (
        de.join(rev, ["src", "dst"], "left")
        .agg(
            F.count("*").cast("long").alias("n_edges"),
            F.sum(F.coalesce(F.col("has_rev"), F.lit(0)))
            .cast("long")
            .alias("n_mutual"),
        )
        .select(
            "n_edges",
            "n_mutual",
            F.round(F.col("n_mutual") / F.col("n_edges"), 6).alias(
                "reciprocity"
            ),
        )
    )
