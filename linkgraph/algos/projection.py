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

from pyspark.sql import DataFrame, Window
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


def attribute_assortativity(
    edges: DataFrame, attrs: DataFrame, vid_col: str = "vid",
    cls_col: str = "cls",
) -> DataFrame:
    """Categorical (Newman) assortativity coefficient of an undirected
    graph whose vertices carry a class attribute:
    r = (Σ e_ii − Σ a_i²) / (1 − Σ a_i²) over the dart mixing matrix.

    Spelled in INTEGER dart counts until one final division —
    r = (same·total − Σ c_i²) / (total² − Σ c_i²) with c_i the darts
    leaving class i — so both engines divide the same two longs and
    the rounded double matches exactly. NULL when every dart stays in
    one class (undefined, zero denominator). Two attribute joins +
    two aggregates; no windows, no driver state."""
    from linkgraph.graph import symmetrize

    sym = symmetrize(edges)
    a = attrs.select(
        F.col(vid_col).cast("long").alias("src"),
        F.col(cls_col).alias("cls_src"),
    )
    b = attrs.select(
        F.col(vid_col).cast("long").alias("dst"),
        F.col(cls_col).alias("cls_dst"),
    )
    # one pass over the darts: per-class counts carry BOTH the totals
    # and the squared row sums, so the dart table is consumed exactly
    # once (no cache to pin/leak)
    darts = sym.join(a, "src").join(b, "dst")
    per_cls = darts.groupBy("cls_src").agg(
        F.count("*").cast("long").alias("c"),
        F.sum((F.col("cls_src") == F.col("cls_dst")).cast("long"))
        .cast("long")
        .alias("si"),
    )
    stats = per_cls.agg(
        F.sum("c").cast("long").alias("t"),
        F.sum("si").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("q"),
    )
    return stats.select(
        F.round(
            F.try_divide(
                F.col("s") * F.col("t") - F.col("q"),
                F.col("t") * F.col("t") - F.col("q"),
            ),
            6,
        ).alias("assortativity")
    )


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman modularity Q of a vertex labeling (community
    assignment) over the undirected graph — the community-quality
    score that grades an LPA/partitioner run the way replication
    factor grades an edge cut.

    Q = Σ_c [ in_c/(2m) − (D_c/(2m))² ] over communities c, with
    in_c the intra-community darts and D_c the community's total
    degree. Spelled in INTEGER dart counts until one final division —
    Q = (s·t − q)/t² with t = 2m darts total, s = Σ in_c,
    q = Σ D_c² — so both engines divide the same two longs and the
    rounded double matches exactly (same trick as
    ``attribute_assortativity``; reference logs its partition quality
    from the same kind of integer tallies, partitioning/metrics.cpp).

    Scale shape: two label joins shuffle-keyed on the endpoints, one
    partial-aggregated groupBy(label) (a mega-community collapses
    map-side), one scalar aggregate. No windows, no driver state.
    """
    from linkgraph.graph import symmetrize

    sym = symmetrize(edges)
    a = labels.select(F.col("vid").alias("src"), F.col("label").alias("lab_src"))
    b = labels.select(F.col("vid").alias("dst"), F.col("label").alias("lab_dst"))
    darts = sym.join(a, "src").join(b, "dst")
    per_cls = darts.groupBy("lab_src").agg(
        F.count("*").cast("long").alias("c"),
        F.sum((F.col("lab_src") == F.col("lab_dst")).cast("long"))
        .cast("long")
        .alias("si"),
    )
    stats = per_cls.agg(
        F.count("*").cast("long").alias("n_communities"),
        F.sum("c").cast("long").alias("t"),
        F.sum("si").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("q"),
    )
    return stats.select(
        "n_communities",
        F.round(
            F.try_divide(
                F.col("s") * F.col("t") - F.col("q"),
                F.col("t") * F.col("t"),
            ),
            6,
        ).alias("modularity"),
    )


def rich_club(edges: DataFrame) -> DataFrame:
    """Rich-club coefficient curve φ(k) = 2·E_k / (N_k·(N_k−1)):
    for each degree threshold k, how densely the vertices of degree
    > k connect among themselves (the hubs-talk-to-hubs gauge that,
    with assortativity, predicts whether degree-based partitioners
    will co-locate hot edges).

    Spelled in integers until the one final division: a vertex-degree
    histogram and an edge min-endpoint-degree histogram are suffix-
    summed over the same degree grid (N_k vertices and E_k edges
    strictly above k), so both engines divide the same longs. φ is
    NULL where N_k < 2 (undefined).

    Scale shape: two partial-aggregated histograms (the edge join is
    shuffle-keyed on the endpoints), then one window over the merged
    histogram — ≤ #distinct degree values rows (≈10³ even on a
    10¹²-edge power-law graph), a single small task by design."""
    from linkgraph.graph import degrees

    deg = degrees(edges)
    dh = deg.groupBy("degree").agg(F.count("*").cast("long").alias("n"))
    ds = deg.select(F.col("vid").alias("src"), F.col("degree").alias("d_src"))
    dd = deg.select(F.col("vid").alias("dst"), F.col("degree").alias("d_dst"))
    eh = (
        edges.join(ds, "src")
        .join(dd, "dst")
        .select(F.least("d_src", "d_dst").alias("degree"))
        .groupBy("degree")
        .agg(F.count("*").cast("long").alias("m"))
    )
    # md grid ⊆ degree grid (every min-endpoint degree is some
    # vertex's degree), so a left join loses nothing
    hist = dh.join(eh, "degree", "left").select(
        "degree", "n", F.coalesce("m", F.lit(0)).cast("long").alias("m")
    )
    w = Window.orderBy(F.desc("degree")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        F.col("degree").alias("k"),
        (F.sum("n").over(w) - F.col("n")).cast("long").alias("n_rich"),
        (F.sum("m").over(w) - F.col("m")).cast("long").alias("e_rich"),
    )
    return cum.select(
        "k",
        "n_rich",
        "e_rich",
        F.round(
            F.try_divide(
                F.lit(2) * F.col("e_rich"),
                F.col("n_rich") * (F.col("n_rich") - F.lit(1)),
            ),
            6,
        ).alias("rich_club"),
    )


def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """Degree-correlation curve k_nn(k): for each degree value k, the
    mean neighbor degree averaged over all darts leaving degree-k
    vertices (Pastor-Satorras convention — dart-weighted, so the
    whole curve is two integer sums per k until one division).
    Rising curve = assortative mixing, falling = hub-leaf.

    Scale shape: one degree join on the dart list + one partial-
    aggregated groupBy(degree) — the same budget as the degree
    histogram; no windows, no driver state."""
    from linkgraph.graph import degrees, symmetrize

    deg = degrees(edges)
    sym = symmetrize(edges)
    ds = deg.select(F.col("vid").alias("src"), F.col("degree").alias("d_src"))
    dd = deg.select(F.col("vid").alias("dst"), F.col("degree").alias("d_dst"))
    darts = sym.join(ds, "src").join(dd, "dst")
    return (
        darts.groupBy(F.col("d_src").alias("k"))
        .agg(
            F.count("*").cast("long").alias("n_darts"),
            F.sum("d_dst").cast("long").alias("sum_nbr_deg"),
        )
        .select(
            "k",
            "n_darts",
            F.round(F.try_divide(F.col("sum_nbr_deg"), F.col("n_darts")), 6)
            .alias("knn_mean"),
        )
    )


def induced_subgraph(edges: DataFrame, m: int = 4, salt: str = "sub") -> DataFrame:
    """Deterministic vertex-sampled induced subgraph (graph
    minibatching / debug-at-scale): keep vertex v iff
    md5(v:salt) % m == 0, keep an edge iff BOTH endpoints survive
    (expected edge retention 1/m²). A narrow map over the edge list —
    no shuffle at all: the endpoint hashes are computed per edge
    row."""
    from linkgraph.hashing import md5_prefix_hash

    keep_src = F.pmod(md5_prefix_hash("src", F.lit(salt)), F.lit(m)) == 0
    keep_dst = F.pmod(md5_prefix_hash("dst", F.lit(salt)), F.lit(m)) == 0
    return edges.where(keep_src & keep_dst).select("src", "dst")


def two_hop_sizes(edges: DataFrame, cap: int = 10000) -> DataFrame:
    """Exact 2-hop neighborhood size per vertex: the number of
    distinct vertices at graph distance exactly 2 (reachable through
    a wedge center of degree ≤ cap, not adjacent, not self). The
    per-vertex neighborhood-function point v ↦ |N₂(v)| that feeds
    sampling-based curvature/expansion diagnostics.

    Same scale shape as Adamic-Adar: wedge fan-out bounded by the
    center-degree cap (a 10⁸-degree hub would otherwise contribute
    deg² pairs), distinct + anti-join on the edge list, then a
    partial-aggregated count."""
    from linkgraph.graph import degrees, symmetrize

    sym = symmetrize(edges)
    ctr = degrees(edges).where(
        (F.col("degree") >= 2) & (F.col("degree") <= cap)
    ).select(F.col("vid").alias("z"))
    za = sym.join(ctr, sym["src"] == ctr["z"]).select(
        "z", F.col("dst").alias("u")
    )
    zb = za.select("z", F.col("u").alias("w"))
    pairs = (
        za.join(zb, "z")
        .where(F.col("u") != F.col("w"))
        .select("u", "w")
        .distinct()
    )
    far = pairs.join(sym, (pairs["u"] == sym["src"]) & (pairs["w"] == sym["dst"]),
                     "left_anti")
    return far.groupBy(F.col("u").alias("vid")).agg(
        F.count("*").cast("long").alias("n2")
    )


def butterflies(edges: DataFrame) -> DataFrame:
    """Bipartite butterfly (2x2 biclique / 4-cycle) census from a
    weighted one-mode projection: a left pair sharing ``weight``
    right-side entities closes C(weight, 2) butterflies, so the global
    count is one integer fold over the projection — the standard
    bipartite clustering denominator (Sanei-Mehri et al., KDD'18)
    computed without ever materializing 4-cycles.

    Scale shape: inherits the projection's hub-cap guard; this step
    itself is a single partial-aggregating SUM. weight*(weight-1) is
    always even, so the ``div 2`` stays in exact integer arithmetic.
    """
    return edges.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.expr("(weight * (weight - 1)) div 2"))
        .cast("long")
        .alias("n_butterflies"),
    )
