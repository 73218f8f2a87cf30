"""PageRank as Pregel-style message passing over DataFrame joins.

Semantics (north star + the survey paper bundled with the reference,
papers/Design and Implementation of Parallel PageRank on Multicore
Platforms.pdf): r'(v) = (1-d)/n + d·(Σ_{u→v} r(u)/outdeg(u) +
dangling_mass/n), d = 0.85, dangling mass redistributed uniformly.

Execution shape per superstep (the scale-critical part):
- ``edges ⋈ ranks`` on src — sort-merge or shuffled-hash join on the
  superstep's only wide dependency; AQE skew-join splits hot src keys.
- message aggregation ``groupBy(dst).sum`` — Spark performs partial
  (map-side) aggregation, so a 10^8-degree hub reduces to one partial
  sum per task before the shuffle; explicit salting
  (``linkgraph.partition.salt``) is available when the *join* itself
  skews.
- lineage truncated every ``checkpoint_every`` supersteps via
  localCheckpoint (or durable checkpoints via ``linkgraph.pregel``) —
  without it the Catalyst plan doubles per iteration.

The edges+outdeg join input is computed once and cached across all
supersteps (the reference analog: CSR built once, base_graph.cpp:92-94).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 20,
    damping: float = 0.85,
    tol: float | None = None,
    directed: bool = False,
    checkpoint_every: int = 3,
    bucket_table: str | None = None,
    n_buckets: int = 32,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Returns ``DataFrame[vid: long, rank: double]``.

    ``init_ranks`` (DataFrame[vid, rank]) warm-starts the iteration —
    the incremental-edges story's second half: after new edges stream
    in (see ``offstream_spark``), restart from yesterday's converged
    ranks instead of uniform. Vertices absent from ``init_ranks`` (the
    genuinely new ones) start at 1/n; the vector is then renormalized
    to sum 1 so the fixpoint target is unchanged. Convergence from a
    warm vector needs far fewer supersteps than from uniform
    (tests/test_algos.py pins warm-5 ≈ cold-20 closer than cold-5),
    and each skipped superstep at 100 TB is a skipped full-corpus
    shuffle.

    ``directed=False`` symmetrizes the one-direction undirected edge
    list first (then no dangling vertices exist and the per-superstep
    dangling-mass job is skipped). With ``tol`` set, stops early when
    max |Δrank| < tol (one extra join per superstep).

    ``bucket_table``: write the (src, dst, outdeg) join input ONCE as a
    table bucketed+sorted on ``src``. Every superstep's ``links ⋈
    ranks`` then reads the bucketed scan with ZERO exchange and ZERO
    sort on the edge side — only the |V|-sized ranks shuffle moves.
    At test scale AQE broadcasts the ranks side anyway; at 10^9+
    vertices ranks stop being broadcastable and this is the difference
    between re-shuffling 100 TB of edges per superstep and not.
    """
    from linkgraph.graph import symmetrize, vertices

    g = edges.select("src", "dst") if directed else symmetrize(edges)
    out_deg = g.groupBy("src").agg(F.count("*").alias("outdeg"))
    # one cached join input reused every superstep
    links = g.join(out_deg, "src").select("src", "dst", "outdeg")
    if bucket_table is not None:
        from linkgraph.csr import drop_table_and_location

        spark = edges.sparkSession
        drop_table_and_location(spark, bucket_table)
        (
            links.write.bucketBy(n_buckets, "src")
            .sortBy("src")
            .mode("overwrite")
            .saveAsTable(bucket_table)
        )
        links = spark.table(bucket_table)
    else:
        links = links.cache()
    verts = vertices(edges).cache()
    n = verts.count()

    from linkgraph.rolling import RollingCheckpoint

    roll = RollingCheckpoint()
    # directed mode references new_ranks twice per round (messages +
    # missing-vertex union) and tol mode joins new vs old ranks —
    # uncheckpointed subtrees re-execute per reference (cost doubles
    # per un-rolled round), so those modes roll every round; the
    # single-reference undirected plan is linear and keeps the cadence
    if directed or tol is not None:
        checkpoint_every = 1
    if init_ranks is not None:
        # roll first: the seeded join feeds two actions (the sum and
        # the normalized select) — uncheckpointed it would execute twice
        seeded = roll(
            verts.join(
                init_ranks.select("vid", F.col("rank").alias("_r0")),
                "vid",
                "left",
            ).select(
                "vid", F.coalesce(F.col("_r0"), F.lit(1.0 / n)).alias("rank")
            )
        )
        total = seeded.agg(F.sum("rank")).first()[0]
        ranks = roll(
            seeded.select("vid", (F.col("rank") / F.lit(total)).alias("rank"))
        )
    else:
        ranks = verts.withColumn("rank", F.lit(1.0 / n))
    teleport = (1.0 - damping) / n
    has_dangling = directed and verts.join(
        out_deg, verts["vid"] == out_deg["src"], "left_anti"
    ).limit(1).count() > 0

    for i in range(iterations):
        dangling_term = 0.0
        if has_dangling:
            dangling_sum = (
                ranks.join(out_deg, ranks["vid"] == out_deg["src"], "left_anti")
                .agg(F.sum("rank"))
                .first()[0]
                or 0.0
            )
            dangling_term = damping * dangling_sum / n
        msgs = links.join(ranks, links["src"] == ranks["vid"]).select(
            F.col("dst").alias("vid"), (F.col("rank") / F.col("outdeg")).alias("c")
        )
        new_ranks = msgs.groupBy("vid").agg(
            (F.lit(teleport + dangling_term) + F.lit(damping) * F.sum("c")).alias(
                "rank"
            )
        )
        # vertices receiving no messages (directed graphs only)
        missing = verts.join(new_ranks, "vid", "left_anti").withColumn(
            "rank", F.lit(teleport + dangling_term)
        )
        new_ranks = new_ranks.unionByName(missing) if directed else new_ranks

        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            new_ranks = roll(new_ranks)
        if tol is not None:
            delta = (
                new_ranks.alias("a")
                .join(ranks.alias("b"), "vid")
                .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))))
                .first()[0]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks.select("vid", "rank")


def pagerank_weighted(
    wedges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Edge-weighted PageRank over a canonical weighted undirected
    edge list ``DataFrame[src, dst, weight]`` (src < dst): rank flows
    along each direction proportionally to weight / Σ out-weight —
    the standard weighted-transition generalization (reference runs
    unweighted PR over partitioned graphs; this is the weighted analog
    over the events interaction graph). Symmetrized input ⇒ no
    dangling vertices, single-reference loop (same superstep budget as
    the unweighted join-based PR: one shuffle join + one map-side
    partial sum per iteration). Returns ``DataFrame[vid, rank]``.
    """
    from linkgraph.rolling import RollingCheckpoint

    roll = RollingCheckpoint()
    # cache the symmetrized input: outw, the links join and verts all
    # scan it, and the upstream wedges derivation (an events
    # self-join) is expensive — without this it re-executes ~3×
    sym = wedges.select("src", "dst", "weight").unionByName(
        wedges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    ).cache()
    outw = sym.groupBy("src").agg(F.sum("weight").alias("outw"))
    links = sym.join(outw, "src").select("src", "dst", "weight", "outw").cache()
    verts = sym.select(F.col("src").alias("vid")).distinct().cache()
    n = verts.count()
    ranks = roll(verts.withColumn("rank", F.lit(1.0 / n)))
    teleport = (1.0 - damping) / n
    for i in range(iterations):
        msgs = links.join(ranks, links["src"] == ranks["vid"]).select(
            F.col("dst").alias("vid"),
            (F.col("rank") * F.col("weight") / F.col("outw")).alias("c"),
        )
        new_ranks = msgs.groupBy("vid").agg(
            (F.lit(teleport) + F.lit(damping) * F.sum("c")).alias("rank")
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            new_ranks = roll(new_ranks)
        ranks = new_ranks
    return ranks.select("vid", "rank")


def pagerank_personalized(
    edges: DataFrame,
    seeds: list[int],
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Personalized PageRank: teleport mass restricted (uniformly) to
    ``seeds`` — r ← (1−d)·e_S + d·Pᵀr from r₀ = e_S. The similarity-
    to-seed-set ranking used for seed expansion / related-item scoring.
    Undirected input is symmetrized ⇒ no dangling mass; vertices that
    receive no flow simply keep rank contributions of 0 and are still
    emitted (full vertex set, like the uniform PR). Same superstep
    budget as ``pagerank``: one shuffle join + one partial-aggregated
    sum per iteration. Returns ``DataFrame[vid, rank]``."""
    from linkgraph.graph import symmetrize
    from linkgraph.rolling import RollingCheckpoint

    roll = RollingCheckpoint()
    # cache sym: out_deg + the links join both scan it and the edge
    # derivation upstream may be an expensive self-join
    sym = symmetrize(edges).cache()
    out_deg = sym.groupBy("src").agg(F.count("*").alias("outdeg"))
    links = sym.join(out_deg, "src").select("src", "dst", "outdeg").cache()
    # derive verts from the cached sym (symmetric ⇒ every vertex is a
    # src) instead of re-running the edge derivation
    verts = sym.select(F.col("src").alias("vid")).distinct().cache()
    seed_set = {int(s) for s in seeds}
    e_s = F.when(
        F.col("vid").isin(sorted(seed_set)), F.lit(1.0 / len(seed_set))
    ).otherwise(F.lit(0.0))
    ranks = roll(verts.withColumn("rank", e_s))
    for i in range(iterations):
        msgs = links.join(ranks, links["src"] == ranks["vid"]).select(
            F.col("dst").alias("vid"),
            (F.col("rank") / F.col("outdeg")).alias("c"),
        )
        flow = msgs.groupBy("vid").agg(
            (F.lit(damping) * F.sum("c")).alias("flow")
        )
        new_ranks = verts.join(flow, "vid", "left").select(
            "vid",
            (
                (F.lit(1.0 - damping) * e_s) + F.coalesce("flow", F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            new_ranks = roll(new_ranks)
        ranks = new_ranks
    return ranks.select("vid", "rank")
