"""Spark-coarse Neighbor-Expansion (NE) edge partitioning.

The reference's flagship algorithm (/root/reference/algorithms/ne/
ne.cpp:90-198; its only golden artifact, /root/reference/NE_result, is
NE quality numbers) grows one partition at a time: a min-degree frontier
heap expands a core set C, neighbors form the boundary S, and edges
with both endpoints inside C∪S are claimed under a capacity check
(ne.cpp:324-381). That traversal is inherently sequential and
heap-driven — anti-idiomatic for DataFrames.

This module is the DISTRIBUTED COARSENING of the same idea, following
the published distributed-NE design (the repo bundles the paper:
/root/reference/papers/Distributed Edge Partitioning for Trillion-edge
Graphs.pdf). The reference's own parallel fork takes the same shape:
dne.cpp:124-180 grows ALL partitions concurrently (one thread per
partition, per-thread min-heaps, CAS edge claims, barrier syncs for
degree state) — this module's synchronous rounds are that design's
BSP coarsening, with the barrier as the round boundary and the
capacity windows as the CAS claim. All k clusters grow in parallel
from low-degree seeds by
synchronous label-expansion rounds (each round = one join + one
grouped argmax — pure DataFrame ops), capacity-bounded like the
reference's core sets; edges are then placed by their endpoints'
clusters — intra-cluster edges stay home (the C∪S claim), cut edges go
to the LOWER-degree endpoint's cluster so high-degree vertices are the
replicated ones (the same replication preference DBH/HDRF encode).

NOT bit-parity with ne.cpp (documented): the reference's
one-partition-at-a-time growth ordering cannot be reproduced by
synchronous parallel expansion. The quality bar is relative: on
community-structured graphs RF must beat chunked HDRF on the same
input (tests/test_ne.py), matching the role NE plays in the
reference's own results (NE_result:35 — RF 2.506 at k=32 on com-orkut
vs HDRF-class streaming RF well above that).

Scale shape: R rounds × (one shuffle join + one grouped argmax), a
k-vector of cluster sizes on the driver — no O(|V|) driver state; the
labels DataFrame is rolled through localCheckpoint each round.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BALANCE_SLACK = 1.05  # cluster-size cap slack, mirroring base_graph.hpp:22
# Seed-hood bounds (see _seed_hoods): neighbors with degree above
# max(HOOD_EXPAND_MIN_CAP, HOOD_EXPAND_DEG_MULT·avg_degree) stay in the
# 1-hop hood but are NOT expanded to their own neighbors, and each hood
# is deterministically truncated to its HOOD_MAX lowest vids — so driver
# bytes are bounded by |pool|·HOOD_MAX regardless of hub adjacency.
HOOD_EXPAND_MIN_CAP = 16
HOOD_EXPAND_DEG_MULT = 4
HOOD_MAX = 4096


def _seed_hoods(
    sym: DataFrame,
    deg: DataFrame,
    pool: DataFrame,
    d_cap: int,
    hood_max: int = HOOD_MAX,
) -> dict[int, set[int]]:
    """Bounded 2-hop neighborhoods of the seed-candidate pool.

    The naive 2-hop join materializes each pool vertex's
    neighbors-of-neighbors; on a power-law graph a degree-1 pool vertex
    attached to a hub would drag the hub's entire adjacency into one
    ``collect_set`` — unbounded driver bytes. Two bounds make it safe at
    any scale, both deterministic (the replay oracle mirrors them,
    linkgraph/oracle/literal.py::_ne_assignment):

    * hop-2 expands only through neighbors with degree ≤ ``d_cap``. A
      hub neighbor stays in the hood itself (two candidates sharing a
      hub are already distance-2 via the hop-1 overlap), but its
      adjacency is not treated as automatic coverage — cheaper AND
      semantically better: expanding through a hub would conflate every
      community the hub touches into one coverage blob.
    * each hood is truncated to its ``hood_max`` lowest vids
      (``slice(sort_array(...))`` — deterministic, unlike a bare
      ``collect_set`` prefix), so the collect is ≤ |pool|·hood_max rows
      no matter what the graph looks like.
    """
    pv = pool.select(F.col("vid").alias("pv"))
    h1 = sym.join(pv, sym["src"] == pv["pv"]).select("pv", F.col("dst").alias("n"))
    expandable = deg.where(F.col("degree") <= d_cap).select(F.col("vid").alias("n"))
    h2 = (
        h1.join(expandable, "n")
        .join(sym, F.col("n") == sym["src"])
        .select("pv", F.col("dst").alias("n"))
    )
    return {
        r["pv"]: set(r["hood"])
        for r in h1.unionAll(h2)
        .groupBy("pv")
        .agg(
            F.slice(
                F.sort_array(F.collect_set("n")), 1, hood_max
            ).alias("hood")
        )
        .collect()
    }


def ne_coarse(
    edges: DataFrame,
    k: int,
    rounds: int = 15,
    seed: int = 985,
    balance: str = "vertex",
) -> DataFrame:
    """NE-coarse edge partitioning → DataFrame[src, dst, partition].

    Phase 1 (vertex clustering): seed k clusters with the k
    lowest-degree vertices (the reference seeds each partition from the
    global min-degree vertex, ne.cpp:108-115); each round, every
    unclustered vertex adjacent to a cluster joins the cluster where it
    has the most neighbors (ties → lowest cluster id), skipping
    clusters at capacity ceil(slack·n/k); stragglers (disconnected or
    only adjacent to closed clusters) fall back to hash placement over
    open clusters. Phase 2 (edge placement): intra-cluster edges stay;
    cut edges follow the lower-degree endpoint (ties → src side).

    ``balance``: what the capacity cap counts. ``'vertex'`` (default,
    the replay-oracle-pinned mode) caps each cluster's VERTEX count at
    ceil(slack·n/k) — simple, but a cluster of high-degree vertices
    collects disproportionate edges, so edge balance (alpha) drifts on
    skewed community sizes (measured 1.42 at k=128). ``'degree'`` caps
    each cluster's DEGREE SUM at ceil(slack·2m/k) — the closer proxy
    for final edge load, mirroring the reference's edge-count capacity
    (ne.cpp:266-270 caps occupied EDGES, not vertices); rounds admit
    candidates in (cnt desc, vid) order while the cluster's running
    degree sum fits. Costs one extra join per round (candidate
    degrees).

    Measured trade (tests/test_ne.py): on the k=128 planted fixture
    (density skew) degree balance improves alpha 1.42 → 1.26 at ~equal
    RF; on the size-skewed overlap fixture (uniform per-vertex degree,
    so vertex count already ∝ degree sum) it only truncates communities
    earlier and LOSES on both axes (alpha 1.12 → 1.35) — hence vertex
    balance stays the default and 'degree' is for density-skewed
    graphs.
    """
    from linkgraph.graph import degrees, join_ready, symmetrize, vertices
    from linkgraph.rolling import RollingCheckpoint

    spark = edges.sparkSession
    # every adoption round (and the seed-hood pass) joins sym on src —
    # make the cached edge side join-ready once (guide §2.4)
    sym = join_ready(symmetrize(edges), "src").cache()
    deg = degrees(edges).cache()
    n = deg.count()
    two_m = deg.agg(F.sum("degree")).first()[0]
    if balance == "degree":
        cap = int(np.ceil(BALANCE_SLACK * two_m / k))
    else:
        cap = int(np.ceil(BALANCE_SLACK * n / k))

    # Seeds: k low-degree vertices chosen GREEDILY SPREAD APART — a
    # candidate pool of the 8k lowest-degree vertices (orderBy().limit
    # = distributed take-ordered, O(k) rows on the driver by design)
    # with their neighbor sets; a candidate is skipped if it is within
    # distance 2 of an already-picked seed (shared vertex in seed ∪
    # neighbors). Plain global min-degree seeding measurably drops two
    # seeds into one community, splitting it while another community
    # goes seedless (RF 1.63 → 1.1x-range with spreading on the
    # planted fixture).
    pool_n = max(16 * k, 64)
    pool = deg.orderBy(F.asc("degree"), F.asc("vid")).limit(pool_n)
    # 2-hop neighborhoods of the pool: direct distance-2 separation is
    # too weak — two low-degree vertices in the same sparse community
    # often share no direct neighbor. Bounded per _seed_hoods (hop-2
    # degree cap + deterministic hood truncation) so a leaf-attached
    # hub cannot drag its adjacency to the driver.
    d_cap = max(HOOD_EXPAND_MIN_CAP, int(np.ceil(HOOD_EXPAND_DEG_MULT * two_m / n)))
    pool_hood = _seed_hoods(sym, deg, pool, d_cap)
    picked: list[int] = []
    covered: set[int] = set()
    pool_rows = pool.collect()  # one action; reused by the fill pass
    for r in pool_rows:  # already in (degree, vid) order
        v = int(r["vid"])
        hood = pool_hood.get(v, set())
        if v in covered or (hood & covered):
            continue
        picked.append(v)
        covered |= hood | {v}
        if len(picked) == k:
            break
    if len(picked) < k:
        # pool too clustered for full separation — fill with the
        # candidates whose neighborhoods overlap the covered set least
        # (ties → degree order, the list's order)
        rest = [
            (len(pool_hood.get(int(r["vid"]), set()) & covered), i, int(r["vid"]))
            for i, r in enumerate(pool_rows)
            if int(r["vid"]) not in picked
        ]
        for _, _, v in sorted(rest):
            picked.append(v)
            covered |= pool_hood.get(v, set()) | {v}
            if len(picked) == k:
                break
    labels = spark.createDataFrame(
        [(v, i) for i, v in enumerate(picked)], "vid long, cluster long"
    )
    roll = RollingCheckpoint()
    labels = roll(labels)
    sizes = np.zeros(k, dtype=np.int64)
    if balance == "degree":
        size_rows = (
            labels.join(deg, "vid").groupBy("cluster")
            .agg(F.sum("degree").alias("w")).collect()
        )
    else:
        size_rows = labels.groupBy("cluster").agg(
            F.count("*").alias("w")
        ).collect()
    for r in size_rows:
        sizes[r["cluster"]] += r["w"]
    labeled_n = len(picked)

    w_pick = Window.partitionBy("vid").orderBy(F.desc("cnt"), F.asc("cluster"))
    for _ in range(rounds):
        if labeled_n >= n:
            break
        open_clusters = [int(c) for c in np.flatnonzero(sizes < cap)]
        if not open_clusters:
            break
        # candidate adoption: unlabeled neighbors of labeled vertices,
        # each picking its strongest open cluster (ties → lowest id)
        cand = (
            sym.join(labels, sym["src"] == labels["vid"])
            .select(F.col("dst").alias("vid"), "cluster")
            .where(F.col("cluster").isin(open_clusters))
            .groupBy("vid", "cluster")
            .agg(F.count("*").alias("cnt"))
            .join(labels.select(F.col("vid")), "vid", "left_anti")
        )
        if balance == "degree":
            cand = cand.join(deg, "vid")  # candidate degree for the cap
        # capacity: keep the cnt-strongest adoptions per open cluster
        # up to its remaining headroom (deterministic tie-break by vid).
        # The per-cluster row_number window sorts that cluster's whole
        # candidate frontier in ONE task — on a hub-dominated frontier
        # that task serializes the round. Exact-safe pre-filter first:
        # from a distributed (cluster, cnt) histogram (≤ distinct cnt
        # values × k rows on the driver) compute each cluster's
        # headroom-th largest cnt; candidates strictly below it can
        # never rank ≤ headroom, so dropping them before the window
        # changes nothing (ties AT the threshold still compete by vid
        # inside the window). Result is bit-identical to the unfiltered
        # window (the replay oracle stays green).
        headroom = {c: int(cap - sizes[c]) for c in open_clusters}
        keep_cols = ["vid", "cluster", "cnt"] + (
            ["degree"] if balance == "degree" else []
        )
        best = (
            cand.withColumn("_rn", F.row_number().over(w_pick))
            .where(F.col("_rn") == 1)
            .select(*keep_cols)
        )
        # Exact-safe pre-filter threshold, computed IN-PLAN instead of
        # through a per-round driver collect (one fewer job × rounds —
        # guide §1.5/§5): per cluster, the headroom-th largest cnt is
        # the max cnt whose cumulative (cnt desc) row count reaches the
        # headroom; candidates strictly below it can never rank within
        # the headroom, so dropping them before the window changes
        # nothing (ties AT the threshold still compete by vid inside
        # the window — bit-identical to the former driver-side
        # histogram walk, which this replaces).
        headroom_col = None
        for c, h in headroom.items():
            expr = F.when(F.col("cluster") == c, F.lit(h))
            headroom_col = (
                expr if headroom_col is None
                else headroom_col.when(F.col("cluster") == c, F.lit(h))
            )
        w_hist = Window.partitionBy("cluster").orderBy(F.desc("cnt"))
        thr_df = (
            best.groupBy("cluster", "cnt")
            .agg(F.count("*").alias("_rows"))
            .withColumn(
                "_cum",
                F.sum("_rows").over(
                    w_hist.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            )
            .where(F.col("_cum") >= headroom_col)
            .groupBy("cluster")
            .agg(F.max("cnt").alias("_thr"))
        )
        w_cap = Window.partitionBy("cluster").orderBy(F.desc("cnt"), F.asc("vid"))
        # the per-cluster budget column: admitted rows are the prefix of
        # the (cnt desc, vid) order whose row count (vertex balance) or
        # running degree sum (degree balance) fits the headroom
        if balance == "degree":
            fill = F.sum("degree").over(
                w_cap.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        else:
            fill = F.row_number().over(w_cap)
        admitted = (
            best.join(thr_df, "cluster", "left")
            .where(F.col("cnt") >= F.coalesce(F.col("_thr"), F.lit(0)))
            .withColumn("_fill", fill)
            .where(F.col("_fill") <= headroom_col)
            .select(*keep_cols)
        )
        # per-cluster admission counts ride the labels checkpoint as an
        # Observation (k count / 2k count+degree-sum expressions over
        # the open clusters) instead of a separate aggregate job per
        # round — one less job × rounds (guide §1.5/§5)
        from pyspark.sql import Observation

        obs = Observation()
        metrics = []
        for c in headroom:
            is_c = (F.col("cluster") == c).cast("long")
            metrics.append(F.sum(is_c).alias(f"nv{c}"))
            if balance == "degree":
                metrics.append(
                    F.sum(F.col("degree") * is_c).alias(f"w{c}")
                )
        observed = admitted.select("vid", "cluster", *(
            ["degree"] if balance == "degree" else []
        )).observe(obs, *metrics)
        labels = roll(labels.unionByName(observed.select("vid", "cluster")))
        got = obs.get
        new_counts = {
            c: (
                got[f"nv{c}"] or 0,
                (got[f"w{c}"] if balance == "degree" else got[f"nv{c}"]) or 0,
            )
            for c in headroom
            if got[f"nv{c}"]
        }
        if not new_counts:
            break
        for c, (nv, w) in new_counts.items():
            sizes[c] += w
            labeled_n += nv

    # stragglers → hash over open clusters (or all clusters if none open)
    open_clusters = [int(c) for c in np.flatnonzero(sizes < cap)] or list(range(k))
    rest = (
        vertices(edges)
        .join(labels, "vid", "left_anti")
        .withColumn(
            "cluster",
            F.element_at(
                F.array(*[F.lit(c) for c in open_clusters]),
                (F.pmod(F.xxhash64("vid", F.lit(seed)), F.lit(len(open_clusters))) + 1).cast("int"),
            ).cast("long"),
        )
    )
    # Materialize the final |V|-sized (vid, cluster, degree) table
    # (eager checkpoint, same scale class as the per-round rolls):
    # consumers of the returned placement join typically branch
    # (metrics reads it as mirrors AND loads), and an un-materialized
    # label plan re-executes the straggler anti-join + hash-fill +
    # degree join per branch — measured 16.7 s of re-execution in the
    # metrics phase at sf0.1 (trace in OPTIMIZATION_r06.md). With the
    # degree folded in, the round caches can be released here too.
    lab_deg = roll(
        labels.unionByName(rest.select("vid", "cluster")).join(deg, "vid")
    )
    sym.unpersist()
    deg.unpersist()

    # Phase 2: edge placement by endpoint clusters + degree preference
    ls = lab_deg.select(
        F.col("vid").alias("src"),
        F.col("cluster").alias("c_src"),
        F.col("degree").alias("d_src"),
    )
    ld = lab_deg.select(
        F.col("vid").alias("dst"),
        F.col("cluster").alias("c_dst"),
        F.col("degree").alias("d_dst"),
    )
    return (
        edges.join(ls, "src")
        .join(ld, "dst")
        .select(
            "src",
            "dst",
            F.when(F.col("c_src") == F.col("c_dst"), F.col("c_src"))
            .when(F.col("d_src") <= F.col("d_dst"), F.col("c_src"))
            .otherwise(F.col("c_dst"))
            .alias("partition"),
        )
    )
