"""Driver-facing queries: each returns a DataFrame over the testdata
parquet tables, with a matching DuckDB oracle in
``linkgraph.oracle.sql`` (column names and types aligned for the
driver's order-insensitive value-hash compare).

The canonical graph for graph queries is the deterministic part
co-occurrence graph derived from ``lineitem`` (see
``linkgraph.graph.edges_from_lineitem``). Fixed iteration counts are
used where the algorithm is iterative so Spark and the unrolled SQL
oracle compute the identical deterministic result. Floating-point
outputs are rounded to 6 decimals on both sides (north-rule tolerance
is allclose 1e-6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.graph import (
    adjacency_lists,
    degrees,
    directed_edges_from_lineitem,
    edges_from_adjacency,
    edges_from_events,
    edges_from_lineitem,
    vertices,
    weighted_edges_from_events,
)
from linkgraph.partition.metrics import edge_partition_metrics
from linkgraph.partition.strategies import dbh, grid, hash_edges

# fixed parameters shared with the SQL oracles
K_HASH = 8
K_DBH = 8
K_GRID = 16
PR_ITERS = 5
CC_ITERS = 10
LPA_ITERS = 4


def q_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return edges_from_lineitem(spark, sf_dir)


def q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    return degrees(edges_from_lineitem(spark, sf_dir))


def q_partition_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hash_edges(edges_from_lineitem(spark, sf_dir), K_HASH)


def q_partition_dbh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = edges_from_lineitem(spark, sf_dir)
    return dbh(e, degrees(e), K_DBH)


def q_partition_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return grid(edges_from_lineitem(spark, sf_dir), K_GRID)


def q_partition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication factor / alpha / balance for all three vectorized
    strategies — the reference's metric log line
    (edgePartitioner.cpp:63-84) as a 3-row DataFrame.

    All strategies are stacked into one (strategy, src, dst, partition)
    DataFrame so the whole query is two grouped aggregates (mirrors +
    loads) instead of six per-strategy jobs.
    """
    e = edges_from_lineitem(spark, sf_dir).cache()
    deg = degrees(e)
    assigned = (
        hash_edges(e, K_HASH).withColumn("strategy", F.lit("hash"))
        .unionByName(dbh(e, deg, K_DBH).withColumn("strategy", F.lit("dbh")))
        .unionByName(grid(e, K_GRID).withColumn("strategy", F.lit("grid")))
    )
    k_col = (
        F.when(F.col("strategy") == "hash", F.lit(K_HASH))
        .when(F.col("strategy") == "dbh", F.lit(K_DBH))
        .otherwise(F.lit(K_GRID))
    )
    mir = (
        assigned.select("strategy", F.col("src").alias("vid"), "partition")
        .unionAll(assigned.select("strategy", F.col("dst").alias("vid"), "partition"))
        .distinct()
    )
    rep = mir.groupBy("strategy").agg(
        F.count("*").cast("long").alias("replicas"),
        F.countDistinct("vid").cast("long").alias("n_vertices"),
    )
    loads = assigned.groupBy("strategy", "partition").agg(
        F.count("*").cast("long").alias("cnt")
    )
    stats = loads.groupBy("strategy").agg(
        F.sum("cnt").cast("long").alias("m"),
        F.max("cnt").cast("long").alias("max_edge"),
        F.min("cnt").cast("long").alias("min_edge"),
    )
    return rep.join(stats, "strategy").select(
        "strategy",
        "m",
        "n_vertices",
        "replicas",
        F.round(F.col("replicas") / F.col("n_vertices"), 6).alias(
            "replication_factor"
        ),
        "max_edge",
        "min_edge",
        F.round(F.col("max_edge") * k_col / F.col("m"), 6).alias("alpha"),
    )


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algos.pagerank import pagerank

    e = edges_from_lineitem(spark, sf_dir)
    r = pagerank(e, iterations=PR_ITERS, directed=False)
    return r.select("vid", F.round("rank", 6).alias("rank"))


def _warm_snapshot_path(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Deterministic snapshot location under the session's warehouse
    dir, keyed by dataset — OVERWRITTEN on every run (bounded disk, no
    per-run tempdir leak) and on shared storage in a real deployment
    (the warehouse dir is cluster-visible there, unlike /tmp)."""
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return f"{wh}/lg_warm_snapshots/{tag}_{name}"


def q_pagerank_warm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-resume PageRank: 2 cold supersteps → parquet snapshot
    → resume +(PR_ITERS−2) warm via ``init_ranks``. The composition is
    bit-for-bit the cold PR_ITERS run (the superstep is memoryless
    given the rank vector), so it shares the pagerank SQL oracle —
    the driver-gated evidence for the incremental/warm-restart path."""
    from linkgraph.algos.pagerank import pagerank

    e = edges_from_lineitem(spark, sf_dir)
    cold = pagerank(e, iterations=2, directed=False)
    snap = _warm_snapshot_path(spark, sf_dir, "pr_ranks")
    cold.write.mode("overwrite").parquet(snap)
    warm = pagerank(
        e,
        iterations=PR_ITERS - 2,
        directed=False,
        init_ranks=spark.read.parquet(snap),
    )
    return warm.select("vid", F.round("rank", 6).alias("rank"))


def q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algos.cc import connected_components

    e = edges_from_lineitem(spark, sf_dir)
    return connected_components(e, fixed_iterations=CC_ITERS)


def q_components_warm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-resume CC: 4 cold hash-min rounds → parquet snapshot →
    resume +(CC_ITERS−4) warm via ``init_labels``. Integer min rounds
    compose exactly (warm round r ≡ cold round 4+r), so it shares the
    components SQL oracle."""
    from linkgraph.algos.cc import connected_components

    e = edges_from_lineitem(spark, sf_dir)
    cold = connected_components(e, fixed_iterations=4)
    snap = _warm_snapshot_path(spark, sf_dir, "cc_labels")
    cold.write.mode("overwrite").parquet(snap)
    return connected_components(
        e,
        fixed_iterations=CC_ITERS - 4,
        init_labels=spark.read.parquet(snap),
    )


def q_components_csr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components executed over per-partition CSR blobs (the
    north-star CC execution shape — gather-scatter like
    pagerank_csr_blocks, integer-exact ⇒ identical to the join-based
    result, so it shares the components SQL oracle)."""
    from linkgraph.csr import cc_csr_blocks, prepare_csr_blocks

    e = edges_from_lineitem(spark, sf_dir)
    prepare_csr_blocks(e, k=K_GRID, strategy="grid",
                       blocks_table="q_csr_blocks_cc")
    return cc_csr_blocks(e, K_GRID, "q_csr_blocks_cc",
                         fixed_iterations=CC_ITERS)


def q_label_propagation_csr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label propagation over per-partition CSR blobs (partial counts
    in the block UDF, global sum + deterministic argmax) — identical
    to the join-based result, shares the label_propagation oracle."""
    from linkgraph.csr import lpa_csr_blocks, prepare_csr_blocks

    e = edges_from_lineitem(spark, sf_dir)
    prepare_csr_blocks(e, k=K_GRID, strategy="grid",
                       blocks_table="q_csr_blocks_lpa")
    return lpa_csr_blocks(e, K_GRID, "q_csr_blocks_lpa",
                          iterations=LPA_ITERS)


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algos.lpa import label_propagation

    e = edges_from_lineitem(spark, sf_dir)
    return label_propagation(e, iterations=LPA_ITERS)


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algos.triangles import triangle_counts

    e = edges_from_lineitem(spark, sf_dir)
    return triangle_counts(e, degree_oriented=True)


def q_triangle_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algos.triangles import triangle_total

    e = edges_from_lineitem(spark, sf_dir)
    return triangle_total(e, degree_oriented=True)


def q_partition_hdrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDRF exact mode (deterministic engine-portable stream order) —
    hash-checked against a literal-VALUES DuckDB oracle generated by
    the pure-Python HDRF oracle (linkgraph/oracle/literal.py;
    exactness also pinned in tests/test_hdrf.py)."""
    from linkgraph.partition.hdrf import hdrf_spark

    return hdrf_spark(edges_from_lineitem(spark, sf_dir), K_HASH, exact=True)


def q_partition_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PowerGraph-greedy vertex-cut (reference algorithms/greedy/
    greedy.cpp:17-91), exact mode — literal-VALUES oracle like HDRF."""
    from linkgraph.partition.hdrf import hdrf_spark

    return hdrf_spark(edges_from_lineitem(spark, sf_dir), K_HASH, exact=True, mode="greedy")


def q_partition_ldg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LDG streaming vertex partitioner (reference algorithms/ldg/
    ldg.cpp:80-114), exact seeded mode — literal-VALUES oracle."""
    from linkgraph.partition.vertex import vertex_partition_spark

    return vertex_partition_spark(edges_from_lineitem(spark, sf_dir), K_HASH, mode="ldg")


def q_partition_fennel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fennel streaming vertex partitioner (fennel.cpp:91-133,
    paper-correct eligibility), exact seeded mode — literal-VALUES
    oracle."""
    from linkgraph.partition.vertex import vertex_partition_spark

    return vertex_partition_spark(edges_from_lineitem(spark, sf_dir), K_HASH, mode="fennel")


def q_partition_hdrf_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDRF chunked-streaming mode at the engine default C
    (DEFAULT_NUM_CHUNKS) — the SCALE path production runs (the exact
    mode above is a single sequential group). Hash-checked against the
    same pure-Python chunked replay that pins the offstream oracles,
    run at the default configuration — closing the "gate tests exact,
    production runs chunked" gap."""
    from linkgraph.partition.hdrf import hdrf_spark

    return hdrf_spark(edges_from_lineitem(spark, sf_dir), K_HASH, exact=False)


def q_partition_ldg_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LDG chunked-streaming mode (vertex_partition_chunked defaults)
    — the vertex-partitioning scale path, driver-gated against a
    pure-Python replay of the chunk/task/order keys + the same scorer
    the Spark task groups execute (numerics independently anchored by
    the hand-computed LDG trace in tests/test_vertex_partition.py)."""
    from linkgraph.partition.vertex import vertex_partition_chunked

    return vertex_partition_chunked(
        edges_from_lineitem(spark, sf_dir), K_HASH, mode="ldg"
    )


def q_partition_fennel_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fennel chunked-streaming mode — same machinery and replay
    oracle as partition_ldg_chunked with the Fennel scorer (numerics
    anchored by the hand-computed Fennel trace)."""
    from linkgraph.partition.vertex import vertex_partition_chunked

    return vertex_partition_chunked(
        edges_from_lineitem(spark, sf_dir), K_HASH, mode="fennel"
    )


def q_partition_ne_coarse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NE-coarse (distributed neighbor expansion — the reference's
    flagship ne.cpp:90-198, coarsened to synchronous capacity-bounded
    label expansion). Hash-checked against a literal oracle built by a
    pure-Python replay of the whole expansion (every stage is
    deterministic — seeding order, argmax adoption, capacity windows,
    xxhash64 straggler placement). Quality (RF beats chunked HDRF on
    community-structured graphs) is pinned in tests/test_ne.py."""
    from linkgraph.partition.ne import ne_coarse

    return ne_coarse(edges_from_lineitem(spark, sf_dir), K_HASH)


def q_partition_offstream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offstream hybrid (offline chunked prefix + one streamed suffix
    pass against frozen state — reference offstreamNH.cpp:82-182).
    Hash-checked against a literal oracle built by a pure-Python
    replay of the chunked machinery (bit-exact xxhash64 keys +
    the same sequential scorer; DEFAULT_CHUNK_TASKS pins the task
    grouping so output is environment-independent). Frozen-prefix /
    completeness invariants also in tests/test_hdrf.py."""
    from linkgraph.partition.hdrf import offstream_spark

    return offstream_spark(edges_from_lineitem(spark, sf_dir), K_HASH)


def q_partition_offstream_ne(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offstream with the NE-coarse offline phase — the reference's
    actual offstreamNW pairing (offstreamNW.cpp: NE partitions the
    offline prefix, the HDRF scorer streams the suffix against the
    frozen state). Hash-checked against a composed replay: the NE
    replay over the prefix edges + the chunked replay's single-pass
    suffix seeded from the prefix assignment."""
    from linkgraph.partition.hdrf import offstream_spark

    return offstream_spark(
        edges_from_lineitem(spark, sf_dir), K_HASH, offline="ne_coarse"
    )


def q_partition_offstream_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offstream with a PowerGraph-greedy streamed suffix — the
    reference's offstreamNG pairing (offstreamNG.cpp:168-205:
    intersection → union → least-loaded rules against the frozen
    offline state). Same replay-literal oracle machinery as
    partition_offstream, mode='greedy'."""
    from linkgraph.partition.hdrf import offstream_spark

    return offstream_spark(edges_from_lineitem(spark, sf_dir), K_HASH, mode="greedy")


def q_partition_offstream_defer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offstream with the offstreamNWG defer-greedy streamed suffix
    (offstreamNWG.cpp:244-330: greedy rules, but both-endpoints-fresh
    edges are buffered per vertex and cascade-released once an endpoint
    gains a placement; leftovers drain greedily at stream end).
    Hash-checked against a pure-Python replay oracle sharing the same
    core (linkgraph/oracle/literal.py::_offstream_defer_assignment)."""
    from linkgraph.partition.adwise import offstream_defer_spark

    return offstream_defer_spark(edges_from_lineitem(spark, sf_dir), K_HASH)


def q_partition_offstream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offstream with the ADWISE bounded-window streaming phase
    (reference offstreamNA.cpp:155-169/343-405, WINDOW_SIZE=200 at
    base_graph.hpp:25): the suffix pass buffers a 200-edge window and
    assigns the window-best (edge, partition) by the three-term
    λ·lb + rf + cs score each step. Hash-checked against a pure-Python
    replay oracle sharing the same window core
    (linkgraph/oracle/literal.py::_offstream_window_assignment)."""
    from linkgraph.partition.adwise import offstream_window_spark

    return offstream_window_spark(edges_from_lineitem(spark, sf_dir), K_HASH)


def q_vertex_cut_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-cut rate + vertex balance (vertexPartitioner.cpp:34-51)
    for LDG and Fennel — checked against the Python-oracle-derived
    literal (linkgraph/oracle/literal.py)."""
    from linkgraph.partition.metrics import vertex_partition_metrics
    from linkgraph.partition.vertex import vertex_partition_spark

    e = edges_from_lineitem(spark, sf_dir).cache()
    out = None
    for mode in ("ldg", "fennel"):
        vp = vertex_partition_spark(e, K_HASH, mode=mode)
        row = vertex_partition_metrics(e, vp, K_HASH).withColumn(
            "strategy", F.lit(mode)
        )
        out = row if out is None else out.unionByName(row)
    return out.select("strategy", "m", "edge_cut", "edge_cut_rate", "n",
                      "max_vertex", "load_balance")


def q_vertex_masters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertex-master table over the hash assignment (S9 sink plan:
    the reference's commented-out save_vertex writer re-expressed as a
    real table — see linkgraph.partition.metrics.vertex_masters)."""
    from linkgraph.partition.metrics import vertex_masters

    return vertex_masters(hash_edges(edges_from_lineitem(spark, sf_dir), K_HASH))


def q_edges_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-interaction edge graph from the events table (second graph
    source — see linkgraph.graph.edges_from_events)."""
    return edges_from_events(spark, sf_dir)


def q_events_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components on the interaction graph (fixed rounds,
    SQL-oracle-matched) — proves the analytics run unchanged on any
    edge source."""
    from linkgraph.algos.cc import connected_components

    return connected_components(edges_from_events(spark, sf_dir), fixed_iterations=6)


def q_edges_adjacency_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 adjacency-list→edge-list converter (reference
    conversions.cpp:77-126): the canonical graph serialized to
    adjacency text lines and converted back — must reproduce the edge
    table exactly (oracle: the edges derivation SQL)."""
    e = edges_from_lineitem(spark, sf_dir)
    return edges_from_adjacency(adjacency_lists(e))


def q_degree_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 vertices by degree (deterministic tie-break by vid) —
    the skew report / window-function surface (SURVEY.md §2.3).

    Scale shape: ``orderBy().limit(20)`` compiles to TakeOrderedAndProject
    (per-partition top-20 + driver-side merge of 20-row heaps — no
    single-task sort of the full degree table); only the 20 surviving
    rows go through the unpartitioned ranking window."""
    from pyspark.sql import Window

    deg = degrees(edges_from_lineitem(spark, sf_dir))
    top = deg.orderBy(F.desc("degree"), F.asc("vid")).limit(20)
    w = Window.orderBy(F.desc("degree"), F.asc("vid"))
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("long"))
        .select("vid", "degree", "rnk")
    )


def q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type over the events table —
    the batch twin of linkgraph.streaming.windowed_counts_stream
    (identical semantics; date_trunc for oracle parity)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "event_type",
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per user, a new session starts after a >30 min
    gap (lag + running sum of gap flags — SURVEY.md §2.3 window
    surface). Output: per-user session count + longest session in
    events."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        (
            F.col("ts").cast("timestamp").cast("long")
            - F.lag(F.col("ts").cast("timestamp").cast("long"), 1, 0).over(w)
            > 1800
        ).cast("int"),
    )
    sess = flagged.withColumn(
        "session_id", F.sum("new_session").over(w)
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events")
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.max("n_events").cast("long").alias("max_session_events"),
    )


def q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=65, fixed 8 peel rounds — converged at
    both gate scales; unrolled-CTE DuckDB oracle)."""
    from linkgraph.algos.kcore import k_core

    return k_core(edges_from_lineitem(spark, sf_dir), k=65, fixed_iterations=8)


def q_k_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-truss edges (k=10, fixed 10 peel rounds — past the measured
    peel depth at both gate scales; unrolled-CTE oracle)."""
    from linkgraph.algos.truss import k_truss

    return k_truss(edges_from_lineitem(spark, sf_dir), k=10, fixed_rounds=10)


def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction: top-20 non-adjacent pairs by
    common-neighbor score (hub centers degree-capped — the wedge
    blowup guard)."""
    from linkgraph.algos.linkpred import adamic_adar_topk

    return adamic_adar_topk(edges_from_lineitem(spark, sf_dir), top=20)


def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-binned degree distribution — the power-law shape check run
    before choosing partitioner/salting parameters. Two aggregates
    (degree count + bin histogram), no joins."""
    deg = degrees(edges_from_lineitem(spark, sf_dir))
    return (
        deg.select(
            F.floor(F.log2("degree")).cast("long").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("n_vertices"))
    )


def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity: Pearson correlation of endpoint degrees
    over the symmetric dart list (one row). Negative on hub-leaf
    (disassortative) graphs — the skew early-warning a partitioning
    pipeline logs. Two degree joins + one corr aggregate."""
    from linkgraph.graph import symmetrize

    e = edges_from_lineitem(spark, sf_dir)
    deg = degrees(e)
    sym = symmetrize(e)
    ds = deg.select(F.col("vid").alias("src"), F.col("degree").alias("d_src"))
    dd = deg.select(F.col("vid").alias("dst"), F.col("degree").alias("d_dst"))
    # corr spelled as covar/(sd*sd) with try_divide: Spark's corr
    # throws DIVIDE_BY_ZERO under ANSI mode on zero-variance degree
    # sequences (e.g. a clique); DuckDB's corr returns NULL — this
    # matches the NULL.
    return (
        sym.join(ds, "src")
        .join(dd, "dst")
        .agg(
            F.round(
                F.try_divide(
                    F.covar_samp("d_src", "d_dst"),
                    F.stddev_samp("d_src") * F.stddev_samp("d_dst"),
                ),
                6,
            ).alias("assortativity"),
            F.count("*").cast("long").alias("n_darts"),
        )
    )


def q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded random-walk sampling (4 steps, one walk per vertex) —
    deterministic md5 neighbor choice, unrolled-CTE DuckDB oracle."""
    from linkgraph.algos.walks import random_walks

    return random_walks(edges_from_lineitem(spark, sf_dir), walk_len=4)


def q_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS from vertices {1, 2} (8 fixed rounds — well
    past the co-occurrence graph's tiny diameter; unrolled-CTE
    oracle)."""
    from linkgraph.algos.bfs import bfs_distances

    return bfs_distances(
        edges_from_lineitem(spark, sf_dir), sources=[1, 2], fixed_iterations=8
    )


def q_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark-estimated harmonic centrality (Σ 1/d from 4 fixed
    landmarks; batched keyed BFS, 8 rounds — unrolled-CTE oracle)."""
    from linkgraph.algos.bfs import harmonic_centrality

    return harmonic_centrality(
        edges_from_lineitem(spark, sf_dir),
        landmarks=[1, 2, 3, 5],
        fixed_iterations=8,
    )


def q_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted multi-source shortest paths (Bellman-Ford min-plus,
    sources {0,1}, fixed 8 rounds) over the weighted interaction
    graph; integer costs — exact unrolled-CTE oracle."""
    from linkgraph.algos.sssp import sssp_weighted

    return sssp_weighted(
        weighted_edges_from_events(spark, sf_dir), sources=[0, 1],
        fixed_iterations=8,
    )


def q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark-sampled betweenness (Brandes pivots {1,2,3,5}, depth
    5 both phases — past the measured landmark eccentricity (3) at
    both gate scales; unrolled-CTE oracle)."""
    from linkgraph.algos.betweenness import betweenness_landmark

    return betweenness_landmark(
        edges_from_lineitem(spark, sf_dir), landmarks=[1, 2, 3, 5], depth=5
    )


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the directed order-sequence graph
    (5 L1-normalized iterations; unrolled-CTE oracle)."""
    from linkgraph.algos.hits import hits

    r = hits(directed_edges_from_lineitem(spark, sf_dir), iterations=PR_ITERS)
    return r.select(
        "vid", F.round("auth", 6).alias("auth"), F.round("hub", 6).alias("hub")
    )


def q_dense_vertex_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed deterministic dense numbering (vid → sorted rank);
    the Spark side runs the range-partition + offset enumeration (no
    global window), the oracle is the logical row_number definition —
    the gate proves the distributed path computes the logical rank."""
    from linkgraph.graph import dense_vertex_ids

    return dense_vertex_ids(edges_from_lineitem(spark, sf_dir))


def q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-driven negative edge sampling (3 negatives from 8
    proposals per vertex) over the dense-id mapping."""
    from linkgraph.algos.linkpred import negative_samples

    return negative_samples(edges_from_lineitem(spark, sf_dir))


def q_clustering_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex local clustering coefficient over the co-occurrence
    graph (degree-oriented triangle enumeration + degree join)."""
    from linkgraph.algos.clustering import clustering_coefficients

    return clustering_coefficients(edges_from_lineitem(spark, sf_dir))


def q_edges_events_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted interaction edge list (co-action pair counts)."""
    return weighted_edges_from_events(spark, sf_dir)


def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-weighted PageRank over the events interaction graph."""
    from linkgraph.algos.pagerank import pagerank_weighted

    r = pagerank_weighted(
        weighted_edges_from_events(spark, sf_dir), iterations=PR_ITERS
    )
    return r.select("vid", F.round("rank", 6).alias("rank"))


def q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components of the directed order-sequence
    graph (bowtie-shaped: giant core + singleton periphery) —
    distributed min-label coloring, gated against an independent
    pure-Python Tarjan literal oracle."""
    from linkgraph.algos.scc import strongly_connected_components

    return strongly_connected_components(
        directed_edges_from_lineitem(spark, sf_dir)
    )


def q_node2vec_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order biased (node2vec-style) walks over the
    co-occurrence graph, derandomized via lottery-ticket hashing."""
    from linkgraph.algos.walks import node2vec_walks

    return node2vec_walks(edges_from_lineitem(spark, sf_dir), walk_len=3)


def q_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from seed vertices {1, 2} over the
    co-occurrence graph (seed-expansion ranking)."""
    from linkgraph.algos.pagerank import pagerank_personalized

    r = pagerank_personalized(
        edges_from_lineitem(spark, sf_dir), seeds=[1, 2], iterations=PR_ITERS
    )
    return r.select("vid", F.round("rank", 6).alias("rank"))


def q_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard common-neighbor link prediction (top 20 non-adjacent
    pairs) over the co-occurrence graph."""
    from linkgraph.algos.linkpred import jaccard_topk

    return jaccard_topk(edges_from_lineitem(spark, sf_dir), top=20)


def q_graph_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row graph census — the metrics log line every run starts
    with: vertex/edge counts, degree extremes, mean degree."""
    e = edges_from_lineitem(spark, sf_dir)
    deg = degrees(e)
    m = e.count()
    return deg.agg(
        F.count("*").cast("long").alias("n_vertices"),
        F.lit(m).cast("long").alias("m_edges"),
        F.max("degree").cast("long").alias("max_degree"),
        F.min("degree").cast("long").alias("min_degree"),
        F.round(F.avg("degree"), 6).alias("avg_degree"),
    )


def q_vertex_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted degree (strength) table over the weighted interaction
    graph — degree + Σ incident weight per vertex, the weighted twin
    of ``degrees`` (one partial-aggregated groupBy over the
    symmetrized weighted edges)."""
    we = weighted_edges_from_events(spark, sf_dir)
    sym = we.unionByName(
        we.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    return sym.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").cast("long").alias("degree"),
        F.sum("weight").cast("long").alias("strength"),
    )


def q_label_propagation_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted LPA over the events interaction graph (votes weighted
    by co-action counts)."""
    from linkgraph.algos.lpa import label_propagation_weighted

    return label_propagation_weighted(
        weighted_edges_from_events(spark, sf_dir), iterations=LPA_ITERS
    )


def q_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor / resource-allocation / preferential-attachment
    link-prediction scores (top 20 non-adjacent pairs by CN) over the
    co-occurrence graph — one wedge pass yields all three."""
    from linkgraph.algos.linkpred import common_neighbor_scores

    return common_neighbor_scores(edges_from_lineitem(spark, sf_dir), top=20)


def q_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximal independent set (static md5 priorities, fixed 16
    local-min rounds — measured convergence 4/8 rounds at the two gate
    scales, doubled headroom for the density trend since the engine
    raises on exhaustion; converged rounds cost nothing, the loop
    short-circuits once the active set empties; unrolled-CTE
    oracle)."""
    from linkgraph.algos.mis import maximal_independent_set

    return maximal_independent_set(
        edges_from_lineitem(spark, sf_dir), fixed_iterations=16
    )


def q_coloring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 12 rounds of local-min (Jones-Plassmann) coloring — on
    this near-clique co-occurrence graph that is a partial coloring
    (local-min coloring is for sparse graphs); the gate value-checks
    the 12 kernel rounds exactly against the unrolled oracle."""
    from linkgraph.algos.mis import greedy_coloring

    return greedy_coloring(
        edges_from_lineitem(spark, sf_dir), fixed_iterations=12,
        allow_partial=True,
    )


def q_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocity census of the directed order-sequence graph (the
    bowtie diagnostic for the SCC substrate)."""
    from linkgraph.algos.projection import reciprocity
    from linkgraph.graph import directed_edges_from_lineitem

    return reciprocity(directed_edges_from_lineitem(spark, sf_dir))


def q_co_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer co-purchase graph via hub-capped bipartite projection
    (cap 40 — binding at sf0.01 where max part fan-out is 49), top 200
    pairs by (weight desc, u, w)."""
    from pyspark.sql import functions as F

    from linkgraph.algos.projection import co_purchase_edges

    return (
        co_purchase_edges(spark, sf_dir, hub_cap=40)
        .orderBy(F.desc("weight"), "u", "w")
        .limit(200)
    )


def q_feature_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One message-passing layer of quantized-embedding aggregation
    over the co-occurrence graph (embeddings table joined on
    vid = vec_id; integer-exact, so fully value-hashed)."""
    from linkgraph.algos.features import feature_propagation
    from linkgraph.graph import load_table

    feats = load_table(spark, sf_dir, "embeddings")
    return feature_propagation(edges_from_lineitem(spark, sf_dir), feats)


def q_distance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark-sampled distance distribution / effective-diameter
    estimator (landmarks {1,2,3,5}, 8 fixed BFS rounds — shares the
    harmonic-centrality unrolled oracle chain)."""
    from linkgraph.algos.bfs import distance_histogram

    return distance_histogram(
        edges_from_lineitem(spark, sf_dir), landmarks=[1, 2, 3, 5],
        fixed_iterations=8,
    )


def q_nation_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical (Newman) assortativity of the co-purchase graph by
    customer nation — do customers co-buy within their nation? Integer
    dart counts until one final division (cross-engine exact)."""
    from linkgraph.algos.projection import (
        attribute_assortativity,
        co_purchase_edges,
    )
    from linkgraph.graph import load_table

    cpe = co_purchase_edges(spark, sf_dir, hub_cap=40).select("u", "w")
    attrs = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("vid"), F.col("c_nationkey").alias("cls")
    )
    return attribute_assortativity(
        cpe.select(F.col("u").alias("src"), F.col("w").alias("dst")), attrs
    )


def q_subgraph_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-sampled induced subgraph (m=4 → ~1/16 edge
    retention) of the co-occurrence graph — the graph-minibatch /
    debug-at-scale sampler."""
    from linkgraph.algos.projection import induced_subgraph

    return induced_subgraph(edges_from_lineitem(spark, sf_dir), m=4)


def q_two_hop_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-vertex 2-hop neighborhood sizes (wedge centers capped
    at 10000 — non-binding at gate scale, the guard that bounds the
    fan-out at 100 TB)."""
    from linkgraph.algos.projection import two_hop_sizes

    return two_hop_sizes(edges_from_lineitem(spark, sf_dir))


def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the LPA community assignment (LPA_ITERS
    rounds) over the co-occurrence graph — integer dart tallies until
    one final division; oracle = the LPA unrolled chain + the same
    tallies."""
    from linkgraph.algos.lpa import label_propagation
    from linkgraph.algos.projection import modularity

    e = edges_from_lineitem(spark, sf_dir)
    return modularity(e, label_propagation(e, iterations=LPA_ITERS))


def q_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global transitivity (closed-wedge fraction, 3T/wedges) — the
    one-row census twin of clustering_coefficients; integer triangle
    and wedge counts, one final division."""
    from linkgraph.algos.triangles import transitivity

    return transitivity(edges_from_lineitem(spark, sf_dir))


def q_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-size distribution (size → how many components) from
    the CC_ITERS-round hash-min labeling — the fragmentation
    histogram a crawl-graph run logs next to the degree histogram."""
    from linkgraph.algos.cc import connected_components

    e = edges_from_lineitem(spark, sf_dir)
    comp = connected_components(e, fixed_iterations=CC_ITERS)
    sizes = comp.groupBy("component").agg(
        F.count("*").cast("long").alias("size")
    )
    return sizes.groupBy("size").agg(
        F.count("*").cast("long").alias("n_components")
    )


def q_eccentricity_lb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex eccentricity lower bound (max distance over the
    {1,2,3,5} landmark set, 8 fixed BFS rounds — shares the
    harmonic-centrality unrolled oracle chain)."""
    from linkgraph.algos.bfs import eccentricity_lb

    return eccentricity_lb(
        edges_from_lineitem(spark, sf_dir), landmarks=[1, 2, 3, 5],
        fixed_iterations=8,
    )


def q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient curve φ(k) over the co-occurrence graph
    — integer suffix-summed histograms, one division per row."""
    from linkgraph.algos.projection import rich_club

    return rich_club(edges_from_lineitem(spark, sf_dir))


def q_avg_neighbor_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-correlation curve k_nn(k) (dart-weighted mean neighbor
    degree per degree value) — integer sums until one division."""
    from linkgraph.algos.projection import avg_neighbor_degree

    return avg_neighbor_degree(edges_from_lineitem(spark, sf_dir))


def q_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous power-law MLE exponent of the degree distribution
    (α = 1 + n/Σ ln d, d_min = 1) — the one-number heavy-tail gauge
    that predicts partitioner skew. Summed over the degree HISTOGRAM
    (cnt·ln d per distinct degree — a few hundred float terms, stable
    at 6dp), not per vertex."""
    e = edges_from_lineitem(spark, sf_dir)
    hist = degrees(e).groupBy("degree").agg(
        F.count("*").cast("long").alias("cnt")
    )
    return hist.agg(
        F.sum("cnt").cast("long").alias("n_vertices"),
        F.round(
            F.lit(1.0)
            + F.try_divide(
                F.sum("cnt"),
                F.sum(F.col("cnt") * F.log(F.col("degree").cast("double"))),
            ),
            6,
        ).alias("alpha"),
    )


DEGREE_QUANTILES = (25, 50, 75, 90, 99)


def q_degree_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank degree percentiles (p25/50/75/90/99) — the
    numbers that size `spark.sql.shuffle.partitions` and the salting
    threshold before a big run. Computed from the degree HISTOGRAM
    with a cumulative sum, so the single-task ordered window runs over
    a few hundred distinct-degree rows, never over vertices; the
    quantile rank uses pure integer arithmetic
    (ceil(q·n/100) = (q·n+99) div 100) so the oracle matches bit-wise."""
    deg = degrees(edges_from_lineitem(spark, sf_dir))
    hist = deg.groupBy("degree").agg(F.count("*").cast("long").alias("cnt"))
    from pyspark.sql import Window

    w = Window.orderBy("degree").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "degree",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy("degree").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    qs = spark.createDataFrame([(q,) for q in DEGREE_QUANTILES], "q long")
    return (
        qs.crossJoin(cum)
        .where(F.col("cum") >= F.expr("(q * n + 99) div 100"))
        .groupBy("q")
        .agg(F.min("degree").cast("long").alias("degree"))
    )


def q_butterflies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite butterfly census over the hub-capped co-purchase
    projection (customer×part): Σ C(weight, 2) — see
    linkgraph.algos.projection.butterflies."""
    from linkgraph.algos.projection import butterflies, co_purchase_edges

    return butterflies(co_purchase_edges(spark, sf_dir, hub_cap=40))


TOPO_DEPTH = 6


def q_topo_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded longest-path layering of the canonical (src<dst) DAG
    orientation — dependency depth per vertex, TOPO_DEPTH rounds of
    frontier-delta edge relaxation."""
    from linkgraph.algos.dag import topo_levels

    return topo_levels(edges_from_lineitem(spark, sf_dir), max_depth=TOPO_DEPTH)


def q_triangle_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOULION-style sampled triangle estimate + exact audit — see
    linkgraph.algos.triangles.triangle_estimate."""
    from linkgraph.algos.triangles import triangle_estimate

    return triangle_estimate(edges_from_lineitem(spark, sf_dir))
