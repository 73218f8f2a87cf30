"""Vectorized edge-partitioning strategies (vertex-cut).

Each strategy takes ``edges(src, dst)`` and returns
``edges(src, dst, partition)`` with ``partition ∈ [0, k)`` and every
input edge assigned exactly once — the reference's completeness
invariant ``CHECK_EQ(assigned_edges, num_edges)``
(/root/reference/partitioner/edgePartitioner.cpp:50).

All strategies here are pure column expressions — no shuffle, no UDF;
they vectorize inside whole-stage codegen and scale linearly with the
edge count. The sequential/stateful HDRF strategy lives in
``linkgraph.partition.hdrf``.

``hasher``: the reference uses *raw modulo* on vertex ids
(dbh.cpp:83-94 ``w % k``; rand.cpp:15 ``idx % k``). We default to raw
modulo for metric parity with the reference, and expose
``hasher="xxhash64"`` as the production option — at web scale raw
modulo of structured ids (e.g. sequential file ids) aliases badly,
xxhash64 decorrelates.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EDGE_MIX_PRIME = 131071  # 2^17-1; deterministic edge mixing for "hash" mode


def _h(col: Column, hasher: str) -> Column:
    if hasher == "modulo":
        return col
    if hasher == "xxhash64":
        return F.abs(F.xxhash64(col))
    raise ValueError(f"unknown hasher {hasher!r}")


def hash_edges(edges: DataFrame, k: int, hasher: str = "modulo") -> DataFrame:
    """Hash edge partitioning — the stateless baseline (semantics of the
    reference's ``rand`` round-robin, /root/reference/algorithms/rand/rand.cpp:4-28,
    made order-independent by hashing the edge key instead of its stream
    index)."""
    if hasher == "modulo":
        key = F.col("src") * F.lit(_EDGE_MIX_PRIME) + F.col("dst")
    else:
        key = F.abs(F.xxhash64("src", "dst"))
    return edges.withColumn("partition", F.pmod(key, F.lit(k)).cast("long"))


def round_robin(edges: DataFrame, k: int) -> DataFrame:
    """Exact reference ``rand`` semantics: partition = edge stream index
    % k (rand.cpp:15). Order-dependent by definition; uses a global
    row_number (single-pass window) — fine for parity tests, prefer
    ``hash_edges`` at scale (a global ordering is a serial bottleneck)."""
    from pyspark.sql import Window

    w = Window.orderBy("src", "dst")
    return edges.withColumn(
        "partition", F.pmod(F.row_number().over(w) - 1, F.lit(k)).cast("long")
    )


def dbh(
    edges: DataFrame, deg: DataFrame, k: int, hasher: str = "modulo"
) -> DataFrame:
    """Degree-Based Hashing (reference /root/reference/algorithms/dbh/dbh.cpp:75-96):
    assign each edge by its *lower-degree* endpoint
    (``w = degrees[u] <= degrees[v] ? u : v``; tie → u), partition =
    w % k. Cuts high-degree vertices, replicating hubs instead of
    leaves — strictly better RF than hash on power-law graphs.

    Implementation: two joins against the degree table. The degree
    table is |V| rows (≪ |E|); we broadcast it so the |E|-sized side
    never shuffles. At 10^12 edges / 10^9+ vertices where the degree
    table exceeds broadcast size, precompute deg_src/deg_dst as columns
    at extraction time, or let AQE pick a shuffled hash join — the
    expression is unchanged.
    """
    ds = F.broadcast(deg.select(F.col("vid"), F.col("degree").alias("deg_src")))
    dd = F.broadcast(deg.select(F.col("vid"), F.col("degree").alias("deg_dst")))
    w = F.when(F.col("deg_src") <= F.col("deg_dst"), F.col("src")).otherwise(
        F.col("dst")
    )
    return (
        edges.join(ds, edges["src"] == ds["vid"])
        .drop("vid")
        .join(dd, edges["dst"] == dd["vid"])
        .drop("vid")
        .withColumn("partition", F.pmod(_h(w, hasher), F.lit(k)).cast("long"))
        .select("src", "dst", "partition")
    )


def grid(edges: DataFrame, k: int, hasher: str = "modulo") -> DataFrame:
    """2D-grid edge partitioning (GraphBuilder/PowerGraph "grid"
    constrained vertex-cut; absent from the reference, mandated by the
    north star — SURVEY.md §2.2 P22). Arrange partitions in a
    √k × √k grid; src hashes to the row, dst to the column; the edge
    goes to cell (h(src) mod √k, h(dst) mod √k). Every vertex is
    confined to one row + one column → replication factor ≤ 2√k − 1.

    Pure column expression, no shuffle. ``k`` must be a perfect square.
    """
    sqrt_k = math.isqrt(k)
    if sqrt_k * sqrt_k != k:
        raise ValueError(f"grid partitioning needs a perfect-square k, got {k}")
    pr = F.pmod(_h(F.col("src"), hasher), F.lit(sqrt_k))
    pc = F.pmod(_h(F.col("dst"), hasher), F.lit(sqrt_k))
    return edges.withColumn(
        "partition", (pr * F.lit(sqrt_k) + pc).cast("long")
    )


def partition_edges(
    edges: DataFrame,
    strategy: str,
    k: int,
    deg: DataFrame | None = None,
    hasher: str = "modulo",
) -> DataFrame:
    """Dispatch by strategy name — the engine analog of the reference's
    if/else dispatcher (/root/reference/baseGraph/base_graph.cpp:216-330)."""
    if strategy == "hash":
        return hash_edges(edges, k, hasher)
    if strategy == "round_robin":
        return round_robin(edges, k)
    if strategy == "dbh":
        if deg is None:
            from linkgraph.graph import degrees as _degrees

            deg = _degrees(edges)
        return dbh(edges, deg, k, hasher)
    if strategy == "grid":
        return grid(edges, k, hasher)
    if strategy == "hdrf":
        from linkgraph.partition.hdrf import hdrf_spark

        return hdrf_spark(edges, k)
    if strategy == "hdrf_chunked":
        from linkgraph.partition.hdrf import hdrf_spark

        return hdrf_spark(edges, k, exact=False)
    if strategy == "greedy":
        from linkgraph.partition.hdrf import hdrf_spark

        return hdrf_spark(edges, k, mode="greedy")
    if strategy == "greedy_chunked":
        from linkgraph.partition.hdrf import hdrf_spark

        return hdrf_spark(edges, k, exact=False, mode="greedy")
    if strategy == "offstream":
        from linkgraph.partition.hdrf import offstream_spark

        return offstream_spark(edges, k)
    if strategy == "ne_coarse":
        from linkgraph.partition.ne import ne_coarse

        return ne_coarse(edges, k)
    if strategy == "offstream_greedy":
        from linkgraph.partition.hdrf import offstream_spark

        return offstream_spark(edges, k, mode="greedy")
    if strategy == "offstream_window":
        from linkgraph.partition.adwise import offstream_window_spark

        return offstream_window_spark(edges, k)
    raise ValueError(f"unknown strategy {strategy!r}")
