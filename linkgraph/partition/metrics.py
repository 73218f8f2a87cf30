"""Partition-quality metrics — exact reproductions of the reference's
definitions.

- Replication factor = Σ_v |partitions containing v| / |vertices with ≥1
  edge| (/root/reference/partitioner/edgePartitioner.cpp:30-37).
- Alpha (edge balance) = max_edges_per_partition · k / m
  (/root/reference/partitioner/edgePartitioner.cpp:40-46).
- Edge-cut rate / vertex load balance for vertex partitioning
  (/root/reference/partitioner/vertexPartitioner.cpp:34-51).

Everything is two hash aggregates over the assignment table — the Spark
mapping of the reference's ``is_mirrors`` bitsets and ``occupied[]``
counters. At 100 TB this is a single shuffle on (vid) resp. (partition),
both map-side-combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mirrors(edges_partitioned: DataFrame) -> DataFrame:
    """Distinct (vid, partition) pairs — the reference's per-vertex
    mirror bitsets (edgePartitioner.hpp:44-47) as a DataFrame."""
    return (
        edges_partitioned.select(F.col("src").alias("vid"), "partition")
        .unionAll(edges_partitioned.select(F.col("dst").alias("vid"), "partition"))
        .distinct()
    )


def edge_partition_metrics(edges_partitioned: DataFrame, k: int) -> DataFrame:
    """One-row DataFrame of vertex-cut quality metrics.

    Columns: m, n_vertices, replicas, replication_factor, max_edge,
    min_edge, alpha — definitions at edgePartitioner.cpp:30-46,63-84.
    """
    mir = mirrors(edges_partitioned)
    rep = mir.agg(
        F.count("*").cast("long").alias("replicas"),
        F.countDistinct("vid").cast("long").alias("n_vertices"),
    )
    loads = edges_partitioned.groupBy("partition").agg(
        F.count("*").cast("long").alias("cnt")
    )
    load_stats = loads.agg(
        F.sum("cnt").cast("long").alias("m"),
        F.max("cnt").cast("long").alias("max_edge"),
        F.min("cnt").cast("long").alias("min_edge"),
    )
    return (
        rep.crossJoin(load_stats)
        .select(
            "m",
            "n_vertices",
            "replicas",
            F.round(F.col("replicas") / F.col("n_vertices"), 6).alias(
                "replication_factor"
            ),
            "max_edge",
            "min_edge",
            F.round(F.col("max_edge") * F.lit(k) / F.col("m"), 6).alias("alpha"),
        )
    )


def vertex_partition_metrics(
    edges: DataFrame, vertex_partition: DataFrame, k: int
) -> DataFrame:
    """Edge-cut metrics for vertex partitioning (edge-cut model):
    edge_cut = #edges with endpoints in different partitions; rate =
    cut/m; load_balance = max_vertices_per_partition · k / n
    (vertexPartitioner.cpp:34-51)."""
    ps = vertex_partition.select(
        F.col("vid").alias("src"), F.col("partition").alias("p_src")
    )
    pd_ = vertex_partition.select(
        F.col("vid").alias("dst"), F.col("partition").alias("p_dst")
    )
    joined = edges.join(ps, "src").join(pd_, "dst")
    cut = joined.agg(
        F.count("*").cast("long").alias("m"),
        F.sum((F.col("p_src") != F.col("p_dst")).cast("long"))
        .cast("long")
        .alias("edge_cut"),
    )
    vloads = vertex_partition.groupBy("partition").agg(
        F.count("*").cast("long").alias("cnt")
    )
    vstats = vloads.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.max("cnt").cast("long").alias("max_vertex"),
    )
    return cut.crossJoin(vstats).select(
        "m",
        "edge_cut",
        F.round(F.col("edge_cut") / F.col("m"), 6).alias("edge_cut_rate"),
        "n",
        "max_vertex",
        F.round(F.col("max_vertex") * F.lit(k) / F.col("n"), 6).alias("load_balance"),
    )


def assert_complete(edges: DataFrame, edges_partitioned: DataFrame, k: int) -> None:
    """Completeness invariant: every edge assigned exactly once to a
    partition in [0, k) — parity with CHECK_EQ(assigned_edges,
    num_edges) (edgePartitioner.cpp:50, ne.cpp:150)."""
    m = edges.count()
    mp = edges_partitioned.count()
    assert m == mp, f"assigned {mp} != input {m}"
    bad = edges_partitioned.where(
        (F.col("partition") < 0) | (F.col("partition") >= k)
    ).count()
    assert bad == 0, f"{bad} edges outside [0,{k})"
    dup = (
        edges_partitioned.groupBy("src", "dst")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup == 0, f"{dup} edges assigned more than once"


def vertex_masters(assigned: DataFrame) -> DataFrame:
    """One home partition per vertex — the ``vertex_master(vid,
    partition)`` table the S9 sink plan materializes (the reference's
    ``save_vertex`` writer, bodies commented out at
    partitioner.cpp:24-29; its NW/NWG forks re-derive the same thing in
    their post-pass master election, offstreamNW.cpp:~200+). In a
    vertex-cut system the master partition holds the vertex's state
    (rank, label); mirrors receive copies — so the master is the
    partition holding MOST of the vertex's edges (ties → lowest id),
    minimizing state-to-mirror traffic.

    Scale shape: one grouped count (map-side combined) + an argmax
    window bounded by the vertex's MIRROR count (≤ RF rows, single
    digits for good partitioners), never its degree."""
    from pyspark.sql import Window

    ends = assigned.select(F.col("src").alias("vid"), "partition").unionAll(
        assigned.select(F.col("dst").alias("vid"), "partition")
    )
    per = ends.groupBy("vid", "partition").agg(F.count("*").alias("c"))
    w = Window.partitionBy("vid").orderBy(F.desc("c"), F.asc("partition"))
    return (
        per.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("vid", F.col("partition").alias("master"))
    )
