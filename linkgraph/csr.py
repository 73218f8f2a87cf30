"""Per-partition CSR adjacency blocks + CSR-block PageRank.

The Spark mapping of the reference's ``graph_t`` prefix-sum CSR
(/root/reference/utils/graph.hpp:57-95, build at
/root/reference/utils/graph.cpp:5-45): each *graph partition* (from any
``linkgraph.partition`` strategy) becomes a local CSR block
(``indptr``/``indices`` numpy arrays) built inside an Arrow UDF.

Superstep = sparse gather-scatter over the blocks:

  1. ranks ⋈ mirrors(vid → partition) routes each vertex's rank to
     every partition holding one of its edges (one shuffle, the
     superstep's only wide dependency on the rank side);
  2. cogroup(edges-by-partition, routed-ranks-by-partition) →
     applyInPandas: the UDF builds/uses the local CSR and emits
     per-destination *partial* contribution sums (map-side combine in
     user space — a partition with 10^9 edges emits at most its local
     vertex count, not its edge count);
  3. global groupBy(vid).sum finalizes — the two-stage aggregation
     that makes hub skew survivable (P23 salting semantics built in:
     the partitioner already split hub edges across partitions, so
     each hub's partials arrive pre-aggregated per partition).

At 100 TB the edges side is written once, bucketed by partition, and
re-read per superstep; the ranks shuffle is sized by replication factor
(RF ≈ 2-4 with grid/HDRF) — this is exactly why partition quality
matters for superstep throughput.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_csr(src: np.ndarray, dst: np.ndarray):
    """Local CSR from an edge batch: (unique_srcs, indptr, indices).
    Prefix-sum build mirroring the reference semantics
    (/root/reference/utils/graph.cpp:19-43)."""
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    uniq, counts = np.unique(s, return_counts=True)
    indptr = np.concatenate(([0], np.cumsum(counts)))
    return uniq, indptr, d


def drop_table_and_location(spark, table: str) -> None:
    """DROP TABLE IF EXISTS + clear a stale warehouse directory.

    A killed run can leave the managed table's directory on disk
    without a catalog entry in the next session; ``saveAsTable`` then
    fails with LOCATION_ALREADY_EXISTS. Only local ``file:`` warehouse
    locations are swept (the test/bench path); on a real catalog the
    DROP alone is authoritative."""
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
        if wh.scheme in ("", "file"):
            shutil.rmtree(f"{wh.path}/{table.lower()}", ignore_errors=True)
    except Exception:
        pass


def prepare_bucketed_edges(
    edges: DataFrame,
    k: int,
    strategy: str = "grid",
    bucket_table: str = "csr_edges_bucketed",
    hasher: str = "xxhash64",
) -> None:
    """One-time materialization of the partitioned, symmetrized edge
    set as a table bucketed on the graph-partition column. This is the
    'edges written once' half of the 100 TB story: every later
    CSR-block superstep cogroups against this table with ZERO edge-side
    exchanges. Pass the table name to ``pagerank_csr(...,
    bucket_table=..., prebuilt=True)`` to amortize the write across
    runs/iterations."""
    from linkgraph.graph import symmetrize
    from linkgraph.partition.strategies import partition_edges

    spark = edges.sparkSession
    parted = partition_edges(symmetrize(edges), strategy, k, hasher=hasher)
    drop_table_and_location(spark, bucket_table)
    (
        parted.write.bucketBy(k, "partition")
        .sortBy("partition", "src")
        .mode("overwrite")
        .saveAsTable(bucket_table)
    )


def pagerank_csr(
    edges: DataFrame,
    k: int = 32,
    strategy: str = "grid",
    iterations: int = 20,
    damping: float = 0.85,
    checkpoint_every: int = 3,
    hasher: str = "xxhash64",
    bucket_table: str | None = None,
    prebuilt: bool = False,
) -> DataFrame:
    """PageRank executed as gather-scatter over per-partition CSR
    blocks (north-star execution shape). Numerically equivalent to
    ``linkgraph.algos.pagerank`` (same update rule; float sum order
    differs ⇒ agreement to ~1e-12, well inside the 1e-6 tolerance).

    ``bucket_table``: persist the partitioned edges ONCE as a table
    bucketed on the graph-partition column — the CSR-block-caching
    path (SURVEY.md §4 item 4). The per-superstep cogroup then reads
    the bucketed scan with ZERO exchanges on the edge side (verified:
    0 Exchange nodes in the formatted plan); only the |V|·RF-sized
    rank routing moves per superstep. This is the 100 TB shape: edge
    blocks are written once, co-located forever."""
    from linkgraph.graph import symmetrize, vertices
    from linkgraph.partition.strategies import partition_edges

    if bucket_table is not None and prebuilt:
        # the bucketed table IS the symmetrized+partitioned edge set;
        # out-degree is derivable from it (each directed dart appears
        # exactly once), so the raw edge scan is never touched again
        parted = edges.sparkSession.table(bucket_table)
    else:
        sym = symmetrize(edges)
        parted = partition_edges(sym, strategy, k, hasher=hasher)
        if bucket_table is not None:
            spark = edges.sparkSession
            drop_table_and_location(spark, bucket_table)
            (
                parted.write.bucketBy(k, "partition")
                .sortBy("partition", "src")
                .mode("overwrite")
                .saveAsTable(bucket_table)
            )
            parted = spark.table(bucket_table)
        else:
            parted = parted.cache()
    out_deg = parted.groupBy("src").agg(F.count("*").alias("outdeg"))
    # mirror routing table: which partitions need each vertex's rank
    # (only as a *source* — gather side), i.e. distinct (src, partition),
    # with the static out-degree FOLDED IN once — the per-superstep work
    # is then a single join (routes ⋈ ranks) instead of two
    routes = (
        parted.select(
            F.col("src").alias("vid"), F.col("partition").alias("part")
        )
        .distinct()
        .join(out_deg.select(F.col("src").alias("vid"), "outdeg"), "vid")
        .cache()
    )
    verts = vertices(edges).cache()
    n = verts.count()
    teleport = (1.0 - damping) / n

    from linkgraph.rolling import RollingCheckpoint

    roll = RollingCheckpoint()
    ranks = verts.withColumn("rank", F.lit(1.0 / n))

    def step(key, edges_pdf: pd.DataFrame, ranks_pdf: pd.DataFrame) -> pd.DataFrame:
        if edges_pdf.empty or ranks_pdf.empty:
            return pd.DataFrame({"vid": [], "partial": []}).astype(
                {"vid": "int64", "partial": "float64"}
            )
        src = edges_pdf["src"].to_numpy()
        dst = edges_pdf["dst"].to_numpy()
        uniq, indptr, indices = build_csr(src, dst)
        # align routed ranks to the CSR's source vertices
        rv = ranks_pdf["vid"].to_numpy()
        rorder = np.argsort(rv)
        pos = np.searchsorted(rv[rorder], uniq)
        contrib = (
            ranks_pdf["rank"].to_numpy()[rorder][pos]
            / ranks_pdf["outdeg"].to_numpy()[rorder][pos]
        )
        # scatter: repeat each src's contribution across its out-edges,
        # then segment-sum by destination (local partial aggregation)
        per_edge = np.repeat(contrib, np.diff(indptr))
        dsts, inv = np.unique(indices, return_inverse=True)
        partial = np.zeros(len(dsts), dtype=np.float64)
        np.add.at(partial, inv, per_edge)
        return pd.DataFrame({"vid": dsts, "partial": partial})

    for i in range(iterations):
        routed = routes.join(ranks, "vid").select(
            "part", "vid", "rank", "outdeg"
        )
        partials = (
            parted.groupby("partition")
            .cogroup(routed.groupby("part"))
            .applyInPandas(step, schema="vid long, partial double")
        )
        new_ranks = partials.groupBy("vid").agg(
            (F.lit(teleport) + F.lit(damping) * F.sum("partial")).alias("rank")
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            new_ranks = roll(new_ranks)
        ranks = new_ranks
    return ranks.select("vid", "rank")
