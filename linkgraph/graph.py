"""Edge-table construction and basic graph transforms.

The engine's fundamental tuple is an edge ``(src: long, dst: long)`` —
the Spark mapping of the reference's ``edge_t`` packed struct
(/root/reference/utils/util.hpp:20-38), widened to 64-bit ids for
10^12-file scale. Graph input conventions mirror the reference
(/root/reference/README.md:23-27): undirected graph stored in one
direction, no self-loops (filter parity:
/root/reference/converter/conversions.hpp:52-56).

At 100 TB the edge table is produced once by extraction
(``linkgraph.extract``) and persisted partitioned by a partitioning
strategy; everything here is a narrow/one-shuffle transform that
Catalyst pushes down into the parquet scan (only ``src``/``dst`` or the
two join keys are ever read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def edges_from_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical deterministic edge graph over the test corpus: parts
    that co-occur in the same order are linked.

    One direction per undirected edge (``src < dst``), deduplicated, no
    self-loops — the reference's input contract. The self-join shuffles
    once on ``l_orderkey`` (both sides co-partitioned), and only the two
    key columns are scanned (column pruning).
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(b, on="l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").cast("long").alias("src"),
            F.col("b.l_partkey").cast("long").alias("dst"),
        )
        .distinct()
    )


def drop_self_loops(edges: DataFrame) -> DataFrame:
    """Self-loop filter (reference conversions.hpp:52-56)."""
    return edges.where(F.col("src") != F.col("dst"))


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected edge list stored one-direction → both directions.

    Used by message-passing analytics (each undirected edge carries
    messages both ways). unionAll of two projections of the same scan —
    Spark reads the parquet once per branch but prunes to 2 columns.
    """
    return edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Undirected degree per vertex — both endpoints counted once per
    edge (reference ingest-time degree, conversions.hpp:73-74).

    A single hash aggregate (partial map-side combine + final), the
    Spark analog of the reference's dense ``degrees[]`` array.
    """
    ends = edges.select(F.col("src").alias("vid")).unionAll(
        edges.select(F.col("dst").alias("vid"))
    )
    return ends.groupBy("vid").agg(F.count("*").cast("long").alias("degree"))


def vertices(edges: DataFrame) -> DataFrame:
    """Distinct vertices with ≥1 edge — the reference's "true vertices"
    (popcount(true_vids), edgePartitioner.cpp:35-36)."""
    return (
        edges.select(F.col("src").alias("vid"))
        .unionAll(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )


def shuffle_edges(edges: DataFrame, seed: int = 985) -> DataFrame:
    """Seeded stream-order randomization — Spark analog of the
    reference's chunked Fisher-Yates Shuffler
    (/root/reference/converter/shuffler.cpp:15-118). Used so streaming
    partitioners (HDRF) are exercised order-insensitively; deterministic
    under a fixed seed (DEFAULT_SEED=985, base_graph.hpp:48)."""
    return edges.orderBy(F.xxhash64(F.col("src"), F.col("dst"), F.lit(seed)))


def edges_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second deterministic graph source: users who acted on the same
    (event_type, hour) are linked — the interaction-graph analog of
    the part co-occurrence derivation. Same contract: src < dst,
    distinct, no self-loops. One shuffle on the composite group key.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "event_type",
        F.col("user_id").cast("long").alias("user_id"),
    )
    a = ev.alias("a")
    b = ev.alias("b")
    return (
        a.join(b, on=["hour", "event_type"])
        .where(F.col("a.user_id") < F.col("b.user_id"))
        .select(
            F.col("a.user_id").alias("src"), F.col("b.user_id").alias("dst")
        )
        .distinct()
    )
