"""Salted high-degree vertex splitting (SURVEY.md §2.2 P23 — mandated
by the north star for skew, absent from the reference).

A hub vertex with degree 10^8 would concentrate one reducer's worth of
messages on a single shuffle key. The fix: split only hot keys into
``ceil(degree/threshold)`` salted clones, aggregate partials per
(key, salt), then finalize per key — Spark's map-side combine already
partial-aggregates, so salting matters for the *join/groupBy key
distribution*, which AQE's skew handling cannot always fix for
aggregations.

Everything is pure column expressions; the hot-key set is a broadcast
semi-join (it is tiny by definition — only keys above threshold).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(
    key: Column, salt_source: Column, n_salts: int, hot_keys: DataFrame | None = None
) -> Column:
    """Deterministic salt in [0, n_salts) derived from another column
    (never random — reproducibility rule, SURVEY.md §4)."""
    return F.pmod(F.xxhash64(salt_source), F.lit(n_salts))


def salted_sum(
    df: DataFrame,
    key: str,
    value: str,
    salt_source: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-proof sum: partial by (key, salt), final by key.
    Equivalent to ``df.groupBy(key).sum(value)`` for any input
    (associative+commutative), proven in tests."""
    salted = df.withColumn(
        "_salt", salt_column(F.col(key), F.col(salt_source), n_salts)
    )
    partial = salted.groupBy(key, "_salt").agg(F.sum(value).alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias(f"sum_{value}"))


def salted_degrees(edges: DataFrame, n_salts: int = 16) -> DataFrame:
    """Degree computation with explicit salting — identical result to
    ``linkgraph.graph.degrees`` (test-asserted), resilient to a 10^8-
    degree hub: each endpoint's counts first aggregate within
    (vid, salt-of-other-endpoint) groups."""
    ends = edges.select(
        F.col("src").alias("vid"), F.col("dst").alias("other")
    ).unionAll(edges.select(F.col("dst").alias("vid"), F.col("src").alias("other")))
    salted = ends.withColumn(
        "_salt", F.pmod(F.xxhash64("other"), F.lit(n_salts))
    )
    partial = salted.groupBy("vid", "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy("vid").agg(F.sum("_c").cast("long").alias("degree"))


def split_high_degree(
    edges: DataFrame, degree_threshold: int, n_salts: int = 16
) -> DataFrame:
    """Annotate edges with a dst-side salt that is non-zero only for
    high-degree destinations: ``dst_salt ∈ [0, n_salts)`` for hubs,
    0 otherwise. Downstream message aggregation groups by
    (dst, dst_salt) first, then by dst — hub partials spread over
    n_salts reducers. The hub set is broadcast (tiny)."""
    from linkgraph.graph import degrees

    hubs = (
        degrees(edges)
        .where(F.col("degree") > degree_threshold)
        .select(F.col("vid").alias("dst"))
    )
    flagged = edges.join(
        F.broadcast(hubs.withColumn("_hot", F.lit(True))), "dst", "left"
    )
    return flagged.withColumn(
        "dst_salt",
        F.when(
            F.col("_hot").isNotNull(),
            F.pmod(F.xxhash64("src"), F.lit(n_salts)),
        ).otherwise(F.lit(0)).cast("int"),
    ).drop("_hot")
