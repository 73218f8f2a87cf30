"""LDG / Fennel streaming vertex partitioners: exact Spark ≡ oracle,
balance limits, edge-cut quality vs random assignment."""

import pytest
from pyspark.sql import functions as F

from linkgraph.partition.metrics import vertex_partition_metrics
from linkgraph.partition.vertex import (
    vertex_partition_chunked,
    vertex_partition_oracle,
    vertex_partition_spark,
)
from linkgraph.synth import graph_edges


@pytest.fixture(scope="module")
def powerlaw():
    return graph_edges("powerlaw_ba", n=250, m=3, seed=13)


@pytest.mark.parametrize("mode", ["ldg", "fennel"])
def test_exact_matches_oracle(spark, edges_df, powerlaw, mode):
    want = vertex_partition_oracle(powerlaw, 4, mode=mode)
    got = {
        r["vid"]: r["partition"]
        for r in vertex_partition_spark(edges_df(powerlaw), 4, mode=mode).collect()
    }
    assert got == want


@pytest.mark.parametrize("mode", ["ldg", "fennel"])
def test_every_vertex_assigned_once(spark, edges_df, powerlaw, mode):
    vp = vertex_partition_spark(edges_df(powerlaw), 4, mode=mode)
    n_vertices = len({x for e in powerlaw for x in e})
    assert vp.count() == n_vertices
    assert vp.where((F.col("partition") < 0) | (F.col("partition") >= 4)).count() == 0


@pytest.mark.parametrize("mode", ["ldg", "fennel"])
def test_balance_and_cut_quality(spark, edges_df, powerlaw, mode):
    """Load balance within the algorithm's own limit, and the greedy
    placement must cut fewer edges than hash-random placement."""
    k = 4
    e = edges_df(powerlaw)
    vp = vertex_partition_spark(e, k, mode=mode)
    m = vertex_partition_metrics(e, vp, k).first()
    # LDG capacity = n/k+1 → balance ≤ k(n/k+1)/n; fennel limit 1.1 + seed slack
    assert m["load_balance"] <= 1.35
    random_vp = vp.select(
        "vid", F.pmod(F.xxhash64("vid"), F.lit(k)).cast("long").alias("partition")
    )
    m_rand = vertex_partition_metrics(e, random_vp, k).first()
    assert m["edge_cut_rate"] < m_rand["edge_cut_rate"]


@pytest.mark.parametrize("mode", ["ldg", "fennel"])
def test_chunked_completeness_and_balance(spark, edges_df, powerlaw, mode):
    """Chunked scale mode: every vertex assigned exactly once, balance
    within the budgeted bound, cut better than random."""
    k = 4
    e = edges_df(powerlaw)
    vp = vertex_partition_chunked(e, k, mode=mode, num_chunks=4)
    n_vertices = len({x for ed in powerlaw for x in ed})
    assert vp.count() == n_vertices
    assert vp.select("vid").distinct().count() == n_vertices
    assert vp.where((F.col("partition") < 0) | (F.col("partition") >= k)).count() == 0
    m = vertex_partition_metrics(e, vp, k).first()
    assert m["load_balance"] <= 1.35
    random_vp = vp.select(
        "vid", F.pmod(F.xxhash64("vid"), F.lit(k)).cast("long").alias("partition")
    )
    m_rand = vertex_partition_metrics(e, random_vp, k).first()
    assert m["edge_cut_rate"] < m_rand["edge_cut_rate"]


@pytest.mark.parametrize("mode", ["ldg", "fennel"])
def test_chunked_cut_within_bound_of_exact(spark, edges_df, powerlaw, mode):
    """Documented approximation bound: chunked edge-cut ≤ 1.35× exact
    on the power-law fixture (staleness costs, but bounded)."""
    k = 4
    e = edges_df(powerlaw)
    exact = vertex_partition_spark(e, k, mode=mode)
    chunked = vertex_partition_chunked(e, k, mode=mode, num_chunks=4)
    cut_exact = vertex_partition_metrics(e, exact, k).first()["edge_cut_rate"]
    cut_chunked = vertex_partition_metrics(e, chunked, k).first()["edge_cut_rate"]
    assert cut_chunked <= cut_exact * 1.35


def test_chunked_deterministic(spark, edges_df, powerlaw):
    e = edges_df(powerlaw)
    a = {r["vid"]: r["partition"]
         for r in vertex_partition_chunked(e, 4, num_chunks=3).collect()}
    b = {r["vid"]: r["partition"]
         for r in vertex_partition_chunked(e, 4, num_chunks=3).collect()}
    assert a == b


def test_fennel_reference_quirk_reproducible():
    """faithful_quirk=True reproduces the reference's runaway partition
    (fennel.cpp:119-127 leaves over-limit partitions at score 0);
    default paper-correct mode stays within the 1.1 limit + seed
    slack."""
    from collections import Counter

    edges = graph_edges("powerlaw_ba", n=250, m=3, seed=13)
    n = len({x for e in edges for x in e})
    quirk = Counter(vertex_partition_oracle(edges, 4, mode="fennel",
                                            faithful_quirk=True).values())
    clean = Counter(vertex_partition_oracle(edges, 4, mode="fennel").values())
    assert max(quirk.values()) * 4 / n > 1.5   # runaway reproduced
    assert max(clean.values()) * 4 / n <= 1.35  # paper behavior bounded
