"""Partitioner correctness: completeness invariant, metric-definition
parity with the pure-Python mirror of edgePartitioner.cpp:30-46, and
the quality bounds from BASELINE.md §2."""

import math

import pytest
from pyspark.sql import functions as F

from linkgraph.graph import degrees
from linkgraph.oracle.numpy_ref import metrics_py
from linkgraph.partition.metrics import (
    assert_complete,
    edge_partition_metrics,
    vertex_partition_metrics,
)
from linkgraph.partition.strategies import dbh, grid, hash_edges, round_robin
from linkgraph.synth import graph_edges


@pytest.fixture(scope="module")
def powerlaw(request):
    return graph_edges("powerlaw_ba", n=400, m=3, seed=42)


@pytest.mark.parametrize("strategy", ["hash", "dbh", "grid"])
@pytest.mark.parametrize("k", [4, 16])
def test_completeness(spark, edges_df, powerlaw, strategy, k):
    e = edges_df(powerlaw)
    if strategy == "hash":
        p = hash_edges(e, k)
    elif strategy == "dbh":
        p = dbh(e, degrees(e), k)
    else:
        p = grid(e, k)
    assert_complete(e, p, k)


def test_metrics_match_python_oracle(spark, edges_df, powerlaw):
    k = 8
    e = edges_df(powerlaw)
    p = dbh(e, degrees(e), k)
    got = edge_partition_metrics(p, k).first()
    rows = [(r["src"], r["dst"], r["partition"]) for r in p.collect()]
    want = metrics_py(rows, k)
    assert got["replicas"] == want["replicas"]
    assert got["n_vertices"] == want["n_vertices"]
    assert got["max_edge"] == want["max_edge"]
    assert abs(got["replication_factor"] - want["replication_factor"]) < 1e-6
    assert abs(got["alpha"] - want["alpha"]) < 1e-6


def test_dbh_beats_hash_on_powerlaw(spark, edges_df, powerlaw):
    """BASELINE.md §2: DBH replicates hubs instead of leaves → lower RF
    than hash on power-law graphs."""
    k = 16
    e = edges_df(powerlaw)
    rf_hash = edge_partition_metrics(hash_edges(e, k, "xxhash64"), k).first()[
        "replication_factor"
    ]
    rf_dbh = edge_partition_metrics(dbh(e, degrees(e), k, "xxhash64"), k).first()[
        "replication_factor"
    ]
    assert rf_dbh < rf_hash


@pytest.mark.parametrize("k", [4, 16])
def test_grid_rf_bound(spark, edges_df, powerlaw, k):
    """Published grid bound: every vertex confined to one row + one
    column → RF ≤ 2√k − 1 (SURVEY.md §2.2 P22)."""
    e = edges_df(powerlaw)
    rf = edge_partition_metrics(grid(e, k, "xxhash64"), k).first()[
        "replication_factor"
    ]
    assert rf <= 2 * math.isqrt(k) - 1 + 1e-9


def test_grid_rejects_nonsquare_k(spark, edges_df, powerlaw):
    with pytest.raises(ValueError):
        grid(edges_df(powerlaw), 8)


def test_round_robin_reference_semantics(spark, edges_df):
    """rand.cpp:15: partition = stream index % k over the sorted
    stream."""
    edges = [(i, i + 1) for i in range(10)]
    p = round_robin(edges_df(edges), 3)
    got = {(r["src"], r["dst"]): r["partition"] for r in p.collect()}
    for i, e in enumerate(sorted(edges)):
        assert got[e] == i % 3


def test_vertex_partition_metrics(spark, edges_df):
    """Edge-cut metrics parity (vertexPartitioner.cpp:34-51) on a
    hand-checkable split: two triangles + bridge, split along the
    bridge → cut = 1."""
    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    e = edges_df(edges)
    vp = e.sparkSession.createDataFrame(
        [(v, 0 if v < 3 else 1) for v in range(6)], "vid long, partition long"
    )
    m = vertex_partition_metrics(e, vp, 2).first()
    assert m["edge_cut"] == 1
    assert abs(m["edge_cut_rate"] - 1 / 7) < 1e-6  # metric rounded to 6dp
    assert m["max_vertex"] == 3
    assert abs(m["load_balance"] - 1.0) < 1e-9


def test_salted_degrees_equal_plain(spark, edges_df, powerlaw):
    from linkgraph.partition.salt import salted_degrees

    e = edges_df(powerlaw)
    plain = {r["vid"]: r["degree"] for r in degrees(e).collect()}
    salted = {r["vid"]: r["degree"] for r in salted_degrees(e, 8).collect()}
    assert plain == salted


def test_salted_sum_equals_group_sum(spark):
    from linkgraph.partition.salt import salted_sum

    df = spark.range(1000).select(
        (F.col("id") % 7).alias("key"),
        F.col("id").cast("double").alias("val"),
        F.col("id").alias("other"),
    )
    plain = {
        r["key"]: r["s"]
        for r in df.groupBy("key").agg(F.sum("val").alias("s")).collect()
    }
    salted = {
        r["key"]: r["sum_val"] for r in salted_sum(df, "key", "val", "other").collect()
    }
    assert plain == salted


def test_split_high_degree_salts_only_hubs(spark, edges_df):
    from linkgraph.partition.salt import split_high_degree

    # hub as message destination (the skew case): 40 in-edges
    star = [(i, 100) for i in range(1, 41)] + [(41, 42), (43, 44)]
    flagged = split_high_degree(edges_df(star), degree_threshold=10, n_salts=4)
    rows = flagged.collect()
    hub_salts = {r["dst_salt"] for r in rows if r["dst"] == 100}
    cold_salts = {r["dst_salt"] for r in rows if r["dst"] != 100}
    assert cold_salts == {0}, "non-hub destinations must not be salted"
    assert len(hub_salts) > 1, "hub destination must spread over salts"


def test_vertex_masters_complete_and_mirror_bound(spark, edges_df):
    """Every vertex gets exactly ONE master, the master is one of its
    mirror partitions, and the master holds ≥ its share of the
    vertex's edges (it is the argmax by construction)."""
    from linkgraph.partition.metrics import vertex_masters
    from linkgraph.partition.strategies import hash_edges
    from linkgraph.synth import graph_edges

    e = edges_df(graph_edges("powerlaw_ba", n=200, m=2, seed=5))
    assigned = hash_edges(e, 8, "xxhash64").cache()
    m = vertex_masters(assigned)
    rows = m.collect()
    vids = [r["vid"] for r in rows]
    assert len(vids) == len(set(vids))  # one master per vertex
    mirrors = {}
    for r in (
        assigned.select(F.col("src").alias("vid"), "partition")
        .unionAll(assigned.select(F.col("dst").alias("vid"), "partition"))
        .collect()
    ):
        mirrors.setdefault(r["vid"], {}).setdefault(r["partition"], 0)
        mirrors[r["vid"]][r["partition"]] += 1
    assert set(vids) == set(mirrors)
    for r in rows:
        per = mirrors[r["vid"]]
        assert r["master"] in per
        best = max(per.values())
        # argmax with lowest-id tie-break
        assert per[r["master"]] == best
        assert r["master"] == min(p for p, c in per.items() if c == best)
