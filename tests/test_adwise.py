"""ADWISE bounded-window offstream (reference offstreamNA.cpp):
completeness, determinism, Spark ≡ pure-Python replay, window-semantics
unit checks, and the quality ordering vs hash."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.partition.adwise import WINDOW_SIZE, _window_assign, offstream_window_spark
from linkgraph.partition.hdrf import LAMBDA
from linkgraph.partition.metrics import assert_complete, edge_partition_metrics
from linkgraph.partition.strategies import hash_edges
from linkgraph.synth import graph_edges


@pytest.fixture(scope="module")
def powerlaw():
    return graph_edges("powerlaw_ba", n=300, m=3, seed=11)


def _fresh_state(n, k):
    words = (k + 63) // 64
    return (
        np.zeros(n, dtype=np.int64),
        np.zeros((n, words), dtype=np.uint64),
        np.zeros((n, k), dtype=np.int64),
    )


def test_window_prefers_mirrored_partition():
    """rf term: an edge whose endpoint is already mirrored on p must
    land on p when loads are level — and the cs term must reinforce the
    same choice (placement counts seeded on p)."""
    k = 4
    pdeg, mirrors, vp = _fresh_state(3, k)
    # vertex 0 already placed twice on partition 2
    pdeg[0] = 2
    mirrors[0, 0] = np.uint64(1) << np.uint64(2)
    vp[0, 2] = 2
    loads = np.array([1, 1, 1, 1], dtype=np.int64)
    budget = np.full(k, 100, dtype=np.int64)
    parts = _window_assign(
        np.array([0]), np.array([1]), k, pdeg, mirrors, vp,
        loads, cap=100, budget=budget,
    )
    assert parts[0] == 2


def test_window_best_edge_first():
    """Window semantics proper: with two edges in the window, the one
    with the higher score is assigned FIRST (stream order alone would
    assign edge A first). Edge B's endpoint is mirrored (high rf);
    edge A is fresh. Window size 2 holds both before any removal."""
    k = 2
    pdeg, mirrors, vp = _fresh_state(4, k)
    pdeg[2] = 3
    mirrors[2, 0] = np.uint64(1) << np.uint64(1)
    vp[2, 1] = 3
    loads = np.array([2, 2], dtype=np.int64)
    budget = np.full(k, 100, dtype=np.int64)
    # stream order: A=(0,1) fresh, B=(2,3) mirrored on p1
    parts = _window_assign(
        np.array([0, 2]), np.array([1, 3]), k, pdeg, mirrors, vp,
        loads, cap=100, budget=budget, window_size=2,
    )
    # B goes to its mirrored partition; A is drained after, to the
    # then-lighter partition 0 (loads were level, B bumped p1)
    assert parts[1] == 1
    assert parts[0] == 0


def test_window_respects_cap():
    """Partitions at max_partition_load are skipped (offstreamNA.cpp:
    363-365): with p0 at cap, even a p0-mirrored edge goes elsewhere."""
    k = 2
    pdeg, mirrors, vp = _fresh_state(2, k)
    pdeg[0] = 1
    mirrors[0, 0] = np.uint64(1)  # mirrored on p0
    vp[0, 0] = 1
    loads = np.array([10, 0], dtype=np.int64)
    budget = np.full(k, 100, dtype=np.int64)
    parts = _window_assign(
        np.array([0]), np.array([1]), k, pdeg, mirrors, vp,
        loads, cap=10, budget=budget,
    )
    assert parts[0] == 1


def test_offstream_window_complete_deterministic(spark, edges_df, powerlaw):
    k = 8
    e = edges_df(powerlaw)
    out = offstream_window_spark(e, k, offline_chunks=3)
    assert_complete(e, out, k)
    a = {(r["src"], r["dst"]): r["partition"] for r in out.collect()}
    b = {
        (r["src"], r["dst"]): r["partition"]
        for r in offstream_window_spark(e, k, offline_chunks=3).collect()
    }
    assert a == b
    mo = edge_partition_metrics(out, k).first()
    mh = edge_partition_metrics(hash_edges(e, k, "xxhash64"), k).first()
    assert mo["replication_factor"] < mh["replication_factor"]
    assert mo["alpha"] <= 1.35


def test_offstream_window_frozen_prefix(spark, edges_df, powerlaw):
    """The offline prefix is identical to what the chunked pass alone
    produces (frozen-prefix property shared with offstream_spark)."""
    from linkgraph.partition.hdrf import _hdrf_chunked

    k = 8
    e = edges_df(powerlaw)
    out = offstream_window_spark(e, k, offline_chunks=3)
    got = {(r["src"], r["dst"]): r["partition"] for r in out.collect()}
    m = e.count()
    split = F.pmod(F.xxhash64("src", "dst", F.lit(31337)), F.lit(1000)) < 500
    pre_alone = {
        (r["src"], r["dst"]): r["partition"]
        for r in _hdrf_chunked(e.where(split), k, 1.1, 1.05, 3, total_edges=m).collect()
    }
    for edge, p in pre_alone.items():
        assert got[edge] == p


def test_defer_greedy_defers_fresh_edges():
    """NWG unit trace: with both endpoints fresh, the edge is NOT
    assigned until one endpoint gains a placement, then cascades.
    Stream: A=(0,1) fresh-fresh → deferred; B=(2,0) where 2 is
    mirrored on p1 → B goes to p1 (union rule) and places 0, which
    releases A → A joins 0's partition p1 (single-side rule)."""
    import numpy as np

    from linkgraph.partition.adwise import _defer_greedy_assign

    k = 2
    mirrors = np.zeros((3, 1), dtype=np.uint64)
    mirrors[2, 0] = np.uint64(1) << np.uint64(1)  # vertex 2 on p1
    loads = np.array([5, 5], dtype=np.int64)
    budget = np.full(k, 100, dtype=np.int64)
    parts = _defer_greedy_assign(
        np.array([0, 2]), np.array([1, 0]), k, mirrors, loads, budget
    )
    # B (index 1) → p1; cascade assigns A (index 0) → p1 via vertex 0
    assert parts.tolist() == [1, 1]


def test_defer_greedy_drains_leftovers():
    """A stream of only fresh-fresh edges defers everything; the final
    drain must still assign every edge (least-loaded fallback)."""
    import numpy as np

    from linkgraph.partition.adwise import _defer_greedy_assign

    k = 4
    mirrors = np.zeros((8, 1), dtype=np.uint64)
    loads = np.zeros(k, dtype=np.int64)
    budget = np.full(k, 100, dtype=np.int64)
    parts = _defer_greedy_assign(
        np.array([0, 2, 4, 6]), np.array([1, 3, 5, 7]), k,
        mirrors, loads, budget,
    )
    assert (parts >= 0).all()


def test_offstream_defer_complete_deterministic(spark, edges_df, powerlaw):
    from linkgraph.partition.adwise import offstream_defer_spark

    k = 8
    e = edges_df(powerlaw)
    out = offstream_defer_spark(e, k, offline_chunks=3)
    assert_complete(e, out, k)
    a = {(r["src"], r["dst"]): r["partition"] for r in out.collect()}
    b = {
        (r["src"], r["dst"]): r["partition"]
        for r in offstream_defer_spark(e, k, offline_chunks=3).collect()
    }
    assert a == b
    mo = edge_partition_metrics(out, k).first()
    mh = edge_partition_metrics(hash_edges(e, k, "xxhash64"), k).first()
    assert mo["replication_factor"] < mh["replication_factor"]
