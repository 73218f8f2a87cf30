"""Property-based invariants on random small graphs (SURVEY.md §5):
RF ≥ 1, alpha ≥ 1, grid bound, PageRank mass conservation, CC count
parity with the oracle. Seeded and example-capped (each example spins
Spark jobs)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linkgraph.algos.pagerank import pagerank
from linkgraph.algos.cc import connected_components
from linkgraph.graph import degrees
from linkgraph.oracle.numpy_ref import components_py
from linkgraph.partition.metrics import edge_partition_metrics
from linkgraph.partition.strategies import dbh, grid, hash_edges

edge_lists = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30))
    .map(lambda t: (min(t), max(t)))
    .filter(lambda t: t[0] != t[1]),
    min_size=3,
    max_size=60,
    unique=True,
)

SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)


@given(edges=edge_lists)
@SET
def test_partition_invariants(spark, edges_df, edges):
    e = edges_df(edges)
    m = len(edges)
    for name, p, k in [
        ("hash", hash_edges(e, 4), 4),
        ("dbh", dbh(e, degrees(e), 4), 4),
        ("grid", grid(e, 4), 4),
    ]:
        row = edge_partition_metrics(p, k).first()
        assert row["m"] == m
        assert row["replication_factor"] >= 1.0
        assert row["alpha"] >= 1.0 - 1e-9
        if name == "grid":
            assert row["replication_factor"] <= 2 * 2 - 1 + 1e-9


@given(edges=edge_lists)
@SET
def test_pagerank_mass_conserved(spark, edges_df, edges):
    from pyspark.sql import functions as F

    total = (
        pagerank(edges_df(edges), iterations=8)
        .agg(F.sum("rank"))
        .first()[0]
    )
    assert abs(total - 1.0) < 1e-9


@given(edges=edge_lists)
@SET
def test_cc_component_count(spark, edges_df, edges):
    got = {
        r["vid"]: r["component"]
        for r in connected_components(edges_df(edges)).collect()
    }
    want = components_py(edges)
    assert got == want


@given(edges=edge_lists)
@SET
def test_chunked_and_ne_invariants(spark, edges_df, edges):
    """Random-graph invariants for the round-2 partitioners: chunked
    HDRF and NE-coarse assign every edge exactly once to [0, k), and
    chunked respects the budgeted balance bound."""
    from linkgraph.partition.hdrf import hdrf_spark
    from linkgraph.partition.metrics import assert_complete
    from linkgraph.partition.ne import ne_coarse

    e = edges_df(edges)
    k = 4
    p_chunked = hdrf_spark(e, k, exact=False, num_chunks=2)
    assert_complete(e, p_chunked, k)
    p_ne = ne_coarse(e, k, rounds=8)
    assert_complete(e, p_ne, k)


@given(
    sizes=st.lists(st.integers(1, 300), min_size=0, max_size=200),
    budget=st.integers(1, 400),
)
@settings(max_examples=200, deadline=None, derandomize=True)
def test_greedy_bins_invariants(sizes, budget):
    """Pure greedy-packer core (shared by the Spark packer and its
    replay oracle): bin ids are a monotone contiguous sequence, every
    bin's sum fits the budget unless it is a single oversized doc, and
    a doc never splits."""
    from linkgraph.pipeline.sampling import greedy_bins

    bins = greedy_bins(sizes, budget)
    assert len(bins) == len(sizes)
    if not bins:
        return
    assert bins[0] == 0
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
    fill: dict[int, list[int]] = {}
    for n, b in zip(sizes, bins):
        fill.setdefault(b, []).append(n)
    for contents in fill.values():
        assert sum(contents) <= budget or len(contents) == 1


@given(edges=edge_lists)
@SET
def test_k_core_fixpoint_properties(spark, edges_df, edges):
    """k-core definition holds on random graphs: every core vertex's
    recorded core_degree equals its in-core neighbor count and is ≥ k;
    every EXCLUDED vertex has < k neighbors in the core (maximality —
    the peel can't have stopped early)."""
    from linkgraph.algos.kcore import k_core

    k = 3
    core = {
        r["vid"]: r["core_degree"]
        for r in k_core(edges_df(edges), k=k).collect()
    }
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for v, cd in core.items():
        in_core = len(adj[v] & core.keys())
        assert cd == in_core and cd >= k
    for v in adj.keys() - core.keys():
        assert len(adj[v] & core.keys()) < k


directed_edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12))
    .filter(lambda t: t[0] != t[1]),
    min_size=2,
    max_size=30,
    unique=True,
)


@given(edges=directed_edge_lists)
@SET
def test_scc_matches_tarjan_on_random_digraphs(spark, edges_df, edges):
    """Distributed coloring SCC ≡ Tarjan on arbitrary small digraphs —
    cycles, DAG chains, self-feeding bowties, whatever hypothesis
    finds (the two algorithms share no code)."""
    from linkgraph.algos.scc import strongly_connected_components
    from linkgraph.oracle.literal import _tarjan_scc

    got = {
        r["vid"]: r["scc"]
        for r in strongly_connected_components(edges_df(edges)).collect()
    }
    assert got == _tarjan_scc(edges)
