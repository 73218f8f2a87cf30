"""CSR-block gather-scatter PageRank ≡ join-based PageRank ≡ NumPy
oracle (north-star execution shape)."""

import numpy as np
import pytest

from linkgraph.csr import build_csr, pagerank_csr
from linkgraph.oracle.numpy_ref import pagerank_np
from linkgraph.synth import graph_edges


def test_build_csr_prefix_sums():
    src = np.array([2, 0, 2, 1, 0])
    dst = np.array([3, 1, 0, 2, 2])
    uniq, indptr, indices = build_csr(src, dst)
    assert uniq.tolist() == [0, 1, 2]
    assert indptr.tolist() == [0, 2, 3, 5]
    assert indices.tolist() == [1, 2, 2, 0, 3]


@pytest.mark.parametrize("strategy,k", [("grid", 4), ("hash", 6), ("dbh", 4)])
def test_pagerank_csr_matches_oracle(spark, edges_df, strategy, k):
    edges = graph_edges("powerlaw_ba", n=150, m=2, seed=9)
    got = {
        r["vid"]: r["rank"]
        for r in pagerank_csr(
            edges_df(edges), k=k, strategy=strategy, iterations=12
        ).collect()
    }
    want = pagerank_np(edges, iterations=12)
    assert set(got) == set(want)
    assert np.allclose(
        [got[v] for v in sorted(got)], [want[v] for v in sorted(want)], atol=1e-6
    )


def test_pagerank_csr_matches_join_based(spark, edges_df):
    from linkgraph.algos.pagerank import pagerank

    edges = graph_edges("two_cliques_bridge")
    a = {
        r["vid"]: r["rank"]
        for r in pagerank_csr(edges_df(edges), k=4, iterations=8).collect()
    }
    b = {
        r["vid"]: r["rank"] for r in pagerank(edges_df(edges), iterations=8).collect()
    }
    assert np.allclose(
        [a[v] for v in sorted(a)], [b[v] for v in sorted(b)], atol=1e-12
    )


def test_pagerank_csr_bucketed_matches(spark, edges_df):
    """CSR-block caching via a bucketed table (zero per-superstep edge
    exchange) is numerically identical to the cached path."""
    import numpy as np

    edges = graph_edges("powerlaw_ba", n=120, m=2, seed=21)
    a = {
        r["vid"]: r["rank"]
        for r in pagerank_csr(edges_df(edges), k=4, iterations=6).collect()
    }
    b = {
        r["vid"]: r["rank"]
        for r in pagerank_csr(
            edges_df(edges), k=4, iterations=6, bucket_table="t_pr_blocks"
        ).collect()
    }
    assert np.allclose(
        [a[v] for v in sorted(a)], [b[v] for v in sorted(b)], atol=1e-12
    )
    spark.sql("DROP TABLE IF EXISTS t_pr_blocks")


def test_pagerank_csr_blocks_matches(spark, edges_df):
    """Prebuilt-CSR-blob PageRank ≡ the cogroup-built CSR path (same
    math, same blocks) and the blobs table round-trips the arrays."""
    import numpy as np

    from linkgraph.csr import pagerank_csr_blocks, prepare_csr_blocks

    edges = graph_edges("powerlaw_ba", n=120, m=2, seed=21)
    e = edges_df(edges)
    a = {
        r["vid"]: r["rank"]
        for r in pagerank_csr(e, k=4, iterations=6).collect()
    }
    prepare_csr_blocks(e, k=4, strategy="grid", blocks_table="t_csr_blobs")
    b = {
        r["vid"]: r["rank"]
        for r in pagerank_csr_blocks(
            e, k=4, blocks_table="t_csr_blobs", iterations=6
        ).collect()
    }
    assert set(a) == set(b)
    assert np.allclose(
        [a[v] for v in sorted(a)], [b[v] for v in sorted(b)], atol=1e-12
    )
    spark.sql("DROP TABLE IF EXISTS t_csr_blobs")


def test_cc_csr_blocks_equals_join_based(spark, edges_df):
    """CC over CSR blobs must equal the join-based hash-min result
    bit-for-bit at the same round count (integer min is exact), and
    at convergence must equal the Python oracle components."""
    from linkgraph.algos.cc import connected_components
    from linkgraph.csr import cc_csr_blocks, prepare_csr_blocks
    from linkgraph.oracle.numpy_ref import components_py
    from linkgraph.synth import graph_edges

    edges = graph_edges("powerlaw_ba", n=200, m=2, seed=7)
    e = edges_df(edges)
    prepare_csr_blocks(e, k=4, strategy="grid", blocks_table="t_cc_blocks")
    got = {
        r["vid"]: r["component"]
        for r in cc_csr_blocks(e, 4, "t_cc_blocks", fixed_iterations=6).collect()
    }
    want = {
        r["vid"]: r["component"]
        for r in connected_components(e, fixed_iterations=6).collect()
    }
    assert got == want
    conv = {
        r["vid"]: r["component"]
        for r in cc_csr_blocks(e, 4, "t_cc_blocks", max_iterations=40).collect()
    }
    assert conv == components_py(edges)


def test_lpa_csr_blocks_equals_join_based(spark, edges_df):
    """LPA over CSR blobs: partial counts + global sum + deterministic
    argmax must equal the join-based result bit-for-bit."""
    from linkgraph.algos.lpa import label_propagation
    from linkgraph.csr import lpa_csr_blocks, prepare_csr_blocks
    from linkgraph.synth import graph_edges

    edges = graph_edges("two_cliques_bridge")
    e = edges_df(edges)
    prepare_csr_blocks(e, k=4, strategy="grid", blocks_table="t_lpa_blocks")
    got = {
        r["vid"]: r["label"]
        for r in lpa_csr_blocks(e, 4, "t_lpa_blocks", iterations=4).collect()
    }
    want = {
        r["vid"]: r["label"]
        for r in label_propagation(e, iterations=4).collect()
    }
    assert got == want


def test_pagerank_csr_checkpointed_resumes(spark, edges_df, tmp_path):
    """North-star combination: CSR-blob gather-scatter execution WITH
    per-superstep durable checkpoints. Run 2 supersteps, 'crash',
    resume to 5 with the same run_id → identical to an uninterrupted
    5-superstep run AND to the in-memory CSR path."""
    from linkgraph.csr import pagerank_csr_blocks, prepare_csr_blocks
    from linkgraph.pregel import CheckpointManager
    from linkgraph.synth import graph_edges

    edges = graph_edges("powerlaw_ba", n=150, m=2, seed=3)
    e = edges_df(edges)
    prepare_csr_blocks(e, k=4, strategy="grid", blocks_table="t_ckpt_blocks")
    base = str(tmp_path / "ck")

    def ranks_of(df):
        return {r["vid"]: r["rank"] for r in df.collect()}

    full = ranks_of(
        pagerank_csr_blocks(
            e, 4, "t_ckpt_blocks", iterations=5,
            ckpt=CheckpointManager(spark, base, "full"),
        )
    )
    part_ck = CheckpointManager(spark, base, "crashy")
    pagerank_csr_blocks(e, 4, "t_ckpt_blocks", iterations=2, ckpt=part_ck)
    resumed = ranks_of(
        pagerank_csr_blocks(
            e, 4, "t_ckpt_blocks", iterations=5,
            ckpt=CheckpointManager(spark, base, "crashy"),
        )
    )
    assert set(full) == set(resumed)
    for v in full:
        assert abs(full[v] - resumed[v]) < 1e-12
    plain = ranks_of(
        pagerank_csr_blocks(
            e, 4, "t_ckpt_blocks", iterations=5, checkpoint_every=1
        )
    )
    for v in full:
        assert abs(full[v] - plain[v]) < 1e-12
    recs = CheckpointManager(spark, base, "crashy").counters()
    assert [c["superstep"] for c in recs] == [0, 1, 2, 3, 4, 5]
    assert all(c["edges_scanned"] > 0 for c in recs[1:])


def test_blob_k_mismatch_raises(spark, edges_df):
    """A caller's k smaller than the blobs table's partitioning fails
    loudly instead of silently misreading the table (ADVICE r3). The
    check is on the MAX partition id, so a table with EMPTY partitions
    (groupBy build writes no row for them) still validates at its own
    k."""
    import pytest as _pytest

    from linkgraph.csr import cc_csr_blocks, prepare_csr_blocks

    e = edges_df([(i, (i + 1) % 30) for i in range(30)])
    prepare_csr_blocks(e, k=16, strategy="grid", blocks_table="t_blob_k_chk")
    with _pytest.raises(ValueError, match=">= k=4"):
        cc_csr_blocks(e, 4, "t_blob_k_chk", fixed_iterations=1).collect()
    # a small graph may leave some of the 16 grid cells empty — the
    # table must still be accepted at the k it was built with
    got = {
        r["vid"]: r["component"]
        for r in cc_csr_blocks(
            e, 16, "t_blob_k_chk", fixed_iterations=31
        ).collect()
    }
    assert set(got.values()) == {0}
