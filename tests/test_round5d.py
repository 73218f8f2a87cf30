"""Round-5 late block: sketches (HLL / Count-Min), cross-corpus n-gram
coverage, canonical dedup survivors, bigram surprisal, degree
quantiles, butterflies, DAG topo levels."""

import hashlib
import math

import pytest

from pyspark.sql import functions as F


def _docs(spark, rows):
    """rows: list of (doc_id, text, source). n_chars derived."""
    return spark.createDataFrame(
        [(i, t, s, len(t)) for i, t, s in rows],
        "doc_id long, text string, source string, n_chars long",
    )


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# --- HLL ------------------------------------------------------------------


def test_hll_matches_python_reference(spark):
    from linkgraph.pipeline.sketches import HLL_ALPHA, HLL_M, hll_distinct

    texts = [f"doc number {i} body" for i in range(7)]
    rows = [(i, texts[i % 7], "s0") for i in range(20)]
    out = hll_distinct(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 20 and r["exact_distinct"] == 7

    # independent python replay of the register math
    regs = {}
    for t in set(texts):
        h = _h32(t)
        b, rest = h % HLL_M, h // HLL_M
        rho = 27 if rest == 0 else 27 - len(bin(rest)[2:])
        regs[b] = max(regs.get(b, 0), rho)
    z = sum(2.0 ** -m for m in regs.values()) + (HLL_M - len(regs))
    raw = HLL_ALPHA * HLL_M * HLL_M / z
    v = HLL_M - len(regs)
    est = HLL_M * math.log(HLL_M / v) if raw <= 2.5 * HLL_M and v > 0 else raw
    assert r["hll_estimate"] == pytest.approx(round(est, 6), abs=1e-6)
    assert r["rel_err"] == pytest.approx(round((est - 7) / 7, 6), abs=1e-6)


# --- Count-Min ------------------------------------------------------------


def test_cms_never_undercounts_and_orders_heads(spark):
    from linkgraph.pipeline.sketches import heavy_hitters_cms

    rows = [(i, "alpha alpha alpha beta gamma", "s0") for i in range(5)]
    rows += [(10 + i, "beta delta epsilon zeta", "s1") for i in range(3)]
    out = heavy_hitters_cms(_docs(spark, rows), top=4).collect()
    assert len(out) == 4
    by_tok = {r["tok"]: r for r in out}
    assert by_tok["alpha"]["exact_cnt"] == 15
    assert by_tok["beta"]["exact_cnt"] == 8
    for r in out:  # CMS invariant
        assert r["cms_estimate"] >= r["exact_cnt"]
        assert r["overcount"] == r["cms_estimate"] - r["exact_cnt"]


# --- cross-corpus n-gram coverage -----------------------------------------


def test_dup_ngram_coverage_planted(spark):
    from linkgraph.pipeline.dedup import dup_ngram_coverage

    shared = "one two three four five"
    rows = [
        (0, shared + " apple banana", "a"),
        (1, shared + " cherry date", "a"),
        (2, "totally different words here now", "a"),
        (3, "xy", "a"),  # too short for a 3-gram
    ]
    out = {r["doc_id"]: r for r in dup_ngram_coverage(_docs(spark, rows)).collect()}
    assert len(out) == 4
    # docs 0/1 share exactly the 3 shingles inside `shared`
    assert out[0]["n_shared"] == 3 and out[1]["n_shared"] == 3
    assert out[0]["n_shingles"] == 5
    assert out[0]["shared_ratio"] == pytest.approx(0.6)
    assert out[2]["n_shared"] == 0 and out[2]["shared_ratio"] == 0.0
    assert out[3]["n_shingles"] == 0 and out[3]["shared_ratio"] is None


# --- canonical survivors ---------------------------------------------------


def test_dedup_canonical_survivor_choice(spark):
    from linkgraph.pipeline.dedup import dedup_canonical

    dup_a = "the quick brown fox jumps over the lazy dog again and again"
    dup_b = "completely other duplicated body of text with many words inside"
    rows = [
        (0, dup_a, "a"),
        (1, dup_a, "a"),
        (2, dup_a + " longer", "a"),  # near-dup, longest -> survivor
        (3, "a unique document with its very own words", "a"),
        (4, dup_b, "b"),
        (5, dup_b, "b"),  # tie on n_chars -> min doc_id survives
    ]
    out = {r["cluster_id"]: r for r in dedup_canonical(_docs(spark, rows)).collect()}
    clusters = {r["survivor_doc_id"]: r for r in out.values()}
    assert 2 in clusters and clusters[2]["cluster_size"] == 3
    assert clusters[2]["n_dropped"] == 2
    assert 4 in clusters and clusters[4]["cluster_size"] == 2
    assert 3 in clusters and clusters[3]["cluster_size"] == 1


# --- bigram surprisal -------------------------------------------------------


def test_bigram_logprob_deterministic_text_scores_zero(spark):
    from linkgraph.pipeline.text import bigram_logprob

    rows = [(0, "a b a b a", "s")]
    out = bigram_logprob(_docs(spark, rows)).collect()
    assert out[0]["n_bigrams"] == 4
    assert out[0]["mean_bigram_nll"] == pytest.approx(0.0)


def test_bigram_logprob_branching(spark):
    from linkgraph.pipeline.text import bigram_logprob

    # corpus: 'a b' once and 'a c' once -> each bigram p=0.5
    rows = [(0, "a b", "s"), (1, "a c", "s")]
    out = {r["doc_id"]: r for r in bigram_logprob(_docs(spark, rows)).collect()}
    assert out[0]["mean_bigram_nll"] == pytest.approx(round(math.log(2), 6))
    assert out[1]["mean_bigram_nll"] == pytest.approx(round(math.log(2), 6))


# --- degree quantiles -------------------------------------------------------


def test_degree_quantile_rank_formula(spark, edges_df):
    # star K1,4: degrees hub=4, leaves=1 (n=5)
    from linkgraph.graph import degrees
    from pyspark.sql import Window

    deg = degrees(edges_df([(0, 1), (0, 2), (0, 3), (0, 4)]))
    hist = deg.groupBy("degree").agg(F.count("*").cast("long").alias("cnt"))
    w = Window.orderBy("degree").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "degree",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy("degree").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    qs = spark.createDataFrame([(25,), (50,), (99,)], "q long")
    got = {
        r["q"]: r["degree"]
        for r in qs.crossJoin(cum)
        .where(F.col("cum") >= F.expr("(q * n + 99) div 100"))
        .groupBy("q")
        .agg(F.min("degree").alias("degree"))
        .collect()
    }
    # ranks: ceil(.25*5)=2 -> 1, ceil(.5*5)=3 -> 1, ceil(.99*5)=5 -> 4
    assert got == {25: 1, 50: 1, 99: 4}


# --- butterflies ------------------------------------------------------------


def test_butterfly_closed_form(spark):
    from linkgraph.algos.projection import bipartite_projection, butterflies

    inc = spark.createDataFrame(
        [(1, 101), (2, 101), (3, 101), (1, 102), (2, 102)],
        "u long, r long",
    )
    proj = bipartite_projection(inc, "u", "r", hub_cap=10)
    row = butterflies(proj).collect()[0]
    # pairs: (1,2) w=2, (1,3) w=1, (2,3) w=1 -> butterflies = C(2,2)=1
    assert row["n_pairs"] == 3 and row["n_butterflies"] == 1


# --- topo levels -------------------------------------------------------------


def test_topo_levels_chain_caps_at_depth(spark, edges_df):
    from linkgraph.algos.dag import topo_levels

    chain = edges_df([(i, i + 1) for i in range(1, 8)])  # 1->...->8
    got = {r["vid"]: r["level"] for r in topo_levels(chain, max_depth=6).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5, 7: 6, 8: 6}


def test_topo_levels_diamond(spark, edges_df):
    from linkgraph.algos.dag import topo_levels

    got = {
        r["vid"]: r["level"]
        for r in topo_levels(
            edges_df([(1, 2), (1, 3), (2, 4), (3, 4)]), max_depth=6
        ).collect()
    }
    assert got == {1: 0, 2: 1, 3: 1, 4: 2}


# --- sampled triangle estimate ----------------------------------------------


def test_triangle_estimate_audit_columns(spark, edges_df):
    from linkgraph.algos.triangles import triangle_estimate

    # two triangles sharing an edge: {1,2,3}, {2,3,4}
    e = edges_df([(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)])
    r = triangle_estimate(e, pct=100).collect()[0]  # pct=100: no sampling
    assert r["n_triangles"] == 2 and r["n_sampled"] == 2
    assert r["estimate"] == pytest.approx(2.0)
    assert r["rel_err"] == pytest.approx(0.0)


def test_triangle_estimate_sampling_consistent(spark, edges_df):
    from linkgraph.algos.triangles import triangle_estimate
    from linkgraph.hashing import md5_prefix_hash

    edges = [(a, b) for a in range(1, 12) for b in range(a + 1, 12)]  # K11
    e = edges_df(edges)
    r = triangle_estimate(e, pct=50).collect()[0]
    assert r["n_triangles"] == 165  # C(11,3)
    # python replay of the deterministic edge coin-flips
    kept = {
        (a, b)
        for a, b in edges
        if _h32(f"tri:{a}:{b}") % 100 < 50
    }
    want = sum(
        1
        for a, b in edges
        for c in range(b + 1, 12)
        if (a, b) in kept and (b, c) in kept and (a, c) in kept
    )
    assert r["n_sampled"] == want
    assert r["estimate"] == pytest.approx(round(want * 8.0, 6))


# --- IVF cell stats / per-source quality dashboard ---------------------------


def test_ivf_cell_stats_known_routing(spark):
    from linkgraph.pipeline.similarity import ivf_cell_stats

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [1.0, 0.1]),
            (3, [0.1, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["cell"]: r for r in ivf_cell_stats(emb, n_cells=2).collect()}
    assert out[0]["n_vectors"] == 2 and out[1]["n_vectors"] == 2
    for r in out.values():  # both cells coherent, centroid itself = 1.0
        assert r["mean_cosine"] > 0.9
        assert r["min_cosine"] <= r["mean_cosine"]


def test_quality_by_source_keep_rates(spark):
    from linkgraph.pipeline.text import quality_by_source

    long_ok = "the quick brown fox jumps over the lazy dog near a river bank"
    rows = [
        (0, long_ok, "a"),
        (1, long_ok + " again today", "a"),
        (2, "too short", "b"),  # fails n_tokens >= 10
        (3, long_ok, "b"),
    ]
    out = {r["source"]: r for r in quality_by_source(_docs(spark, rows)).collect()}
    assert out["a"]["n_docs"] == 2 and out["a"]["n_keep"] == 2
    assert out["a"]["keep_rate"] == pytest.approx(1.0)
    assert out["b"]["n_docs"] == 2 and out["b"]["n_keep"] == 1
    assert out["b"]["keep_rate"] == pytest.approx(0.5)


def test_doc_length_quantiles_rank_formula(spark):
    from linkgraph.pipeline.text import doc_length_quantiles

    # token counts: 2, 2, 3, 5 (n=4)
    rows = [(0, "a b", "s"), (1, "c d", "s"), (2, "e f g", "s"),
            (3, "h i j k l", "s")]
    got = {
        r["q"]: r["n_tokens"]
        for r in doc_length_quantiles(_docs(spark, rows)).collect()
    }
    # ranks: ceil(.25*4)=1 -> 2, ceil(.5*4)=2 -> 2, ceil(.75*4)=3 -> 3,
    # ceil(.9*4)=4 -> 5, ceil(.99*4)=4 -> 5
    assert got == {25: 2, 50: 2, 75: 3, 90: 5, 99: 5}


# --- bloom membership / verified similarity join -----------------------------


def test_bloom_no_false_negatives(spark):
    from linkgraph.pipeline.sketches import bloom_membership

    rows = [(i, f"document body number {i} with words", "s") for i in range(30)]
    out = bloom_membership(_docs(spark, rows)).collect()
    assert len(out) == 16  # 8 present + 8 absent probes
    for r in out:
        if r["present"]:  # Bloom invariant: no false negatives
            assert r["bloom_positive"]
        assert r["false_positive"] == (r["bloom_positive"] and not r["present"])
    assert sum(1 for r in out if r["present"]) == 8


def test_verified_sim_pairs_finds_planted_near_dup(spark):
    import random

    from linkgraph.pipeline.similarity import verified_sim_pairs

    rng = random.Random(7)
    base = [rng.uniform(-1, 1) for _ in range(16)]
    near = [x + 0.01 for x in base]
    rows = [(0, base), (1, near)]
    rows += [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(2, 30)]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in verified_sim_pairs(emb, threshold=0.9).collect()
    }
    assert (0, 1) in got and got[(0, 1)] > 0.99
