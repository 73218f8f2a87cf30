"""Training-data pipeline operators: dedup recall on planted
near-duplicates, SimHash locality, ANN recall vs brute force,
multimodal Arrow plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.pipeline import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def planted_docs(spark):
    """60 random-word docs + 5 planted near-duplicate pairs (one word
    changed) + 2 exact duplicates."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    did = 0
    for _ in range(60):
        rows.append((did, " ".join(rng.choice(vocab, 40))))
        did += 1
    near_pairs = []
    for _ in range(5):
        base = rng.choice(vocab, 40)
        a = " ".join(base)
        mod = base.copy()
        mod[20] = "CHANGED"
        b = " ".join(mod)
        rows.append((did, a))
        rows.append((did + 1, b))
        near_pairs.append((did, did + 1))
        did += 2
    rows.append((did, rows[0][1]))  # exact dup of doc 0
    exact_pair = (0, did)
    return (
        spark.createDataFrame(rows, "doc_id long, text string"),
        near_pairs,
        exact_pair,
    )


def test_exact_dedup_finds_duplicate(spark, planted_docs):
    docs, _, (a, b) = planted_docs
    d = dedup.dedup_exact(docs)
    dup_row = d.where(F.col("n_copies") > 1).collect()
    assert len(dup_row) == 1
    assert dup_row[0]["canonical_doc_id"] == a
    assert dup_row[0]["n_copies"] == 2


def test_ngram_jaccard_finds_planted_pairs(spark, planted_docs):
    docs, near_pairs, exact_pair = planted_docs
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    for p in near_pairs:
        assert p in got, f"planted near-dup {p} missed"
    assert (min(exact_pair), max(exact_pair)) in got


def test_minhash_lsh_recall(spark, planted_docs):
    """Planted near-dups (jaccard ≈ 0.85) must be LSH candidates; the
    candidate set must be far smaller than all pairs (the point of
    LSH)."""
    docs, near_pairs, exact_pair = planted_docs
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_candidates(docs).collect()
    }
    found = sum(1 for p in near_pairs if p in cands)
    assert found >= 4, f"LSH recall too low: {found}/5"
    assert (min(exact_pair), max(exact_pair)) in cands
    n = docs.count()
    assert len(cands) < n * (n - 1) / 2 / 4, "candidate set not selective"


def test_minhash_exact_dup_shares_all_bands(spark, planted_docs):
    docs, _, (a, b) = planted_docs
    row = (
        dedup.minhash_lsh_candidates(docs)
        .where((F.col("doc_a") == a) & (F.col("doc_b") == b))
        .first()
    )
    assert row is not None and row["shared_bands"] == dedup.NUM_BANDS


def test_lsh_mega_bucket_capped(spark, planted_docs):
    """Planted boilerplate (many byte-identical docs → one degenerate
    LSH bucket) must NOT go quadratic: with the bucket-size cap the
    boilerplate contributes zero candidate pairs (it's exact-dup
    territory), while genuine near-dup pairs still surface."""
    docs, near_pairs, _ = planted_docs
    boiler = spark.range(1000, 1200).select(
        F.col("id").alias("doc_id"),
        F.lit("same boilerplate text repeated verbatim for every doc").alias(
            "text"
        ),
    )
    poisoned = docs.unionByName(boiler)
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_candidates(
            poisoned, max_bucket_size=50
        ).collect()
    }
    # no pair among the 200 boilerplate docs (200²/2 ≈ 20k would have
    # swamped the join)
    assert not any(a >= 1000 and b >= 1000 for a, b in capped)
    found = sum(1 for p in near_pairs if p in capped)
    assert found >= 4, f"cap must not hurt genuine near-dup recall: {found}/5"
    # and the boilerplate is still collapsed by the linear-cost path
    exact = dedup.dedup_exact(poisoned).where(F.col("n_copies") >= 200)
    assert exact.count() == 1


def test_simhash_locality(spark, planted_docs):
    """Near-dup docs get nearby simhashes (small Hamming distance);
    exact dups identical."""
    docs, near_pairs, (a, b) = planted_docs
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sh[a] == sh[b]
    for u, v in near_pairs:
        ham = bin(sh[u] ^ sh[v]).count("1")
        assert ham <= 4, f"near-dup pair {(u, v)} hamming {ham} too far"


def test_knn_matches_numpy(spark):
    """Brute-force kNN agrees with a NumPy oracle on the real
    embeddings table."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = sorted(
        emb.collect(), key=lambda r: r["vec_id"]
    )
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    norms = np.linalg.norm(mat, axis=1)
    got = similarity.knn_bruteforce(emb, n_queries=5, k=3).collect()
    for r in got:
        q = np.where(ids == r["query_id"])[0][0]
        cos = mat @ mat[q] / (norms * norms[q])
        cos[q] = -np.inf
        order = np.lexsort((ids, -np.round(cos, 4)))
        want_neighbor = ids[order[r["rnk"] - 1]]
        assert r["neighbor_id"] == want_neighbor


def test_ann_bucket_recall(spark):
    """Vectors with cosine ≥ 0.5 should usually share an 8-plane LSH
    bucket region... at minimum: identical vectors share buckets, and
    buckets partition the whole set."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    doubled = emb.unionByName(
        emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label")
    )
    b = {r["vec_id"]: r["bucket"] for r in similarity.lsh_bucket_ids(doubled).collect()}
    for vid in list(b):
        if vid < 100000:
            assert b[vid] == b[vid + 100000], "identical vectors in different buckets"


def test_multimodal_feature_extraction(spark):
    media = multimodal.synthesize_media(spark, "/root/testdata/sf0.001")
    feats = multimodal.extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows[:10]:
        assert r["n_bytes"] > 0
        assert 0 <= r["mean_byte"] <= 255
        assert 0 <= r["entropy"] <= 8


def test_multimodal_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"xx", "image/fake")


def test_quality_and_tokens_consistent(spark, planted_docs):
    docs, _, _ = planted_docs
    q = {r["doc_id"]: r for r in text.quality_scores(docs).collect()}
    t = {r["doc_id"]: r for r in text.token_counts(docs).collect()}
    for did in q:
        assert q[did]["n_tokens"] == t[did]["n_tokens"]
        assert q[did]["quality_keep"] in (True, False)


def test_dedup_clusters_collapse_transitively(spark):
    """A→B→C near-dup chains must land in ONE cluster (the pairwise
    candidate list can't express this); unrelated docs stay
    singletons with their own id."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base + " extra"),            # near-dup of 1
        (3, base + " extra more"),       # near-dup of 2 (chain)
        (4, "completely different text about graph partitioning engines at scale"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from linkgraph.pipeline.dedup import dedup_clusters

    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs).collect()}
    assert got[4] == 4  # singleton keeps its own id
    assert got[1] == got[2] == got[3]  # chain collapses to one cluster
    assert got[1] == 1  # hash-min ⇒ min doc_id labels the cluster


def test_ann_ivf_recall_on_clustered_vectors(spark):
    """IVF with planted clusters: vectors around C well-separated
    prototypes (prototypes placed at the lowest vec_ids so they become
    the centroids). Same-cluster vectors must route to the same cell,
    and 1-probe IVF search must recover the exact brute-force top-k
    with high recall (the point of IVF: scan 1/C of the corpus)."""
    import numpy as np

    rng = np.random.default_rng(11)
    C, per, d = 4, 30, 16
    protos = rng.normal(size=(C, d))
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)
    rows = []
    # prototypes first → vec_id 0..C-1 → they are the IVF centroids
    for c in range(C):
        rows.append((c, [float(x) for x in protos[c]], c))
    vid = C
    truth = {}
    for c in range(C):
        for _ in range(per):
            v = protos[c] + 0.15 * rng.normal(size=d)
            rows.append((vid, [float(x) for x in v], c))
            truth[vid] = c
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )
    cells = {
        r["vec_id"]: r["cell"] for r in similarity.ivf_cells(emb, n_cells=C).collect()
    }
    # cluster purity: members of one planted cluster share a cell
    for c in range(C):
        members = [v for v, cc in truth.items() if cc == c]
        assert len({cells[v] for v in members}) == 1
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_bruteforce(emb, n_queries=10, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_ivf_search(
            emb, n_cells=C, n_queries=10, k=5, n_probe=1
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9


def test_ivf_kmeans_refine_improves_clustering(spark):
    """``refine_iters`` (Lloyd rounds over the seed centroids —
    VERDICT r3 next #6): with NOISY seeds (first C vec_ids are offset
    cluster members, not prototypes), two refinement rounds must
    recover perfect cell purity and improve-or-tie 1-probe recall vs
    the seeded quantizer, while the default (refine_iters=0, the
    driver-gated path) stays untouched."""
    rng = np.random.default_rng(11)
    C, per, d = 4, 25, 16
    protos = rng.normal(size=(C, d))
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)
    rows, truth, vid = [], {}, 0
    for c in range(C):  # noisy seeds first: one per cluster, offset 0.6
        v = protos[c] + 0.6 * rng.normal(size=d)
        rows.append((vid, [float(x) for x in v], c))
        truth[vid] = c
        vid += 1
    for c in range(C):
        for _ in range(per):
            v = protos[c] + 0.15 * rng.normal(size=d)
            rows.append((vid, [float(x) for x in v], c))
            truth[vid] = c
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )

    def purity(ri):
        cells = {
            r["vec_id"]: r["cell"]
            for r in similarity.ivf_cells(emb, n_cells=C, refine_iters=ri).collect()
        }
        ok = 0
        for c in range(C):
            mem = [cells[v] for v, cc in truth.items() if cc == c]
            ok += max(mem.count(x) for x in set(mem))
        return ok / len(truth)

    def recall(ri):
        exact = {}
        for r in similarity.knn_bruteforce(emb, n_queries=8, k=5).collect():
            exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        got = {}
        for r in similarity.ann_ivf_search(
            emb, n_cells=C, n_queries=8, k=5, n_probe=1, refine_iters=ri
        ).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
        return hits / sum(len(v) for v in exact.values())

    p0, p2 = purity(0), purity(2)
    r0, r2 = recall(0), recall(2)
    assert p2 == 1.0  # refined centroids separate the planted clusters
    assert p2 > p0  # strictly better than the noisy seed quantizer
    assert r2 >= r0
    assert r2 >= 0.9  # measured 0.925 vs 0.75 seeded


def test_pii_stats_on_planted_fixture(spark):
    """The PII regexes (zero-match on the synthetic driver corpus) are
    proven here on planted emails / URLs / phone-like strings."""
    rows = [
        (1, "contact alice.smith@example.com or bob@corp.io today"),
        (2, "see https://example.com/page and http://a.b/c for details"),
        (3, "call +1 (555) 123-4567 tomorrow"),
        (4, "perfectly clean text with no personal data at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from linkgraph.pipeline.text import pii_stats

    got = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    assert got[1]["n_emails"] == 2 and got[1]["clean"] is False
    assert got[2]["n_urls"] == 2 and got[2]["clean"] is False
    assert got[3]["n_phones"] == 1 and got[3]["clean"] is False
    assert got[4]["pii_total"] == 0 and got[4]["clean"] is True


def test_contamination_flags_probe_overlap(spark):
    """A doc sharing a probe 3-gram is flagged with the right distinct
    hit count; clean docs stay 0 via the left join."""
    from linkgraph.pipeline.text import CONTAMINATION_PROBES, contamination

    probe = CONTAMINATION_PROBES[0]  # "the fast key order sort" -> 3 grams
    rows = [
        (1, "prefix words " + probe + " suffix words"),
        (2, "nothing shared with any benchmark probe here at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in contamination(docs).collect()}
    assert got[1]["contaminated"] is True and got[1]["n_hits"] == 3
    assert got[2]["contaminated"] is False and got[2]["n_hits"] == 0


def test_stratified_sample_deterministic_and_nested(spark):
    """Hash-threshold sampling: reproducible, respects strata, and
    monotone in the rate (a lower-rate sample is a SUBSET of a
    higher-rate one under the same salt — the property that lets a
    pipeline grow a sample without resampling everything)."""
    from linkgraph.pipeline.sampling import stratified_sample

    docs = spark.createDataFrame(
        [(i, "txt", "en" if i % 2 == 0 else "zh", "s0") for i in range(400)],
        "doc_id long, text string, lang string, source string",
    )
    lo = {r["doc_id"] for r in stratified_sample(docs, {"en": 0.2}).collect()}
    hi = {r["doc_id"] for r in stratified_sample(docs, {"en": 0.6}).collect()}
    again = {r["doc_id"] for r in stratified_sample(docs, {"en": 0.2}).collect()}
    assert lo == again  # deterministic
    assert lo <= hi  # nested samples
    assert all(v % 2 == 0 for v in hi)  # zh has no rate -> dropped
    assert 0.1 < len(lo) / 200 < 0.3 and 0.45 < len(hi) / 200 < 0.75


def test_pack_sequences_invariants(spark):
    """Every doc lands in exactly one bin; no bin exceeds the budget
    unless it holds a single oversized doc; bin ids are a contiguous
    prefix per group; output is deterministic."""
    from linkgraph.pipeline.sampling import pack_sequences

    rows = [(i, " ".join(["w"] * (5 + (i * 37) % 90))) for i in range(120)]
    rows.append((999, " ".join(["w"] * 400)))  # oversized singleton
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    budget = 100
    out = pack_sequences(docs, budget=budget, n_groups=4).collect()
    assert len(out) == len(rows)
    assert len({r["doc_id"] for r in out}) == len(rows)
    fill: dict[tuple, list] = {}
    for r in out:
        fill.setdefault((r["grp"], r["bin"]), []).append(r["n_tokens"])
    for (g, b), sizes in fill.items():
        assert sum(sizes) <= budget or len(sizes) == 1
    for g in {r["grp"] for r in out}:
        bins = sorted({r["bin"] for r in out if r["grp"] == g})
        assert bins == list(range(len(bins)))
    out2 = pack_sequences(docs, budget=budget, n_groups=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_domain_cap_invariants(spark):
    """≤ cap docs per source, deterministic survivor set, ranks are a
    contiguous 1..n prefix per source."""
    from linkgraph.pipeline.sampling import domain_cap

    docs = spark.createDataFrame(
        [(i, "t", "en", f"src{i % 3}") for i in range(40)],
        "doc_id long, text string, lang string, source string",
    )
    out = domain_cap(docs, cap=4).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["rk"])
    for src, rks in by_src.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= 4
    assert len(by_src) == 3
    again = domain_cap(docs, cap=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_vocab_topk_matches_recount(spark):
    """Top-k vocabulary equals a Python recount with the same
    (count desc, token asc) order, and the plan is TakeOrdered (no
    global sort of the vocabulary)."""
    from collections import Counter

    from linkgraph.pipeline.text import vocab_topk

    rows = [(i, "a b c a b a " + ("x " * (i % 3)).strip()) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    df = vocab_topk(docs, k=3)
    got = [(r["tok"], r["n"]) for r in df.collect()]
    cnt = Counter()
    for _, t in rows:
        cnt.update(t.split(" "))
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert got == [(t, int(n)) for t, n in want]
    assert "TakeOrderedAndProject" in df._jdf.queryExecution().executedPlan().toString()


def test_stratified_sample_prunes_text_column(spark, tmp_path):
    """The sampler reads only (doc_id, lang, source) — the parquet
    scan must NOT read the heavy text column (at 100 TB the text bytes
    ARE the corpus; a sampler that reads them to decide keep/drop is
    wrong). Asserted on the physical plan's ReadSchema."""
    from linkgraph.pipeline.sampling import stratified_sample

    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, "some long text " * 10, "en", "s0") for i in range(50)],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(p)
    df = stratified_sample(spark.read.parquet(p), {"en": 0.5})
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("text" not in ln for ln in read_schema)


def test_repetition_ratio_hand_computed(spark):
    """'a b c' repeated 3x: 7 trigrams, 3 distinct → 1 − 3/7; a doc
    too short for a trigram gets ratio 0 via the left join."""
    docs = spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, "x y")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in text.repetition_ratio(docs).collect()}
    assert got[1]["n_grams"] == 7
    assert got[1]["repetition_ratio"] == round(1 - 3 / 7, 6)
    assert got[2]["n_grams"] == 0 and got[2]["repetition_ratio"] == 0.0


def test_unigram_logprob_hand_computed(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "a a"), (2, "a b")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in text.unigram_logprob(docs).collect()}
    # corpus: a=3, b=1, total=4
    assert got[1]["mean_nll"] == round(-math.log(3 / 4), 6)
    assert got[2]["mean_nll"] == round((-math.log(3 / 4) - math.log(1 / 4)) / 2, 6)
    assert got[1]["n_tokens"] == 2


def test_tfidf_top_terms_hand_computed(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["rnk"]): (r["term"], r["tfidf"])
        for r in text.tfidf_top_terms(docs, k=2).collect()
    }
    # N=2; df a=1 b=2 c=1 → doc1: a=2·ln2, b=0; doc2: c=ln2, b=0
    assert got[(1, 1)] == ("a", round(2 * math.log(2), 6))
    assert got[(1, 2)] == ("b", 0.0)
    assert got[(2, 1)] == ("c", round(math.log(2), 6))
    assert got[(2, 2)] == ("b", 0.0)


def test_stratified_sample_empty_rates_drops_all(spark):
    """rates={} means every stratum is unlisted -> empty result (was
    an AttributeError before the r4 review fix)."""
    from linkgraph.pipeline.sampling import stratified_sample

    docs = spark.createDataFrame(
        [(1, "t", "en", "s0")],
        "doc_id long, text string, lang string, source string",
    )
    assert stratified_sample(docs, rates={}).count() == 0


def test_domain_cap_megadomain_prefilter(spark):
    """A planted mega-domain must not reach the ranking window whole:
    the order-preserving hash-bucket pre-filter prunes it to ~cap-ish
    rows, and the capped output is bit-identical to the naive
    window-over-everything formulation."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from linkgraph.pipeline.sampling import _cap_prefilter, _h, domain_cap

    mega_n = 20_000
    rows = [(i, "t", "en", "mega") for i in range(mega_n)]
    rows += [(mega_n + i, "t", "en", f"small{i % 4}") for i in range(40)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    base = docs.select("doc_id", "source").withColumn(
        "_h", _h(F.col("doc_id"), "cap")
    )
    pruned = _cap_prefilter(base, cap=5)
    n_pruned = pruned.where(F.col("source") == "mega").count()
    assert n_pruned < 100  # window input ≪ |domain| (= 20k)
    assert n_pruned >= 5  # but never fewer than the cap itself

    out = sorted(map(tuple, domain_cap(docs, cap=5).collect()))
    w = Window.partitionBy("source").orderBy(_h(F.col("doc_id"), "cap"), "doc_id")
    naive = sorted(
        map(
            tuple,
            docs.select("doc_id", "source")
            .withColumn("rk", F.row_number().over(w).cast("long"))
            .where(F.col("rk") <= 5)
            .collect(),
        )
    )
    assert out == naive


def test_chunk_documents_boundaries(spark):
    """370-char doc at (max_len=200, stride=150): chunks at 0 (200),
    150 (200), 300 (70); 100-char doc → one whole-doc chunk; empty doc
    → no chunks."""
    docs = spark.createDataFrame(
        [(1, "a" * 370), (2, "b" * 100), (3, "")], "doc_id long, text string"
    )
    rows = text.chunk_documents(docs, max_len=200, stride=150).collect()
    got = {(r["doc_id"], r["chunk_id"]): r["chunk_len"] for r in rows}
    assert got == {(1, 0): 200, (1, 1): 200, (1, 2): 70, (2, 0): 100}
    chunks = {r["chunk_id"]: r["chunk"] for r in rows if r["doc_id"] == 1}
    assert chunks[2] == "a" * 70


def test_mixture_weights_hand_computed(spark):
    """Counts en=4, fr=1 → sqrt weights 2 and 1 → 2/3 and 1/3."""
    from linkgraph.pipeline.sampling import mixture_weights

    docs = spark.createDataFrame(
        [(i, "en") for i in range(4)] + [(9, "fr")], "doc_id long, lang string"
    )
    got = {
        r["lang"]: (r["n_docs"], r["mix_weight"])
        for r in mixture_weights(docs).collect()
    }
    assert got == {"en": (4, round(2 / 3, 6)), "fr": (1, round(1 / 3, 6))}


def test_source_lang_entropy_hand_computed(spark):
    """Monolingual source → H=0; a 2:1 en/fr source →
    H = ln3 − (2·ln2)/3."""
    import math

    from linkgraph.pipeline.sampling import source_lang_entropy

    docs = spark.createDataFrame(
        [(1, "a", "en"), (2, "a", "en"), (3, "a", "en"),
         (4, "b", "en"), (5, "b", "en"), (6, "b", "fr")],
        "doc_id long, source string, lang string",
    )
    got = {
        r["source"]: (r["n_docs"], r["n_langs"], r["lang_entropy"])
        for r in source_lang_entropy(docs).collect()
    }
    assert got["a"] == (3, 1, 0.0)
    assert got["b"] == (3, 2, round(math.log(3) - 2 * math.log(2) / 3, 6))


def test_dup_rate_by_source_hand_computed(spark):
    """Source with 3 docs, 2 identical → dup_rate 1/3; all-distinct
    source → 0."""
    from linkgraph.pipeline.dedup import dup_rate_by_source

    docs = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "x"), (3, "a", "y"),
         (4, "b", "p"), (5, "b", "q")],
        "doc_id long, source string, text string",
    )
    got = {
        r["source"]: (r["n_docs"], r["n_distinct"], r["dup_rate"])
        for r in dup_rate_by_source(docs).collect()
    }
    assert got == {"a": (3, 2, round(1 / 3, 6)), "b": (2, 2, 0.0)}
