"""Deduplication operators over the ``documents`` table.

Five dedup families, all Spark-first:

- exact          hash-groupBy on md5(text) — one shuffle
- ngram-jaccard  word-3-gram shingles → shared-shingle pair join →
                 exact Jaccard (integer counts — bit-identical across
                 engines)
- MinHash + LSH  shingle → 16 universal-hash minima → 4 bands × 4 rows
                 → band-bucket join; candidates = pairs sharing ≥1 band
- SimHash        64-bit sign-of-weighted-bit-sums over token hashes;
                 near-dup = small Hamming distance
- embedding      cosine ≥ threshold over the embeddings table (see
                 linkgraph.pipeline.similarity for the kNN machinery)

Token/shingle hashing uses H(s) = int(md5(s)[:8], 16) — computable
identically in Spark (``conv(substring(md5(s),1,8),16,10)``) and DuckDB
(``('0x'||substr(md5(s),1,8))::BIGINT``), so MinHash/SimHash signatures
are engine-exact, not just approximately equal.

Scale shape: shingling is a narrow explode; the pair join is the
classic LSH trick — join on (band, bucket), never all-pairs. The
all-pairs ngram variant is the small-data oracle; production dedup at
10^12 docs goes MinHash→LSH only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from linkgraph.pipeline.text import tokens

NUM_HASHES = 16
NUM_BANDS = 4
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS
MERSENNE = 2147483647  # 2^31 - 1


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact dedup: one row per distinct content hash with the
    canonical (min) doc_id and the duplicate count."""
    return (
        docs.select("doc_id", F.md5(F.col("text")).alias("h"))
        .groupBy("h")
        .agg(
            F.min("doc_id").cast("long").alias("canonical_doc_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
        .select("canonical_doc_id", "n_copies", F.col("h").alias("content_md5"))
    )


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc (lead-window
    construction — identical in the SQL oracle)."""
    toks = tokens(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    sh = toks.select(
        "doc_id", F.concat_ws(" ", *parts).alias("s"), parts[-1].alias("_last")
    ).where(F.col("_last").isNotNull())
    return sh.select("doc_id", "s").distinct()


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.1) -> DataFrame:
    """Exact word-3-gram Jaccard over shared-shingle candidate pairs.
    Jaccard is a ratio of integers — engine-exact; rounded to 6dp for
    output."""
    sh = shingles(docs).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    j = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("c") / (F.col("na") + F.col("nb") - F.col("c")), 6).alias(
                "jaccard"
            ),
        )
    )
    return j.where(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


def _token_hash(col) -> F.Column:
    """H(s) = first 8 hex chars of md5 as integer — engine-portable."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, hash_id, minhash) — 16 universal hashes
    h_i(x) = (a_i·H(x) + b_i) mod (2^31−1), a_i/b_i LCG-derived from i
    (identical constants in the SQL oracle)."""
    # hv reduced mod 2^31-1 BEFORE the multiply so a·hv stays < 2^63
    sh = shingles(docs).select(
        "doc_id", (_token_hash(F.col("s")) % F.lit(MERSENNE)).alias("hv")
    )
    spark = docs.sparkSession
    hashes = spark.range(NUM_HASHES).select(
        F.col("id").alias("hash_id"),
        (F.lit(1103515245) * F.col("id") % F.lit(MERSENNE) + 12345).alias("a"),
        (F.lit(69069) * F.col("id") % F.lit(MERSENNE) + 1).alias("b"),
    )
    return (
        sh.crossJoin(F.broadcast(hashes))
        .select(
            "doc_id",
            "hash_id",
            ((F.col("a") * F.col("hv") + F.col("b")) % F.lit(MERSENNE)).alias("h"),
        )
        .groupBy("doc_id", "hash_id")
        .agg(F.min("h").cast("long").alias("minhash"))
    )


def lsh_buckets(docs: DataFrame) -> DataFrame:
    """Band buckets: (doc_id, band, bucket) where bucket = md5 of the
    band's concatenated minhashes."""
    sig = minhash_signatures(docs)
    banded = sig.withColumn(
        "band", F.floor(F.col("hash_id") / ROWS_PER_BAND).cast("long")
    )
    # bucket = md5 of the band's minhashes in hash_id order (the SQL
    # oracle mirrors with string_agg(... ORDER BY hash_id))
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct("hash_id", "minhash"))),
        lambda x: x["minhash"].cast("string"),
    )
    return banded.groupBy("doc_id", "band").agg(
        F.md5(F.concat_ws(",", ordered)).alias("bucket")
    )


def minhash_lsh_candidates(
    docs: DataFrame, max_bucket_size: int = 1000
) -> DataFrame:
    """Near-dup candidates: pairs sharing ≥1 LSH band bucket, with the
    number of shared bands.

    Mega-bucket guard: a degenerate bucket of B identical-boilerplate
    docs would make the self-join emit B² pairs (quadratic blowup at
    scale). Buckets larger than ``max_bucket_size`` are excluded from
    the pairwise join — a boilerplate cluster that large is exact-dup
    territory and is already collapsed by ``dedup_exact`` (byte-equal
    content hashes into one bucket there at linear cost)."""
    b = lsh_buckets(docs).cache()
    ok = (
        b.groupBy("band", "bucket")
        .agg(F.count("*").alias("bsz"))
        .where(F.col("bsz") <= max_bucket_size)
        .select("band", "bucket")
    )
    b = b.join(ok, ["band", "bucket"], "left_semi")
    a1 = b.alias("x")
    a2 = b.alias("y")
    return (
        a1.join(
            a2,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .groupBy(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("long").alias("shared_bands"))
    )


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash over token hashes: bit b of the signature is 1 iff the
    sum over tokens of (±1 for bit b of H(token)) is positive.

    Single-aggregate formulation (no bit explode, no crossJoin): with
    c_b = #tokens whose bit b is set and n = #tokens, the ±1 sum is
    2·c_b − n, so bit b of the signature is (2·c_b > n). One groupBy
    with ``bits`` literal-shift counters — the token rows are scanned
    once instead of ``bits`` times. Output identical to the explicit
    ±1 formulation (the DuckDB oracle still uses that one)."""
    toks = tokens(docs).select("doc_id", _token_hash(F.col("tok")).alias("hv"))
    counts = toks.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.shiftright(F.col("hv"), b).bitwiseAND(F.lit(1))).alias(f"c{b}")
            for b in range(bits)
        ],
    )
    sig = None
    for b in range(bits):
        term = F.when(
            F.lit(2) * F.col(f"c{b}") > F.col("n"), F.lit(1 << b)
        ).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return counts.select("doc_id", sig.cast("long").alias("simhash"))


def embedding_dup_pairs(embeddings: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Embedding near-dup pairs by cosine ≥ threshold (brute-force
    all-pairs — the oracle path; production uses the LSH-bucketed ANN
    in linkgraph.pipeline.similarity)."""
    from linkgraph.pipeline.similarity import cosine_pairs

    p = cosine_pairs(embeddings, embeddings)
    return (
        p.where((F.col("a") < F.col("b")) & (F.col("cos") >= threshold))
        .select(
            F.col("a").alias("vec_a"),
            F.col("b").alias("vec_b"),
            F.round("cos", 4).alias("cosine"),
        )
    )


def dedup_clusters(
    docs: DataFrame, max_bucket_size: int = 1000, cc_iterations: int = 6
) -> DataFrame:
    """Duplicate CLUSTERS: connected components over the MinHash-LSH
    candidate-pair graph → one ``cluster_id`` per document (singletons
    keep their own id). This is the production dedup shape at 100 TB —
    candidate pairs are transitive ("A dups B dups C" must collapse to
    ONE survivor group, which pairwise output alone can't express) —
    and it composes the engine's two halves: the LSH pipeline emits an
    edge list, the graph engine's hash-min CC
    (``linkgraph.algos.cc.connected_components``) labels it. Fixed
    round count keeps the result identical to the unrolled SQL oracle;
    near-dup clusters have tiny diameter, so 6 rounds converge."""
    from linkgraph.algos.cc import connected_components

    pairs = minhash_lsh_candidates(docs, max_bucket_size)
    e = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = connected_components(e, fixed_iterations=cc_iterations)
    return (
        docs.select("doc_id")
        .join(
            comp.select(F.col("vid").alias("doc_id"), "component"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).cast("long").alias("cluster_id"),
        )
    )


def dup_rate_by_source(docs: DataFrame) -> DataFrame:
    """Per-source exact-duplicate rate — the contamination dashboard
    row a corpus run logs per domain: docs, distinct contents, and
    1 − distinct/docs. Integer counts until the one final division.

    Scale shape: one groupBy(source) with a count-distinct (Spark
    expands it to the standard two-phase partial aggregate keyed on
    (source, hash)); no windows, no driver state."""
    return docs.select("source", F.md5(F.col("text")).alias("h")).groupBy(
        "source"
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("h").cast("long").alias("n_distinct"),
        F.round(
            F.lit(1.0)
            - F.try_divide(F.countDistinct("h"), F.count("*")),
            6,
        ).alias("dup_rate"),
    )


def dup_ngram_coverage(docs: DataFrame, n: int = 3) -> DataFrame:
    """Per-document cross-corpus n-gram duplication coverage: of the
    document's distinct word n-grams, what fraction also appears in at
    least one OTHER document. The RefinedWeb/Gopher-style
    memorization-risk signal — exact-dup and near-dup filters miss
    partially-copied boilerplate, which this surfaces directly.

    Scale shape: the shingle substrate is the proven MinHash one
    (distinct shingles per doc); the corpus-wide shingle document-
    frequency is a single hash aggregate keyed on the shingle, and the
    join back to the per-doc shingles is co-partitioned on that same
    key — two shuffles total, no windows over unbounded groups, no
    driver state. Docs too short to have an n-gram keep a row with
    zero shingles (ratio NULL) so the output is total over documents.
    """
    sh = shingles(docs, n)
    df = sh.groupBy("s").agg(F.count("*").cast("long").alias("ndocs"))
    per_doc = (
        sh.join(df, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("ndocs") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_shared"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            F.round(F.try_divide(F.col("n_shared"), F.col("n_shingles")), 6).alias(
                "shared_ratio"
            ),
        )
    )


def dedup_canonical(docs: DataFrame) -> DataFrame:
    """Survivor selection — the step that turns duplicate CLUSTERS into
    an actual deduplicated corpus: one canonical document per cluster,
    chosen as the longest (``n_chars``, ties to the smallest
    ``doc_id``). Emits the per-cluster audit row (survivor, cluster
    size, docs dropped); the production variant joins the survivor ids
    back to the corpus as the keep-list.

    Scale shape: composes the driver-gated ``dedup_clusters`` with one
    MAX-of-struct aggregate per cluster — partial aggregation collapses
    each map task to one candidate row per cluster before the shuffle
    (no per-cluster window, no skew on mega-clusters).
    """
    cl = dedup_clusters(docs)
    joined = cl.join(docs.select("doc_id", "n_chars"), "doc_id")
    agg = joined.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("cluster_size"),
        F.max(
            F.struct(
                F.col("n_chars").alias("len"),
                (-F.col("doc_id")).alias("neg_id"),
                F.col("doc_id").alias("d"),
            )
        ).alias("best"),
    )
    return agg.select(
        "cluster_id",
        F.col("best.d").cast("long").alias("survivor_doc_id"),
        "cluster_size",
        (F.col("cluster_size") - 1).cast("long").alias("n_dropped"),
    )
