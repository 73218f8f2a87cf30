"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline surface (token counting, quality scoring,
language-ID heuristic, fingerprinting).

All pure column expressions / window functions (JVM-side, codegen) —
no Python in the hot path. Each has an exact DuckDB oracle
(``linkgraph.oracle.pipeline_sql``); integer-arithmetic or rounded
outputs so Spark and DuckDB hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# deterministic language marker words (shared with the SQL oracle);
# the heuristic is the operator under test, not a production lang-id
LANG_MARKERS = {
    "en": ["the", "a"],
    "es": ["el", "la"],
    "de": ["der", "und"],
    "fr": ["le", "et"],
    "zh": ["de5", "shi4"],
}


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def tokens(docs: DataFrame) -> DataFrame:
    """1-based positional tokens (whitespace split) — the shared
    shingling substrate."""
    t = docs.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    return t.select(
        "doc_id", F.posexplode("t").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + a BPE-ish pre-tokenizer count
    (words-or-single-punctuation runs, the GPT-2 pre-tokenizer's
    coarse shape — ``\\w+|[^\\w\\s]`` is Java/RE2/DuckDB-portable on
    this ASCII corpus) + measured chars. Both counts are JVM regex
    column expressions — no UDF."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"\w+|[^\w\s]"))
        .cast("long")
        .alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length / mean-token-length / stopword-ratio features + a simple
    keep/drop quality flag (C4-style heuristics, arithmetic only)."""
    toks = tokens(docs)
    stop = F.col("tok").isin("the", "a", "of", "and")
    agg = toks.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.avg(F.length("tok")).alias("_mean_raw"),
        F.round(
            F.sum(stop.cast("int")) / F.count("*"), 6
        ).alias("stopword_ratio"),
    )
    # the keep flag thresholds the UNROUNDED mean (the oracle compares
    # avg(length(tok)) unrounded too — rounding first could flip the
    # flag on exactly one engine for boundary values); the rounded
    # column is display/compare-only
    return agg.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("_mean_raw"), 6).alias("mean_token_len"),
        "stopword_ratio",
        (
            (F.col("n_tokens") >= 10)
            & (F.col("_mean_raw") >= 2.0)
            & (F.col("_mean_raw") <= 12.0)
        ).alias("quality_keep"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language guess: argmax over per-language marker hit
    counts, ties → lexicographically smallest code, no hits → 'und'."""
    toks = tokens(docs)
    scores = None
    for code, markers in sorted(LANG_MARKERS.items()):
        s = toks.groupBy("doc_id").agg(
            F.sum(F.col("tok").isin(*markers).cast("long")).alias("hits")
        ).select("doc_id", F.lit(code).alias("code"), "hits")
        scores = s if scores is None else scores.unionByName(s)
    w = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("code"))
    best = (
        scores.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.when(F.col("hits") > 0, F.col("code")).otherwise("und").alias(
                "lang_pred"
            ),
            F.col("hits").cast("long").alias("marker_hits"),
        )
    )
    return best


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of the normalized text (lower + trim)
    plus a 16-hex-char short form — the dedup key substrate."""
    norm = F.lower(F.trim(F.col("text")))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.substring(F.md5(norm), 1, 16).alias("fingerprint16"),
    )


# PII regexes — identical semantics under Java regex (Spark) and RE2
# (DuckDB): plain char classes + bounded quantifiers only, no
# lookaround, no shorthand classes that differ across dialects.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PII_URL = "https?://[^ ]+"
PII_PHONE = "[+][0-9][0-9() -]{7,}[0-9]"


def pii_stats(docs: DataFrame) -> DataFrame:
    """Per-document PII / leakage counters (emails, URLs, phone-like
    strings) + a ``clean`` flag — the filter a training pipeline runs
    before anything else. Pure JVM ``regexp_count`` column expressions
    (codegen, no Python); scale shape is a narrow map over the corpus.
    The synthetic driver corpus contains no PII, so the driver gate
    exercises the zero-match path; the regexes themselves are proven on
    a planted fixture (tests/test_pipeline.py)."""
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(PII_URL)).cast("long").alias("n_urls"),
        F.regexp_count(F.col("text"), F.lit(PII_PHONE)).cast("long").alias("n_phones"),
    ).withColumn(
        "pii_total",
        (F.col("n_emails") + F.col("n_urls") + F.col("n_phones")).cast("long"),
    ).withColumn("clean", F.col("pii_total") == 0)


# Fixed decontamination probe set (an "eval benchmark" stand-in): the
# operator flags training documents sharing any word-3-gram with a
# probe. Shared verbatim with the SQL oracle.
CONTAMINATION_PROBES = [
    "the fast key order sort",
    "batch batch batch stream",
    "join order batch",
    "slow small filter customer line",
]


def contamination(docs: DataFrame, probes: list[str] | None = None) -> DataFrame:
    """Benchmark-decontamination check: for each document, how many
    DISTINCT probe 3-grams its word-3-gram shingle set contains
    (``n_hits``) and a ``contaminated`` flag. The probe set is
    exploded into its own 3-grams, broadcast (eval benchmarks are tiny
    next to a 100 TB corpus), and joined against the per-doc shingle
    set — a broadcast semi-join on the shingle string, never a scan of
    doc×probe pairs. Docs with zero hits are kept via a left join so
    the output covers the corpus (the decision table a filter step
    consumes)."""
    from linkgraph.pipeline.dedup import shingles

    spark = docs.sparkSession
    probes = CONTAMINATION_PROBES if probes is None else probes
    pdf = spark.createDataFrame([(p,) for p in probes], "p string")
    ptoks = pdf.select(F.posexplode(F.split("p", " ")).alias("pos0", "tok"),
                       F.col("p"))
    w = Window.partitionBy("p").orderBy("pos0")
    pgrams = (
        ptoks.select(
            F.concat_ws(
                " ", F.col("tok"), F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
            ).alias("s"),
            F.lead("tok", 2).over(w).alias("_last"),
        )
        .where(F.col("_last").isNotNull())
        .select("s")
        .distinct()
    )
    hits = (
        shingles(docs)
        .join(F.broadcast(pgrams), "s")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def vocab_topk(docs: DataFrame, k: int = 50) -> DataFrame:
    """Corpus vocabulary head: top-k tokens by frequency (count desc,
    token asc — deterministic). The substrate for tokenizer/BPE
    training and stopword induction. groupBy partial-aggregates
    map-side, and the top-k is orderBy().limit() — Spark plans
    TakeOrderedAndProject, never a global sort of the vocabulary."""
    return (
        tokens(docs)
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(k)
    )


def repetition_ratio(docs: DataFrame) -> DataFrame:
    """Within-document repetition (the Gopher/C4 quality rule family):
    1 − distinct 3-grams / total 3-grams, rounded 6dp — high values
    mean boilerplate/looping text. One shingle explode + two counts per
    doc; docs shorter than one 3-gram get ratio 0.0 via the left join."""
    toks = tokens(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    tri = toks.select(
        "doc_id",
        F.concat_ws(
            " ", F.col("tok"), F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
        ).alias("s"),
        F.lead("tok", 2).over(w).alias("_last"),
    ).where(F.col("_last").isNotNull())
    per = tri.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_grams"),
        F.countDistinct("s").cast("long").alias("n_distinct"),
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.round(
                F.lit(1.0)
                - F.coalesce(
                    F.try_divide(F.col("n_distinct"), F.col("n_grams")), F.lit(1.0)
                ),
                6,
            ).alias("repetition_ratio"),
        )
    )


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Corpus-unigram surprisal score: mean −ln p(token) per document,
    p from the corpus's own token frequencies (add-nothing MLE — every
    token is in-vocabulary by construction). The cheap perplexity-ish
    quality signal: low = stereotyped text, high = rare-token soup.
    Two aggregates (vocab counts, then per-doc mean over a broadcast-
    joinable vocab), rounded 6dp."""
    # cache: the token explode feeds three jobs (total count, vocab
    # aggregate, per-doc score join) — without it each re-scans and
    # re-splits the full corpus
    toks = tokens(docs).cache()
    total = toks.count()
    vocab = toks.groupBy("tok").agg(F.count("*").cast("long").alias("cnt"))
    scored = toks.join(vocab, "tok").select(
        "doc_id",
        (-F.log(F.col("cnt") / F.lit(float(total)))).alias("nll"),
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.avg("nll"), 6).alias("mean_nll"),
        F.count("*").cast("long").alias("n_tokens"),
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document (tf · ln(N/df), rounded 6dp;
    ties → term asc) — the retrieval/keyword substrate. Term counts
    and document frequencies are two grouped aggregates; the df table
    is vocabulary-sized (broadcast-joinable at corpus scale)."""
    n_docs = docs.select("doc_id").distinct().count()
    # cache the per-doc term counts: they feed both the df aggregate
    # and the scoring join
    tf = tokens(docs).groupBy("doc_id", "tok").agg(
        F.count("*").cast("long").alias("tf")
    ).cache()
    df_ = tf.groupBy("tok").agg(F.count("*").cast("long").alias("df"))
    scored = tf.join(df_, "tok").select(
        "doc_id",
        F.col("tok").alias("term"),
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("doc_id", "term", "tfidf", "rnk")
    )


def chunk_documents(
    docs: DataFrame, max_len: int = 200, stride: int = 150
) -> DataFrame:
    """Split each document into overlapping character windows
    (training-sequence chunking: window ``max_len`` chars, hop
    ``stride``). Returns ``(doc_id, chunk_id, chunk, chunk_len)`` —
    chunk k covers [k*stride, k*stride + max_len).

    Pure JVM expressions: a per-doc ``sequence`` of window indices
    (bounded by doc length — no skew), explode, substring. At corpus
    scale this is the standard pre-tokenization sharding step; output
    row count is ~n_chars/stride per doc, a constant factor of the
    scan."""
    n = F.length("text")
    ks = F.sequence(F.lit(0), F.floor((n - F.lit(1)) / F.lit(stride)))
    return (
        docs.where(n > 0)
        .select("doc_id", F.explode(ks).alias("k"), "text")
        .select(
            "doc_id",
            F.col("k").cast("long").alias("chunk_id"),
            F.expr(f"substring(text, k * {stride} + 1, {max_len})").alias(
                "chunk"
            ),
        )
        .withColumn("chunk_len", F.length("chunk").cast("long"))
    )


def bigram_logprob(docs: DataFrame) -> DataFrame:
    """Corpus-bigram surprisal: mean −ln p(w2|w1) per document, with
    the conditional MLE from the corpus's own bigram table (every
    bigram is in-vocabulary by construction, so no smoothing — the
    companion signal to ``unigram_logprob`` that actually notices word
    ORDER: shuffled boilerplate scores high here while its unigram
    surprisal is unchanged).

    Scale shape: the bigram construction is a per-doc lead window
    (bounded by document length), then two hash aggregates — the
    bigram table keyed on (w1, w2) and its w1 margin — and joins back
    co-partitioned on those keys. Per-doc fold at the end. No driver
    state, no unbounded windows.
    """
    toks = tokens(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        toks.select(
            "doc_id",
            F.col("tok").alias("w1"),
            F.lead("tok", 1).over(w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
        .cache()
    )
    c2 = big.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    scored = big.join(c2, ["w1", "w2"]).join(c1, "w1").select(
        "doc_id", (-F.log(F.col("c2") / F.col("c1"))).alias("nll")
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.avg("nll"), 6).alias("mean_bigram_nll"),
        F.count("*").cast("long").alias("n_bigrams"),
    )


def quality_by_source(docs: DataFrame) -> DataFrame:
    """Per-source quality dashboard — the row a corpus curation run
    logs per domain before choosing mixture weights: docs, docs
    passing the quality gate, keep rate, and the mean per-doc token
    count. Stacks one source-keyed aggregate on the driver-gated
    ``quality_scores`` (integer tallies until the two final
    divisions)."""
    q = quality_scores(docs).join(docs.select("doc_id", "source"), "doc_id")
    return q.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("quality_keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_keep"),
        F.round(
            F.sum(F.when(F.col("quality_keep"), 1).otherwise(0)) / F.count("*"), 6
        ).alias("keep_rate"),
        F.round(F.avg("n_tokens"), 6).alias("mean_tokens"),
    )


LENGTH_QUANTILES = (25, 50, 75, 90, 99)


def doc_length_quantiles(docs: DataFrame) -> DataFrame:
    """Exact nearest-rank percentiles of the per-document token count —
    the length-distribution readout that sizes sequence-packing bins
    and chunking strides before a corpus run. Same integer rank
    arithmetic as the graph-side ``degree_quantiles``
    (ceil(q·n/100) = (q·n+99) div 100): the cumulative window runs
    over the LENGTH HISTOGRAM (≤ #distinct lengths rows), never over
    documents."""
    from pyspark.sql import Window

    lens = docs.select(
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    hist = lens.groupBy("n_tokens").agg(F.count("*").cast("long").alias("cnt"))
    w = Window.orderBy("n_tokens").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "n_tokens",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy("n_tokens").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    qs = docs.sparkSession.createDataFrame(
        [(q,) for q in LENGTH_QUANTILES], "q long"
    )
    return (
        qs.crossJoin(cum)
        .where(F.col("cum") >= F.expr("(q * n + 99) div 100"))
        .groupBy("q")
        .agg(F.min("n_tokens").cast("long").alias("n_tokens"))
    )
