"""Corpus sampling + sequence packing — the mixture-control and
batch-shaping steps of a training-data pipeline.

- ``stratified_sample``: deterministic per-stratum rate sampling (the
  data-mixture knob: "keep 50% of en, 20% of zh, ..."). Keep decision
  is a pure function of (doc_id, salt) via the engine-portable md5
  hash (identical arithmetic in DuckDB — see
  linkgraph.pipeline.dedup's hashing note), so the sample is
  reproducible across engines, runs, AND cluster sizes — no RNG state,
  no per-partition seeds. Scale shape: narrow map + broadcast rate
  table; zero shuffles.

- ``pack_sequences``: greedy first-fit packing of documents into
  fixed token-budget bins (context-window packing). Documents are hash-
  routed to ``n_groups`` independent packers (deterministic xx-style
  md5 groups, same trick as the chunked partitioners), each group
  packs its stream in (hash, doc_id) order with a sequential greedy
  rule inside one ``applyInPandas`` task. Sequential-per-group like
  the reference's streaming partitioners, so it driver-gates against a
  pure-Python replay (linkgraph/oracle/pipeline_sql.py). Scale shape:
  one shuffle to group, O(group) memory per task, bins never cross
  groups (n_groups scales with the cluster; packing quality is
  per-group local, which is exactly how production packers shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SAMPLE_MOD = 1_000_000
# default mixture: per-lang keep rates (driver-gated configuration)
DEFAULT_RATES = {"en": 0.5, "de": 0.25, "es": 0.25, "fr": 0.25, "zh": 0.1}
PACK_BUDGET = 256
PACK_GROUPS = 8


def _h(col, salt: str):
    """Engine-portable hash: int(md5(f"{v}:{salt}")[:8], 16)."""
    s = F.concat(col.cast("string"), F.lit(":" + salt))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float] | None = None,
    salt: str = "strat",
) -> DataFrame:
    """Keep each doc iff H(doc_id, salt) mod 1e6 < rate[lang]·1e6 —
    DataFrame[doc_id, lang, source]. Unlisted strata drop (rate 0)."""
    rates = DEFAULT_RATES if rates is None else rates
    expr = None
    for lang, r in sorted(rates.items()):
        t = F.lit(int(r * SAMPLE_MOD))
        expr = F.when(F.col("lang") == lang, t) if expr is None else expr.when(
            F.col("lang") == lang, t
        )
    # empty mixture: every stratum is unlisted -> rate 0 -> drop all
    thr = F.lit(0) if expr is None else expr.otherwise(F.lit(0))
    return (
        docs.select("doc_id", "lang", "source")
        .where(F.pmod(_h(F.col("doc_id"), salt), F.lit(SAMPLE_MOD)) < thr)
    )


def sample_rates_realized(
    docs: DataFrame, rates: dict[str, float] | None = None
) -> DataFrame:
    """Per-stratum total/kept/realized-rate audit table (6dp) — the
    mixture report a pipeline logs next to the sample."""
    rates = DEFAULT_RATES if rates is None else rates
    kept = stratified_sample(docs, rates).groupBy("lang").agg(
        F.count("*").cast("long").alias("n_kept")
    )
    tot = docs.groupBy("lang").agg(F.count("*").cast("long").alias("n_total"))
    return (
        tot.join(kept, "lang", "left")
        .select(
            "lang",
            "n_total",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.round(
                F.coalesce("n_kept", F.lit(0)) / F.col("n_total"), 6
            ).alias("realized_rate"),
        )
    )


def greedy_bins(sizes, budget: int) -> list[int]:
    """The sequential greedy rule shared by the Spark packer and the
    replay oracle: walk sizes in order; a doc that would overflow the
    running bin closes it (oversized docs get a bin of their own).
    Returns the bin id per position."""
    bins = []
    running = 0
    b = 0
    for n in sizes:
        if running + n > budget and running > 0:
            b += 1
            running = 0
        bins.append(b)
        running += n
    return bins


def pack_sequences(
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    n_groups: int = PACK_GROUPS,
) -> DataFrame:
    """Greedy token-budget packing → DataFrame[doc_id, grp, bin,
    n_tokens]. Within each hash group, docs are processed in
    (H(doc_id,'ord'), doc_id) order; a doc that would overflow the
    running bin closes it and starts the next (oversized docs get a
    bin of their own). Deterministic: group routing, order, and the
    greedy rule are all pure functions of doc_id and the token count.
    """
    import pandas as pd

    sized = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.pmod(_h(F.col("doc_id"), "grp"), F.lit(n_groups)).alias("grp"),
        _h(F.col("doc_id"), "ord").alias("_ord"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_ord", "doc_id"])
        bins = greedy_bins(pdf["n_tokens"], budget)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "grp": pdf["grp"].to_numpy(),
                "bin": bins,
                "n_tokens": pdf["n_tokens"].to_numpy(),
            }
        )

    return sized.groupBy("grp").applyInPandas(
        pack, schema="doc_id long, grp long, bin long, n_tokens long"
    )


CAP_PREFILTER_BUCKETS = 65_536  # 2^16 order-preserving hash buckets


def _cap_prefilter(
    base: DataFrame, cap: int, buckets: int = CAP_PREFILTER_BUCKETS
) -> DataFrame:
    """Exact-safe skew pre-filter for the per-source TopK (the
    ne.py:244 cnt-threshold pattern, fully distributed here). The md5
    hash is uniform on [0, 2^32); bucket = h div (2^32/buckets) is
    order-preserving (b1 < b2 ⇒ h1 < h2). From a per-(source, bucket)
    histogram (≤ ``buckets`` rows per source — the cumulative window
    is tiny) find each source's first bucket where the cumulative
    count reaches ``cap``: a row in a strictly later bucket has ≥ cap
    rows with strictly smaller hash ahead of it, so it can never rank
    ≤ cap — dropping it before the ranking window changes nothing
    (ties at the threshold bucket still compete inside the window).
    A 10^9-doc mega-domain's window input shrinks from 10^9 rows to
    ~|domain|/buckets — bounded task size, bit-identical output."""
    from pyspark.sql import Window

    width = (1 << 32) // buckets
    bucketed = base.withColumn("_b", (F.col("_h") / F.lit(width)).cast("long"))
    wb = Window.partitionBy("source").orderBy("_b")
    thr = (
        bucketed.groupBy("source", "_b")
        .agg(F.count("*").alias("_n"))
        .withColumn("_cum", F.sum("_n").over(wb))
        .groupBy("source")
        .agg(
            F.coalesce(
                F.min(F.when(F.col("_cum") >= cap, F.col("_b"))),
                F.lit(buckets),
            ).alias("_thr")
        )
    )
    return (
        bucketed.join(thr, "source")
        .where(F.col("_b") <= F.col("_thr"))
        .drop("_b", "_thr")
    )


def domain_cap(docs: DataFrame, cap: int = 5, salt: str = "cap") -> DataFrame:
    """At most ``cap`` documents per source domain — the anti-
    overrepresentation step (a crawl's mega-domains would otherwise
    dominate the mixture). Which docs survive is deterministic: rank
    within each source by (H(doc_id, salt), doc_id) and keep rank ≤
    cap — a seeded uniform choice that reproduces across engines and
    cluster sizes. One shuffle keyed by source; a mega-domain never
    serializes through one task because ``_cap_prefilter`` prunes the
    window input to ~cap-ish rows per source first (exact — see its
    docstring)."""
    from pyspark.sql import Window

    base = docs.select("doc_id", "source").withColumn(
        "_h", _h(F.col("doc_id"), salt)
    )
    pruned = _cap_prefilter(base, cap)
    w = Window.partitionBy("source").orderBy("_h", "doc_id")
    return (
        pruned.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= cap)
        .select("doc_id", "source", "rk")
    )


def mixture_weights(docs: DataFrame) -> DataFrame:
    """Temperature-scaled (α = 0.5) language mixture weights for
    dataset mixing: weight_l ∝ sqrt(n_l), normalized. sqrt instead of
    a general pow keeps the math IEEE-identical across engines
    (correctly-rounded sqrt of identical doubles; pow is NOT
    cross-engine safe), and the normalizing total is a fixed-order
    window sum over the (tiny) per-language table so the float
    reduction order is pinned on both sides. Returns
    ``(lang, n_docs, mix_weight)``."""
    from pyspark.sql import Window

    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    w = Window.orderBy("lang").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return counts.select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(
            F.sqrt("n_docs") / F.sum(F.sqrt("n_docs")).over(w), 6
        ).alias("mix_weight"),
    )


def source_lang_entropy(docs: DataFrame) -> DataFrame:
    """Per-source Shannon entropy (nats) of the language mix — the
    mixture-diagnostics readout next to ``mixture_weights``: 0 for a
    monolingual domain, ln(n_langs) for a uniform mix. Integer counts
    feed H = ln(t) − Σ c·ln(c)/t in one pass; the ln sum has
    ≤ n_langs terms per source (a handful), so the 6-decimal rounding
    is reduction-order-stable cross-engine.

    Scale shape: two stacked partial-aggregated groupBys — the
    (source, lang) tally collapses map-side; no windows."""
    per = docs.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("c")
    )
    return per.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_langs"),
        F.round(
            F.log(F.sum("c").cast("double"))
            - F.try_divide(
                F.sum(F.col("c") * F.log(F.col("c").cast("double"))),
                F.sum("c"),
            ),
            6,
        ).alias("lang_entropy"),
    )
