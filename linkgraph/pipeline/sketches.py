"""Deterministic cardinality / frequency sketches with built-in
accuracy audits.

At 100 TB you cannot afford exact DISTINCT or exact per-token counts
for monitoring dashboards; the standard tools are HyperLogLog
(distinct counts) and Count-Min (frequency estimates). Spark's
``approx_count_distinct`` is a black box whose register layout can't
be reproduced in an external oracle, so these are re-expressed from
first principles over the engine-portable md5-prefix hash
(``linkgraph.hashing``): every register value, bucket count, and the
final estimate are bit-reproducible in DuckDB SQL, which is what
makes the sketches *driver-gatable* rather than tolerance-checked.

Both operators deliberately emit the exact answer next to the sketch
estimate: at small SF the gate pins the arithmetic, at 100 TB the
same query (minus the exact column) is the production dashboard.

Reference parity: GraphPartitioners keeps only exact counters
(``utils/util.cpp`` degree tallies); sketches are part of the
beyond-reference training-data layer (SURVEY.md §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.hashing import md5_prefix_hash

# HyperLogLog geometry: m = 2^P registers. P=6 keeps the register
# table tiny (64 rows/group) while giving ~13% standard error —
# the audit column shows the realized error. ALPHA is the standard
# bias constant for m=64 (Flajolet et al. 2007, Fig. 3).
HLL_P = 6
HLL_M = 1 << HLL_P
HLL_ALPHA = 0.709
# the md5-prefix hash is uniform on [0, 2^32); after the P bucket
# bits, 32-P=26 bits remain for the rank (leading-zero) geometric
_REST_BITS = 32 - HLL_P

# Count-Min geometry: D independent hash rows x W buckets. W=128 on a
# vocabulary of ~100 distinct tokens makes collisions rare but not
# absent — the overcount column is the point of the audit.
CMS_D = 3
CMS_W = 128
CMS_TOP = 10


def hll_distinct(docs: DataFrame, group_col: str = "source") -> DataFrame:
    """Per-group HyperLogLog distinct-``text`` estimate, with the
    exact distinct count and realized relative error alongside.

    Shape: one narrow map (hash -> bucket/rank), one
    (group, bucket) MAX aggregate (64 rows per group regardless of
    input size — this is the whole point of HLL), one per-group
    fold. All shuffles are on the group key; register values are
    integers, so the only float math is the final fold.

    The rank uses ``27 - length(bin(rest))`` instead of
    ``floor(log2)`` — integer-exact and engine-portable (Spark and
    DuckDB ``bin()`` both print minimal binary digits).
    """
    h = md5_prefix_hash(F.col("text"))
    rows = docs.select(
        F.col(group_col).alias("grp"),
        "text",
        (h % HLL_M).alias("bucket"),
        (h / F.lit(HLL_M)).cast("long").alias("rest"),
    )
    regs = (
        rows.withColumn(
            "rho",
            F.when(F.col("rest") == 0, F.lit(_REST_BITS + 1)).otherwise(
                F.lit(_REST_BITS + 1) - F.length(F.bin(F.col("rest")))
            ),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("mj"))
    )
    folded = regs.groupBy("grp").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mj"))).alias("z_present"),
        F.count("*").alias("k"),
    )
    exact = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("text").cast("long").alias("exact_distinct"),
    )
    m = float(HLL_M)
    est_raw = F.lit(HLL_ALPHA * m * m) / (
        F.col("z_present") + (F.lit(m) - F.col("k"))
    )
    v_empty = F.lit(m) - F.col("k")
    # small-range (linear counting) correction, standard HLL
    est = F.when(
        (est_raw <= F.lit(2.5 * m)) & (v_empty > 0),
        F.lit(m) * F.log(F.lit(m) / v_empty),
    ).otherwise(est_raw)
    return (
        folded.join(exact, "grp")
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "exact_distinct",
            F.round(est, 6).alias("hll_estimate"),
            F.round(
                (est - F.col("exact_distinct")) / F.col("exact_distinct"), 6
            ).alias("rel_err"),
        )
    )


def heavy_hitters_cms(docs: DataFrame, top: int = CMS_TOP) -> DataFrame:
    """Count-Min-sketch frequency estimates for the corpus's true
    top-``top`` tokens, with exact counts and the sketch's overcount.

    The sketch table is D x W = 384 cells total — constant size in the
    corpus, built with one token aggregate re-used across the D rows
    (the per-row bucket is a column expression over the exact token
    counts, not a second scan). Estimate = min over rows of the cell
    sum; CMS never undercounts, so ``overcount >= 0`` is an invariant
    the test asserts.
    """
    from linkgraph.pipeline.text import tokens

    # localCheckpoint, not cache: referenced 2·D+1 times below, so it
    # must be materialized once — but a cache() here is never
    # unpersisted and retains executor storage for the whole session
    # (round-5 advice); checkpoint blocks are freed by the context
    # cleaner once the result is materialized and dereferenced.
    tok_cnt = (
        tokens(docs)
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("exact_cnt"))
        .localCheckpoint()
    )
    # D hash rows over the token *vocabulary* (cell contents sum the
    # exact occurrence counts of every token landing in the cell)
    rows = None
    for i in range(CMS_D):
        r = tok_cnt.select(
            F.lit(i).alias("row"),
            (md5_prefix_hash(F.lit(str(i)), F.col("tok")) % CMS_W).alias("bucket"),
            "tok",
            "exact_cnt",
        )
        rows = r if rows is None else rows.unionAll(r)
    cells = rows.groupBy("row", "bucket").agg(
        F.sum("exact_cnt").cast("long").alias("cell_sum")
    )
    heads = tok_cnt.orderBy(F.col("exact_cnt").desc(), F.col("tok").asc()).limit(top)
    probes = None
    for i in range(CMS_D):
        p = heads.select(
            "tok",
            "exact_cnt",
            F.lit(i).alias("row"),
            (md5_prefix_hash(F.lit(str(i)), F.col("tok")) % CMS_W).alias("bucket"),
        )
        probes = p if probes is None else probes.unionAll(p)
    est = (
        probes.join(F.broadcast(cells), ["row", "bucket"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("cell_sum").cast("long").alias("cms_estimate"))
    )
    return est.select(
        "tok",
        "exact_cnt",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_cnt")).cast("long").alias("overcount"),
    )


# Bloom geometry: m bits, k hashes. m=1024 on a ~500-doc corpus gives
# a low-but-nonzero FP rate — the audit column is the point.
BLOOM_M = 1024
BLOOM_K = 4
BLOOM_PRESENT_PROBES = 8
BLOOM_ABSENT_PROBES = 8


def bloom_membership(docs: DataFrame) -> DataFrame:
    """Bloom-filter membership audit — the shuffle-free pre-filter a
    100 TB dedup/decontamination pass runs BEFORE any join: build an
    m-bit filter over the corpus texts (k portable md5-prefix hashes
    per text), then test a probe set (known-present texts + synthetic
    absent ones) and emit, per probe, the filter verdict next to exact
    membership and the false-positive flag. Blooms never produce
    false NEGATIVES — the invariant the test pins; the gate pins every
    bit position cross-engine.

    Shape: the filter is ≤m distinct ints (broadcastable at any corpus
    size — that's the point of a Bloom filter); building it is one
    narrow map + distinct; probing is a broadcast join.
    """
    spark = docs.sparkSession
    bits = None
    for i in range(BLOOM_K):
        b = docs.select(
            (md5_prefix_hash(F.lit(f"bloom{i}"), F.col("text")) % BLOOM_M).alias(
                "pos"
            )
        )
        bits = b if bits is None else bits.unionAll(b)
    bits = bits.distinct()
    present = (
        docs.orderBy("doc_id")
        .limit(BLOOM_PRESENT_PROBES)
        .select(F.col("doc_id").cast("long").alias("probe_id"), "text")
    )
    absent = spark.createDataFrame(
        [(100000 + j, f"absent probe {j} xyzzy") for j in range(BLOOM_ABSENT_PROBES)],
        "probe_id long, text string",
    )
    probes = present.unionByName(absent)
    ppos = None
    for i in range(BLOOM_K):
        p = probes.select(
            "probe_id",
            (md5_prefix_hash(F.lit(f"bloom{i}"), F.col("text")) % BLOOM_M).alias(
                "pos"
            ),
        )
        ppos = p if ppos is None else ppos.unionAll(p)
    hits = (
        ppos.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("probe_id")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).alias("nhit"))
    )
    exact = probes.join(
        docs.select("text").distinct().withColumn("present0", F.lit(True)),
        "text",
        "left",
    ).select("probe_id", F.coalesce("present0", F.lit(False)).alias("present"))
    return (
        hits.join(exact, "probe_id")
        .select(
            "probe_id",
            (F.col("nhit") == BLOOM_K).alias("bloom_positive"),
            "present",
            ((F.col("nhit") == BLOOM_K) & ~F.col("present")).alias(
                "false_positive"
            ),
        )
    )
