"""Similarity search over the ``embeddings`` table
(vec_id, embedding: array<float>, label).

- ``cosine_pairs`` / ``knn_bruteforce``: exact cosine via JVM-side
  higher-order functions (``zip_with`` + ``aggregate`` — whole-stage
  codegen, no Python). Brute force is the oracle baseline; the join is
  the classic block-nested product, broadcast on the query side.
- ``ann_lsh``: sign-random-projection LSH — 8 deterministic
  pseudo-random hyperplanes whose components come from an LCG over
  (plane, dim), so Spark and DuckDB produce identical buckets; ANN
  candidates are pairs sharing a bucket. The scale path: bucket join
  instead of all-pairs.

Float determinism: cosine outputs rounded to 4dp for oracle compare
(both engines sum float32 inputs in float64 left-to-right over the
zipped arrays, so agreement is ~1e-7; 4dp leaves margin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NUM_PLANES = 8


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_pairs(left: DataFrame, right: DataFrame) -> DataFrame:
    """All-pairs cosine (a from left, b from right) — DataFrame[a, b,
    cos]. Broadcast the smaller side when calling at scale."""
    la = left.select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("ea")
    )
    rb = right.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("eb")
    )
    return la.crossJoin(rb).select(
        "a",
        "b",
        (_dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))).alias(
            "cos"
        ),
    )


def knn_bruteforce(
    embeddings: DataFrame, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors
    (query = vec_id < n_queries), excluding self. Deterministic
    ordering: (rounded cos desc, neighbor id asc)."""
    queries = embeddings.where(F.col("vec_id") < n_queries)
    pairs = cosine_pairs(queries, embeddings).where(F.col("a") != F.col("b"))
    scored = pairs.select(
        F.col("a").alias("query_id"),
        F.col("b").alias("neighbor_id"),
        F.round("cos", 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def _plane_component(plane, dim, stride: int = 64):
    """Deterministic ±1 hyperplane component from an LCG over
    (plane, dim) — identical arithmetic in the SQL oracle (which uses
    the default 64 stride; data wider than 64 dims widens the stride
    so components never alias across planes)."""
    lcg = (F.lit(1664525) * (plane * stride + dim) + F.lit(1013904223)) % F.lit(2**31)
    return F.when(lcg % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_bucket_ids(embeddings: DataFrame, num_planes: int = NUM_PLANES) -> DataFrame:
    """Sign-random-projection bucket per vector: bit j = 1 iff
    dot(v, plane_j) > 0; bucket = Σ 2^j·bit_j. Explode dims → join the
    (plane, dim, ±1) constant grid → two-level sum. All integer/exact
    comparisons except the dot sign, which has ~1e-6 margin on random
    data.

    The hyperplane grid is sized from the DATA (max embedding length —
    one tiny agg action), so wider vectors can never be silently
    truncated by an undersized grid; the LCG stride stays 64 for ≤64
    dims (oracle parity) and widens with the data beyond that."""
    spark = embeddings.sparkSession
    max_dim = embeddings.agg(F.max(F.size("embedding"))).first()[0] or 0
    stride = max(64, max_dim)
    dims = embeddings.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    )
    grid = (
        spark.range(num_planes)
        .select(
            F.col("id").alias("plane"),
            F.pow(F.lit(2), F.col("id")).cast("long").alias("planeval"),
        )
        .crossJoin(spark.range(max_dim).select(F.col("id").alias("dim")))
        .select(
            "plane", "planeval", "dim",
            _plane_component(F.col("plane"), F.col("dim"), stride).alias("c"),
        )
    )
    dots = (
        dims.join(F.broadcast(grid), "dim")
        .groupBy("vec_id", "plane", "planeval")
        .agg(F.sum(F.col("x").cast("double") * F.col("c")).alias("dot"))
    )
    return dots.groupBy("vec_id").agg(
        F.sum(F.when(F.col("dot") > 0, F.col("planeval")).otherwise(F.lit(0)))
        .cast("long")
        .alias("bucket")
    )


def ann_lsh_candidates(
    embeddings: DataFrame, max_bucket_size: int = 10000
) -> DataFrame:
    """ANN candidate pairs = vectors sharing an LSH bucket (a < b).

    Mega-bucket guard (same rationale as
    ``dedup.minhash_lsh_candidates``): buckets above ``max_bucket_size``
    are excluded from the pairwise join so one degenerate bucket (e.g.
    a zero-vector pile-up) can't go quadratic; such clusters should be
    routed to exact dedup / re-hashed with more planes instead."""
    b = lsh_bucket_ids(embeddings).cache()
    ok = (
        b.groupBy("bucket")
        .agg(F.count("*").alias("bsz"))
        .where(F.col("bsz") <= max_bucket_size)
        .select("bucket")
    )
    b = b.join(ok, "bucket", "left_semi")
    x = b.alias("x")
    y = b.alias("y")
    return (
        x.join(
            y,
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            F.col("x.bucket").alias("bucket"),
        )
    )


def _ivf_centroids(
    embeddings: DataFrame, n_cells: int, refine_iters: int = 0
) -> DataFrame:
    """Centroid table (cell, ce) for the IVF quantizer. Seeds are the
    ``n_cells`` lowest-``vec_id`` vectors (deterministic — the driver
    gate compares against DuckDB, so the DEFAULT path must be a pure
    function of the data). ``refine_iters`` Lloyd rounds on top of the
    seed set, fully distributed: assign = the same broadcast-crossJoin
    argmax routing the quantizer uses; update = per-(cell, dim) AVG via
    posexplode (one shuffle keyed by (cell, pos) — C·d rows out,
    no vector ever collected to the driver); empty cells keep their
    previous centroid. Fixed iteration count keeps runs reproducible
    (float-sum ordering can wiggle last bits, so refinement is off in
    the oracle-gated query and recall-tested instead —
    tests/test_pipeline.py)."""
    from linkgraph.rolling import RollingCheckpoint

    roll = RollingCheckpoint()
    cents = embeddings.orderBy("vec_id").limit(n_cells)
    c = cents.select(F.col("vec_id").alias("cell"), F.col("embedding").alias("ce"))
    for _ in range(refine_iters):
        scored = embeddings.crossJoin(F.broadcast(c)).select(
            "vec_id",
            "cell",
            (
                _dot(F.col("embedding"), F.col("ce"))
                / (_norm(F.col("embedding")) * _norm(F.col("ce")))
            ).alias("ccos"),
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cell"))
        assign = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "cell")
        )
        new = (
            assign.join(embeddings.select("vec_id", "embedding"), "vec_id")
            .select("cell", F.posexplode("embedding").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("v"))
            .groupBy("cell")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv")
            )
            .select(
                "cell",
                F.transform("pv", lambda s: s["v"].cast("float")).alias("nce"),
            )
        )
        # each round references c twice (scoring crossJoin + the
        # empty-cell fallback join) — roll the tiny C-row table through
        # localCheckpoint so the plan doesn't double per round
        # (SURVEY.md §4, same rule as the cc/kcore loops)
        c = roll(
            c.join(new, "cell", "left")
            .select("cell", F.coalesce("nce", "ce").alias("ce"))
        )
    return c


def ivf_cells(
    embeddings: DataFrame, n_cells: int = 8, refine_iters: int = 0
) -> DataFrame:
    """IVF coarse quantizer: route every vector to its max-cosine
    centroid → DataFrame[vec_id, cell, cosine] (ties at 4dp → lowest
    cell id). Centroids are the ``n_cells`` lowest-``vec_id`` vectors —
    a deterministic seed set — optionally Lloyd-refined for
    ``refine_iters`` rounds (``_ivf_centroids``; default off so the
    driver gate stays a pure function of the data).
    The centroid table is broadcast (tiny by construction); routing is
    one broadcast crossJoin + a C-row-per-vector argmax window — no
    all-pairs anywhere. At search time only the probed cells'
    inverted lists are scanned (``ann_ivf_search``)."""
    c = _ivf_centroids(embeddings, n_cells, refine_iters)
    scored = embeddings.crossJoin(F.broadcast(c)).select(
        "vec_id",
        "cell",
        F.round(
            _dot(F.col("embedding"), F.col("ce"))
            / (_norm(F.col("embedding")) * _norm(F.col("ce"))),
            4,
        ).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "cell", "cosine")
    )


def ann_ivf_search(
    embeddings: DataFrame,
    n_cells: int = 8,
    n_queries: int = 10,
    k: int = 5,
    n_probe: int = 2,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF top-k search: each query scans only its ``n_probe``
    best cells' inverted lists (brute-force cosine within them) —
    the candidate set is |probed cells| / |cells| of the corpus
    instead of all of it. Same output shape + determinism contract as
    ``knn_bruteforce`` (rounded cos desc, neighbor asc); recall vs the
    exact baseline is pinned on clustered data in
    tests/test_pipeline.py. ``refine_iters`` Lloyd-refines the
    centroids first (see ``_ivf_centroids``)."""
    c = _ivf_centroids(embeddings, n_cells, refine_iters)
    scored = embeddings.crossJoin(F.broadcast(c)).select(
        "vec_id",
        "cell",
        F.round(
            _dot(F.col("embedding"), F.col("ce"))
            / (_norm(F.col("embedding")) * _norm(F.col("ce"))),
            4,
        ).alias("ccos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cell"))
    ranked = scored.withColumn("rn", F.row_number().over(w))
    assign = ranked.where(F.col("rn") == 1).select("vec_id", "cell")
    probes = (
        ranked.where((F.col("rn") <= n_probe) & (F.col("vec_id") < n_queries))
        .select(F.col("vec_id").alias("query_id"), "cell")
    )
    # inverted-list scan: query ⋈ probed cells ⋈ members of those cells
    members = assign.join(
        embeddings.select("vec_id", "embedding"), "vec_id"
    ).select("cell", F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("eb"))
    qv = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("ea")
    )
    cand = (
        probes.join(members, "cell")
        .join(qv, "query_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored_c = cand.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb"))),
            4,
        ).alias("cosine"),
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored_c.withColumn("rnk", F.row_number().over(wk).cast("long"))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def ivf_cell_stats(
    embeddings: DataFrame, n_cells: int = 8, refine_iters: int = 0
) -> DataFrame:
    """Per-cell quality audit of the IVF quantizer — the dashboard a
    production ANN index publishes per build: inverted-list size (the
    probe-cost driver), mean assignment cosine (cell coherence) and
    the worst assignment (min cosine — the vectors a re-train would
    move first). One groupBy over the driver-gated ``ivf_cells``
    routing; at 100 TB this is C rows out of |V| in, all partial-
    aggregated."""
    cells = ivf_cells(embeddings, n_cells, refine_iters)
    return cells.groupBy("cell").agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.round(F.avg("cosine"), 6).alias("mean_cosine"),
        F.round(F.min("cosine"), 6).alias("min_cosine"),
    )


def verified_sim_pairs(
    embeddings: DataFrame,
    threshold: float = 0.3,
    max_bucket_size: int = 10000,
) -> DataFrame:
    """LSH-verified similarity join — the production near-dup PAIR
    output at 100 TB: bucket-join candidates (``ann_lsh_candidates``,
    mega-bucket capped) verified by the exact cosine, keeping pairs
    ≥ ``threshold``. The two-stage shape is the whole point: the
    quadratic work runs only inside buckets, the exact math only on
    candidates. Recall is bounded by the LSH stage (measured in
    tests/test_pipeline.py); the all-pairs twin
    (``dedup.embedding_dup_pairs``) is the small-data oracle of the
    same contract."""
    cands = ann_lsh_candidates(embeddings, max_bucket_size)
    e = embeddings.select("vec_id", "embedding")
    pa = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    pb = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        cands.select("vec_a", "vec_b")
        .join(pa, "vec_a")
        .join(pb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("ea"), F.col("eb"))
                / (_norm(F.col("ea")) * _norm(F.col("eb"))),
                4,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
