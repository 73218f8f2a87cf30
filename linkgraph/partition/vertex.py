"""Streaming vertex partitioners (edge-cut model): LDG and Fennel.

Reference semantics:

- LDG (/root/reference/algorithms/ldg/ldg.cpp:80-114): shuffle the
  vertex stream; seed partitions 0..k-1 with the first k vertices;
  then assign each vertex to argmax_j of
  ``(|N(v) ∩ P_j| + 1e-6) · (1 − size_j / capacity)`` with
  ``capacity = n/k + 1`` (vertexPartitioner.cpp:10); ties → lowest j
  (first max_element).
- Fennel (/root/reference/algorithms/fennel/fennel.cpp:91-133): same
  seeding; γ = 1.5, α = m·k^(γ−1)/n^γ, load_limit = 1.1·n/k
  (fennel.cpp:108-111); score_j = |N(v) ∩ P_j| − α·γ·size_j^(γ−1) for
  partitions within the limit. Divergence note: the reference leaves
  over-limit partitions at score 0 (fennel.cpp:119-127), which *beats*
  all-negative eligible scores, so one partition runs away (balance
  >2 measured) — a bug relative to the Fennel paper, which excludes
  ineligible partitions. We default to the paper-correct −inf
  (``faithful_quirk=False``); pass ``faithful_quirk=True`` to
  reproduce the reference behavior bit-for-bit.

The reference shuffles with an unseeded RNG (ldg.cpp:87-89); we use a
seeded permutation (reproducibility rule, SURVEY.md §4).

Execution modes mirror HDRF: a pure-Python/NumPy oracle, an exact
single-group Spark mode (adjacency lists collected per group via
``collect_list`` → sequential NumPy loop inside applyInPandas,
bit-identical to the oracle), and ``vertex_partition_chunked`` — the
scale path: the vertex stream is processed in C deterministic hash
chunks; each chunk's vertices get their neighbor-partition counts
|N(v) ∩ P_j| via a JOIN against the distributed assignment-so-far
DataFrame (nothing O(|V|) on the driver), then T parallel tasks run
the sequential scorer under per-task capacity budgets, and the new
assignments merge back by union. Approximation = within-chunk
staleness (neighbors assigned in the same chunk are invisible),
identical in spirit to chunked HDRF; quality approaches exact as C
grows (tests/test_vertex_partition.py pins completeness, balance, and
an edge-cut bound vs exact).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GAMMA = 1.5
FENNEL_SLACK = 1.1
LDG_EPS = 1e-6
DEFAULT_SEED = 985  # reference DEFAULT_SEED, base_graph.hpp:48
# Default chunk count for the chunked-streaming scale path — named so
# the replay oracle (linkgraph/oracle/literal.py) gates the SAME
# configuration the engine defaults to.
DEFAULT_VERTEX_CHUNKS = 8


def _assign_stream(
    order: np.ndarray,
    indptr: np.ndarray,
    indices: np.ndarray,
    k: int,
    mode: str,
    m_edges: int,
    faithful_quirk: bool = False,
) -> np.ndarray:
    """Sequential vertex assignment over dense-indexed CSR adjacency.
    ``order``: the shuffled stream of vertex indices."""
    n = len(indptr) - 1
    member = np.zeros((k, n), dtype=bool)
    sizes = np.zeros(k, dtype=np.int64)
    out = np.full(n, -1, dtype=np.int64)
    capacity = n // k + 1
    alpha = m_edges * (k ** (GAMMA - 1)) / (n**GAMMA)
    load_limit = FENNEL_SLACK * n / k

    for i, v in enumerate(order):
        if i < k:
            p = i
        else:
            nbrs = indices[indptr[v] : indptr[v + 1]]
            inter = member[:, nbrs].sum(axis=1).astype(np.float64)
            if mode == "ldg":
                scores = (inter + LDG_EPS) * (1.0 - sizes / capacity)
            else:  # fennel
                base = 0.0 if faithful_quirk else -np.inf
                scores = np.full(k, base)
                ok = sizes <= load_limit
                if not ok.any():
                    ok = sizes == sizes.min()
                scores[ok] = inter[ok] - alpha * GAMMA * np.power(
                    sizes[ok].astype(np.float64), GAMMA - 1
                )
            p = int(np.argmax(scores))
        out[v] = p
        member[p, v] = True
        sizes[p] += 1
    return out


def _prep(edges: list[tuple[int, int]]):
    vids = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    darts = [(idx[u], idx[v]) for u, v in edges] + [
        (idx[v], idx[u]) for u, v in edges
    ]
    src = np.array([d[0] for d in darts])
    dst = np.array([d[1] for d in darts])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    counts = np.bincount(src, minlength=n)
    indptr = np.concatenate(([0], np.cumsum(counts)))
    return np.array(vids), indptr, dst


def vertex_partition_oracle(
    edges: list[tuple[int, int]], k: int, mode: str = "ldg",
    seed: int = DEFAULT_SEED, faithful_quirk: bool = False,
) -> dict[int, int]:
    """Pure-Python/NumPy oracle → {vid: partition}."""
    vids, indptr, indices = _prep(edges)
    order = np.random.default_rng(seed).permutation(len(vids))
    parts = _assign_stream(
        order, indptr, indices, k, mode, len(edges), faithful_quirk
    )
    return {int(vids[i]): int(parts[i]) for i in range(len(vids))}


def vertex_partition_spark(
    edges: DataFrame, k: int, mode: str = "ldg", seed: int = DEFAULT_SEED
) -> DataFrame:
    """Exact Spark mode → DataFrame[vid, partition]; bit-identical to
    the oracle (same seeded stream, same scoring)."""
    from linkgraph.graph import symmetrize

    m = edges.count()
    adj = (
        symmetrize(edges)
        .groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
        .withColumn("_g", F.lit(0))
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("src")
        vids = pdf["src"].to_numpy()
        pos = {v: i for i, v in enumerate(vids)}
        nbr_lists = [
            np.array([pos[x] for x in nb], dtype=np.int64) for nb in pdf["nbrs"]
        ]
        indptr = np.concatenate(
            ([0], np.cumsum([len(nb) for nb in nbr_lists]))
        ).astype(np.int64)
        indices = (
            np.concatenate(nbr_lists) if nbr_lists else np.array([], dtype=np.int64)
        )
        order = np.random.default_rng(seed).permutation(len(vids))
        parts = _assign_stream(order, indptr, indices, k, mode, m)
        return pd.DataFrame({"vid": vids, "partition": parts})

    return adj.groupBy("_g").applyInPandas(run, schema="vid long, partition long")


def vertex_partition_chunked(
    edges: DataFrame,
    k: int,
    mode: str = "ldg",
    num_chunks: int = DEFAULT_VERTEX_CHUNKS,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Chunked-streaming LDG/Fennel (the scale path) — the vertex-
    partitioning twin of ``linkgraph.partition.hdrf._hdrf_chunked``.

    Per chunk: the chunk's vertices get their neighbor-partition
    counts |N(v) ∩ P_j| by joining the symmetrized darts against the
    distributed assignment-so-far (state shuffles by vid; nothing
    O(|V|) on the driver), T hash groups score sequentially under
    per-task capacity budgets, and the new assignments union back.
    Only the k-length size vector lives on the driver. Approximation
    vs exact = within-chunk staleness; deterministic (hash chunking,
    grouping, ordering).
    """
    from linkgraph.graph import symmetrize

    sym = symmetrize(edges).cache()
    verts = (
        sym.select(F.col("src").alias("vid"))
        .distinct()
        .withColumn(
            "_chunk", F.pmod(F.xxhash64("vid", F.lit(seed)), F.lit(num_chunks))
        )
        .cache()
    )
    from linkgraph.partition.hdrf import DEFAULT_CHUNK_TASKS

    n = verts.count()
    m = edges.count()
    n_tasks = DEFAULT_CHUNK_TASKS  # env-independent output (see hdrf.py)
    capacity = n // k + 1  # vertexPartitioner.cpp:10
    load_limit = FENNEL_SLACK * n / k  # fennel.cpp:108-111
    alpha = m * (k ** (GAMMA - 1)) / (n**GAMMA)
    # hard per-partition target (with the same slack Fennel uses) —
    # split across tasks as a budget so balance holds under parallelism
    hard_cap = int(np.ceil(FENNEL_SLACK * n / k)) + 1

    sizes = np.zeros(k, dtype=np.int64)
    assignment: DataFrame | None = None
    results: list[DataFrame] = []
    for c in range(num_chunks):
        budget = np.maximum(1, np.ceil((hard_cap - sizes) / n_tasks)).astype(
            np.int64
        )
        cv = verts.where(F.col("_chunk") == c).select("vid")
        if assignment is None:
            counts_df = cv.withColumn(
                "partition", F.lit(None).cast("long")
            ).withColumn("cnt", F.lit(None).cast("long"))
        else:
            nbr = sym.join(cv, sym["src"] == cv["vid"]).select(
                cv["vid"], sym["dst"]
            )
            asg = assignment.select(
                F.col("vid").alias("dst"), F.col("partition")
            )
            joined = (
                nbr.join(asg, "dst")
                .groupBy("vid", "partition")
                .agg(F.count("*").alias("cnt"))
            )
            counts_df = cv.join(joined, "vid", "left")
        # (The hdrf-style spread-label + explicit-repartition treatment
        # was A/B'd here and NOT taken: the LDG/Fennel scorer is
        # per-vertex and cheap, so at gate scale AQE's coalescing of
        # the tiny Python groups is a win, not the serialization hazard
        # it is for the per-edge HDRF groups — measured ldg 16.1 →
        # 21.6 s with the extra exchange.)
        grouped = counts_df.withColumn(
            "_task", F.pmod(F.xxhash64("vid", F.lit(7919)), F.lit(n_tasks))
        ).withColumn("_ord", F.xxhash64("vid", F.lit(424242)))
        # Per-partition size increments ride the checkpoint action as an
        # Observation (k sums) instead of a separate collect job per
        # chunk (guide §1.5/§5; same as _hdrf_chunked).
        from pyspark.sql import Observation

        obs = Observation()
        out = (
            grouped.groupBy("_task")
            .applyInPandas(
                _make_vertex_chunk_runner(
                    k, mode, capacity, load_limit, alpha, sizes.copy(), budget
                ),
                schema="vid long, partition long",
            )
            .observe(
                obs,
                *[
                    F.sum((F.col("partition") == p).cast("long")).alias(f"s{p}")
                    for p in range(k)
                ],
            )
            .localCheckpoint(eager=True)
        )
        results.append(out)
        assignment = results[0]
        for r in results[1:]:
            assignment = assignment.unionByName(r)
        got = obs.get
        for p in range(k):
            sizes[p] += got[f"s{p}"] or 0
    verts.unpersist()
    sym.unpersist()
    return assignment


def _make_vertex_chunk_runner(
    k: int,
    mode: str,
    capacity: int,
    load_limit: float,
    alpha: float,
    sizes: np.ndarray,
    budget: np.ndarray,
):
    """applyInPandas factory: one task group of a chunk. Rows are
    (vid, partition, cnt) neighbor-partition counts (≤ k rows per vid,
    null partition for vertices with no assigned neighbor yet)."""

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_ord", "vid"])
        vids = pdf["vid"].unique()  # order of appearance = stream order
        vindex = {v: i for i, v in enumerate(vids)}
        inter = np.zeros((len(vids), k), dtype=np.float64)
        have = pdf["partition"].notna().to_numpy()
        if have.any():
            r = pdf["vid"].map(vindex).to_numpy()[have]
            cdx = pdf["partition"].to_numpy()[have].astype(np.int64)
            inter[r, cdx] = pdf["cnt"].to_numpy()[have].astype(np.float64)
        local = np.zeros(k, dtype=np.int64)
        out = np.empty(len(vids), dtype=np.int64)
        for i in range(len(vids)):
            cur = sizes + local
            full = local >= budget
            if mode == "ldg":
                scores = (inter[i] + LDG_EPS) * (1.0 - cur / capacity)
            else:  # fennel (paper-correct eligibility)
                scores = inter[i] - alpha * GAMMA * np.power(
                    cur.astype(np.float64), GAMMA - 1
                )
                full = full | (cur > load_limit)
            scores = np.where(full, -np.inf, scores)
            if np.isneginf(scores).all():
                p = int(np.argmin(cur))
            else:
                p = int(np.argmax(scores))
            out[i] = p
            local[p] += 1
        return pd.DataFrame({"vid": vids, "partition": out})

    return run_group
