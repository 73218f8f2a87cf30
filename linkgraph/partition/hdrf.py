"""HDRF — High-Degree Replicated First streaming greedy vertex-cut.

Semantics follow the reference scorer
(/root/reference/algorithms/hdrf/hdrf.cpp:68-116) and the HDRF paper
(Petroni et al., CIKM'15; bundled at /root/reference/papers/HDRF.pdf):

Per edge (u, v), with partial degrees incremented *before* scoring
(the edge itself counts — hdrf.cpp:69-70):

    g(x, j) = 1 + (1 - deg_x / (deg_u + deg_v))   if x already mirrored on j
            = 0                                    otherwise
    bal(j)  = (max_load - load_j) / (eps + max_load - min_load)
    score_j = g(u, j) + g(v, j) + lambda * bal(j)

Partitions at or above ``max_partition_load = balance_ratio * m / k``
are skipped (hdrf.cpp:80-82; note: the reference's integer cast
``(uint64_t) balance_ratio`` truncates 1.05 → 1, capping at exactly
m/k — we implement the paper-intended float product and document the
divergence). Ties break to the lowest partition id (strict ``>``
argmax, hdrf.cpp:110-113). After assignment both endpoints are
mirrored on the winner and loads/min/max are updated
(hdrf.cpp:158-176, 125-129). Defaults lambda=1.1, balance_ratio=1.05
(/root/reference/baseGraph/base_graph.hpp:21-22), eps=1
(/root/reference/algorithms/hdrf/hdrf.hpp:42).

HDRF is inherently sequential — every decision reads state written by
all prior decisions. Three execution modes, same scoring core:

- ``hdrf_oracle``          pure-Python driver-side loop (tests, tiny graphs)
- ``hdrf_spark(exact=True)``  all edges through ONE applyInPandas group in a
  deterministic stream order — bit-identical to the oracle, used for
  parity tests and the driver correctness gate. Single-task by design.
- ``hdrf_spark(exact=False)`` chunked-streaming approximation (the
  scale path): the driver iterates over C deterministic hash chunks;
  each chunk splits into T hash groups, each group running the same
  sequential assigner seeded from a broadcast snapshot of the global
  state (partial degrees, mirror bitsets, loads) under a per-task
  balance budget; state merges between chunks. Approximation error is
  cross-group staleness within a chunk — RF approaches exact HDRF as
  C grows. At 10^12 edges the broadcast state generalizes to
  per-executor mirror bloom filters; the loop shape is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LAMBDA = 1.1
BALANCE_RATIO = 1.05
EPSILON = 1.0


# ---------------------------------------------------------------- core

class _HdrfState:
    """Dense-indexed HDRF state (vertex ids remapped to 0..V-1)."""

    def __init__(self, n_vertices: int, k: int):
        self.k = k
        self.words = (k + 63) // 64
        self.pdeg = np.zeros(n_vertices, dtype=np.int64)
        self.mirrors = np.zeros((n_vertices, self.words), dtype=np.uint64)
        self.loads = np.zeros(k, dtype=np.int64)

    def set_mirrors(self, idx: np.ndarray, parts: np.ndarray) -> None:
        w = (parts // 64).astype(np.int64)
        b = np.uint64(1) << (parts % 64).astype(np.uint64)
        np.bitwise_or.at(self.mirrors, (idx, w), b)


def _sequential_assign(
    src_idx: np.ndarray,
    dst_idx: np.ndarray,
    state: _HdrfState,
    max_partition_load: int,
    lamb: float,
    budget: np.ndarray | None = None,
    mode: str = "hdrf",
) -> np.ndarray:
    """Exact sequential HDRF over dense-indexed edges, updating state
    in place. Inner per-edge scoring vectorized over k."""
    k = state.k
    out = np.empty(len(src_idx), dtype=np.int64)
    local_cnt = np.zeros(k, dtype=np.int64)
    pdeg, loads = state.pdeg, state.loads
    max_load = int(loads.max(initial=0))
    min_load: int | None = int(loads.min()) if loads.sum() > 0 else None
    mirrors = state.mirrors
    part_word = np.arange(k) // 64
    part_bit = np.uint64(1) << (np.arange(k) % 64).astype(np.uint64)
    for i in range(len(src_idx)):
        u, v = src_idx[i], dst_idx[i]
        pdeg[u] += 1
        pdeg[v] += 1
        du, dv = pdeg[u], pdeg[v]
        s = float(du + dv)
        mu = (mirrors[u, part_word] & part_bit) != 0
        mv = (mirrors[v, part_word] & part_bit) != 0
        full = loads >= max_partition_load if mode == "hdrf" else np.zeros(k, bool)
        if budget is not None:
            full = full | (local_cnt >= budget)
        if mode == "greedy":
            # PowerGraph greedy (reference algorithms/greedy/greedy.cpp:17-91):
            # common partitions → least-loaded common; else any placed →
            # least-loaded of the union; else least-loaded overall.
            # Ties → lowest id (strict < scan, greedy.cpp:73-84).
            inter = mu & mv & ~full
            uni = (mu | mv) & ~full
            if inter.any():
                cand = inter
            elif uni.any():
                cand = uni
            else:
                cand = ~full if not full.all() else np.ones(k, bool)
            masked = np.where(cand, loads, np.iinfo(np.int64).max)
            p = int(np.argmin(masked))
        else:
            gu = np.where(mu, 1.0 + (1.0 - du / s), 0.0)
            gv = np.where(mv, 1.0 + (1.0 - dv / s), 0.0)
            bal = (max_load - loads).astype(np.float64)
            if min_load is not None:
                bal /= EPSILON + max_load - min_load
            score = gu + gv + lamb * bal
            score[full] = -np.inf
            if full.all():  # every partition at capacity → least loaded
                p = int(np.argmin(loads + local_cnt)) if budget is not None else 0
            else:
                p = int(np.argmax(score))
        out[i] = p
        if budget is not None:
            local_cnt[p] += 1
        for x in (u, v):
            mirrors[x, p // 64] |= np.uint64(1) << np.uint64(p % 64)
        loads[p] += 1
        if loads[p] > max_load:
            max_load = int(loads[p])
        min_load = int(loads.min())
    return out


# ------------------------------------------------------------- oracle

def hdrf_oracle(
    edges: list[tuple[int, int]],
    k: int,
    lamb: float = LAMBDA,
    balance_ratio: float = BALANCE_RATIO,
    mode: str = "hdrf",
) -> list[int]:
    """Sequential HDRF over a Python edge list (stream order = list
    order). Returns the partition per edge. Test oracle + semantics
    ground truth."""
    vids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(vids)}
    src = np.array([idx[u] for u, _ in edges], dtype=np.int64)
    dst = np.array([idx[v] for _, v in edges], dtype=np.int64)
    state = _HdrfState(len(vids), k)
    cap = max(1, int(balance_ratio * len(edges) / k))
    return _sequential_assign(src, dst, state, cap, lamb, mode=mode).tolist()


# ------------------------------------------------------------- spark

def hdrf_spark(
    edges: DataFrame,
    k: int,
    lamb: float = LAMBDA,
    balance_ratio: float = BALANCE_RATIO,
    exact: bool = True,
    num_chunks: int = 8,
    mode: str = "hdrf",
) -> DataFrame:
    """HDRF on Spark → DataFrame[src, dst, partition].

    exact=True: one applyInPandas group, deterministic stream order —
    matches ``hdrf_oracle`` bit-for-bit. exact=False: chunked-streaming
    approximation (see module docstring).
    """
    if exact:
        return _hdrf_exact(edges, k, lamb, balance_ratio, mode)
    return _hdrf_chunked(edges, k, lamb, balance_ratio, num_chunks, mode)


def _hdrf_exact(
    edges: DataFrame, k: int, lamb: float, balance_ratio: float, mode: str = "hdrf"
) -> DataFrame:
    m = edges.count()
    cap = max(1, int(balance_ratio * m / k))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (pdf["dst"].to_numpy(), pdf["src"].to_numpy(), pdf["_ord"].to_numpy())
        )
        pdf = pdf.iloc[order]
        vids = np.unique(np.concatenate([pdf["src"].to_numpy(), pdf["dst"].to_numpy()]))
        src = np.searchsorted(vids, pdf["src"].to_numpy())
        dst = np.searchsorted(vids, pdf["dst"].to_numpy())
        state = _HdrfState(len(vids), k)
        parts = _sequential_assign(src, dst, state, cap, lamb, mode=mode)
        return pd.DataFrame(
            {"src": pdf["src"].to_numpy(), "dst": pdf["dst"].to_numpy(), "partition": parts}
        )

    with_ord = edges.withColumn("_ord", F.xxhash64("src", "dst", F.lit(985))).withColumn(
        "_g", F.lit(0)
    )
    return (
        with_ord.groupBy("_g")
        .applyInPandas(run, schema="src long, dst long, partition long")
    )


def _hdrf_chunked(
    edges: DataFrame, k: int, lamb: float, balance_ratio: float, num_chunks: int,
    mode: str = "hdrf",
) -> DataFrame:
    """Chunked-streaming HDRF (the scale path).

    Driver loop over C deterministic hash chunks; each chunk is split
    into T deterministic hash groups (applyInPandas — groups cannot be
    coalesced away like repartitioned tasks), and each group runs the
    *sequential* HDRF assigner seeded from a broadcast snapshot of the
    global state, with a per-task budget of
    (balance_target_j - loads_j)/T edges per partition so the global
    balance cap holds under parallelism. Group effects (partial
    degrees, mirrors, loads) merge into the driver state between
    chunks. Deterministic: chunking, grouping, and within-group order
    are all hash-defined. Approximation vs exact HDRF = cross-group
    staleness within a chunk; RF degrades smoothly as C·T grows.
    """
    spark = edges.sparkSession
    m = edges.count()
    cap = max(1, int(balance_ratio * m / k))

    vids = np.array(
        [r[0] for r in
         edges.select(F.col("src").alias("v")).unionAll(edges.select("dst"))
         .distinct().orderBy("v").collect()],
        dtype=np.int64,
    )
    state = _HdrfState(len(vids), k)

    chunked = edges.withColumn(
        "_chunk", F.pmod(F.xxhash64("src", "dst", F.lit(985)), F.lit(num_chunks))
    ).cache()
    chunk_sizes = {
        r["_chunk"]: r["count"]
        for r in chunked.groupBy("_chunk").count().collect()
    }

    n_tasks = max(2, spark.sparkContext.defaultParallelism)
    cum = 0
    results = []
    for c in range(num_chunks):
        cum += chunk_sizes.get(c, 0)
        # per-task budget: the cumulative balance target, minus what is
        # already placed, split across the T parallel groups
        target = min(cap, int(balance_ratio * cum / k))
        budget = np.maximum(
            1, np.ceil((target - state.loads) / n_tasks)
        ).astype(np.int64)
        chunk = (
            chunked.where(F.col("_chunk") == c)
            .withColumn("_task", F.pmod(F.xxhash64("src", "dst", F.lit(7919)), F.lit(n_tasks)))
        )
        b = spark.sparkContext.broadcast(
            (vids, state.pdeg.copy(), state.mirrors.copy(), state.loads.copy(), budget)
        )

        def make_run_group(_b, _k, _lamb, _cap, _mode=mode):
            def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
                bv, bpdeg, bmirrors, bloads, bbudget = _b.value
                order = np.lexsort(
                    (pdf["dst"].to_numpy(), pdf["src"].to_numpy(), pdf["_ord"].to_numpy())
                )
                pdf = pdf.iloc[order]
                st = _HdrfState(len(bv), _k)
                st.pdeg, st.mirrors, st.loads = bpdeg.copy(), bmirrors.copy(), bloads.copy()
                src = np.searchsorted(bv, pdf["src"].to_numpy())
                dst = np.searchsorted(bv, pdf["dst"].to_numpy())
                parts = _sequential_assign(src, dst, st, _cap, _lamb, budget=bbudget, mode=_mode)
                return pd.DataFrame(
                    {"src": pdf["src"].to_numpy(), "dst": pdf["dst"].to_numpy(),
                     "partition": parts}
                )

            return run_group

        assigned = (
            chunk.withColumn("_ord", F.xxhash64("src", "dst", F.lit(985)))
            .groupBy("_task")
            .applyInPandas(
                make_run_group(b, k, lamb, cap),
                schema="src long, dst long, partition long",
            )
            .localCheckpoint(eager=True)
        )
        results.append(assigned)

        # merge chunk effects into driver state
        pd_updates = (
            assigned.select(F.col("src").alias("vid"), "partition")
            .unionAll(assigned.select(F.col("dst").alias("vid"), "partition"))
        )
        occ = pd_updates.groupBy("vid").count().collect()
        occ_idx = np.searchsorted(vids, np.array([r["vid"] for r in occ], dtype=np.int64))
        state.pdeg[occ_idx] += np.array([r["count"] for r in occ], dtype=np.int64)
        mir = pd_updates.distinct().collect()
        if mir:
            mi = np.searchsorted(vids, np.array([r["vid"] for r in mir], dtype=np.int64))
            mp = np.array([r["partition"] for r in mir], dtype=np.int64)
            state.set_mirrors(mi, mp)
        loads = assigned.groupBy("partition").count().collect()
        for r in loads:
            state.loads[r["partition"]] += r["count"]
        b.unpersist()

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
