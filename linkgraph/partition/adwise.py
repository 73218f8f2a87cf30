"""ADWISE-style bounded-window offstream partitioning.

The reference's offstreamNA (/root/reference/algorithms/offstreamNA/
offstreamNA.cpp) pairs an offline prefix phase with an ADWISE-style
*buffered window* streaming phase: instead of scoring only the next
stream edge (HDRF), a window of ``WINDOW_SIZE = 200`` edges
(/root/reference/baseGraph/base_graph.hpp:25) is kept, and each step
assigns the globally best-scoring (edge, partition) pair in the window
(offstreamNA.cpp:155-169 stream loop, :343-396 window argmax,
:398-405 add). The score has three terms (offstreamNA.cpp:264-310):

    lb(p)    = (max_load - load_p) / (eps + max_load - min_load)
    rf(u,v,p)= g(u,p) + g(v,p)           (the HDRF replication gain,
                                          partial degrees bumped at
                                          window-ADD time, :402-404)
    cs(u,v,p)= (placed_edges(u,p) + placed_edges(v,p))
               / (placed_edges(u,*) + placed_edges(v,*))
    score    = lambda * lb + rf + cs

and partitions at ``max_partition_load`` are skipped
(offstreamNA.cpp:363-365). Selection is a strict-``>`` argmax: lowest
partition id wins partition ties, the earliest window slot wins edge
ties; the chosen edge is swap-removed (window[i] = window.back()).

Spark mapping: the offline prefix reuses the chunked machinery
(``linkgraph.partition.hdrf._hdrf_chunked``); the streamed suffix runs
ONE pass split into ``DEFAULT_CHUNK_TASKS`` deterministic hash groups,
each executing the faithful window loop below over its rows with the
frozen prefix state (partial degrees + mirrors + per-partition
placement counts) carried on the joined rows — the same scale shape as
offstream, with per-task balance budgets. Deterministic end to end, so
the whole operator replays in pure Python for the literal-VALUES
DuckDB oracle (linkgraph/oracle/literal.py shares ``_window_assign``).

Documented divergences from offstreamNA.cpp (DIVERGENCES.md):
- cs with zero placed neighbors is 0 here; the reference computes
  0.0/0.0 = NaN, which poisons the comparison and makes such edges
  unpickable until another edge seeds their endpoints (and can dead-
  lock a window of all-fresh edges onto partition 0 via the argmax
  defaults).
- when every partition is at cap/budget, we place on the least-loaded
  partition (completeness + balance under parallelism); the reference
  falls through to partition 0 regardless of load.
- the offline phase is the chunked greedy scorer, not the reference's
  sequential NE core growth (same divergence as offstream_spark; use
  ``offline='ne_coarse'`` on offstream_spark for the NE pairing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.partition.hdrf import (
    BALANCE_RATIO,
    DEFAULT_CHUNK_TASKS,
    EPSILON,
    LAMBDA,
    OFFSTREAM_OFFLINE_CHUNKS,
    _hdrf_chunked,
)

WINDOW_SIZE = 200  # reference base_graph.hpp:25


def _window_assign(
    src_idx: np.ndarray,
    dst_idx: np.ndarray,
    k: int,
    pdeg: np.ndarray,
    mirrors: np.ndarray,  # (n_local, words) uint64 bitset
    vp: np.ndarray,  # (n_local, k) per-partition placement counts
    loads: np.ndarray,  # (k,) global snapshot, updated locally
    cap: int,
    budget: np.ndarray,
    lamb: float = LAMBDA,
    window_size: int = WINDOW_SIZE,
) -> np.ndarray:
    """Faithful bounded-window assignment loop (see module docstring).
    Scoring is vectorized as a (window × k) matrix per removal; the
    outer loop is one iteration per assigned edge. Shared verbatim by
    the Spark task runner and the pure-Python replay oracle."""
    n_edges = len(src_idx)
    out = np.empty(n_edges, dtype=np.int64)
    local_cnt = np.zeros(k, dtype=np.int64)
    part_word = np.arange(k) // 64
    part_bit = np.uint64(1) << (np.arange(k) % 64).astype(np.uint64)
    win: list[int] = []

    def remove_best() -> None:
        w = np.array(win, dtype=np.int64)
        u = src_idx[w]
        v = dst_idx[w]
        du = pdeg[u].astype(np.float64)
        dv = pdeg[v].astype(np.float64)
        s = (du + dv)[:, None]
        mu = (mirrors[u][:, part_word] & part_bit) != 0
        mv = (mirrors[v][:, part_word] & part_bit) != 0
        gu = np.where(mu, 1.0 + (1.0 - du[:, None] / s), 0.0)
        gv = np.where(mv, 1.0 + (1.0 - dv[:, None] / s), 0.0)
        num = vp[u] + vp[v]
        den = num.sum(axis=1, keepdims=True)
        cs = np.where(den > 0, num / np.maximum(den, 1), 0.0)
        max_load = int(loads.max())
        min_load = int(loads.min())
        lb = (max_load - loads).astype(np.float64) / (
            EPSILON + max_load - min_load
        )
        scores = lamb * lb[None, :] + gu + gv + cs
        full = (loads >= cap) | (local_cnt >= budget)
        scores[:, full] = -np.inf
        best_p = np.argmax(scores, axis=1)  # lowest id wins ties
        best_s = scores[np.arange(len(w)), best_p]
        gi = int(np.argmax(best_s))  # earliest window slot wins ties
        p = int(best_p[gi])
        if not np.isfinite(best_s[gi]):  # everything at cap/budget
            gi = 0
            p = int(np.argmin(loads + local_cnt))
        pos = win[gi]
        uu, vv = src_idx[pos], dst_idx[pos]
        for x in (uu, vv):
            mirrors[x, p // 64] |= np.uint64(1) << np.uint64(p % 64)
        vp[uu, p] += 1
        vp[vv, p] += 1
        loads[p] += 1
        local_cnt[p] += 1
        out[pos] = p
        win[gi] = win[-1]  # swap-remove, offstreamNA.cpp:391-392
        win.pop()

    for i in range(n_edges):
        if len(win) == window_size:
            remove_best()
        pdeg[src_idx[i]] += 1  # degrees bump at ADD time (:402-404)
        pdeg[dst_idx[i]] += 1
        win.append(i)
    while win:
        remove_best()
    return out


def _defer_greedy_assign(
    src_idx: np.ndarray,
    dst_idx: np.ndarray,
    k: int,
    mirrors: np.ndarray,  # (n_local, words) uint64 bitset
    loads: np.ndarray,
    budget: np.ndarray,
) -> np.ndarray:
    """Defer-greedy assignment — the offstreamNWG streaming semantics
    (offstreamNWG.cpp:244-330): PowerGraph-greedy rules (least-loaded
    common partition → least-loaded union → least-loaded of the placed
    side), except an edge whose endpoints are BOTH fresh (placement
    would mint two replicas) is deferred into per-vertex buffers; when
    a later edge places one of its endpoints, the buffered edges
    cascade (offstreamNWG.cpp:296-330). Edges still deferred at stream
    end fall through to plain greedy with the least-loaded fallback
    (the reference's standard_greedy drain, :555, over `vertex_indices`
    leftovers). Documented divergences (DIVERGENCES.md 7e): the
    reference's fp-empty branch calls leastLoad on the EMPTY set
    (offstreamNWG.cpp:286-287 — reads garbage) and erases the wrong
    vertex's buffer (:330); we use the placed side's set and the
    correct vertex, and run the cascade on an explicit stack. Shared
    verbatim by the Spark task runner and the replay oracle."""
    n_edges = len(src_idx)
    out = np.full(n_edges, -1, dtype=np.int64)
    local_cnt = np.zeros(k, dtype=np.int64)
    part_word = np.arange(k) // 64
    part_bit = np.uint64(1) << (np.arange(k) % 64).astype(np.uint64)
    placed = np.zeros(mirrors.shape[0], dtype=bool)
    placed[:] = mirrors.any(axis=1)
    pending: dict[int, list[int]] = {}
    big = np.iinfo(np.int64).max

    def assign_one(i: int, allow_defer: bool) -> None:
        stack = [i]
        while stack:
            j = stack.pop()
            if out[j] != -1:
                continue
            u, v = int(src_idx[j]), int(dst_idx[j])
            mu = (mirrors[u, part_word] & part_bit) != 0
            mv = (mirrors[v, part_word] & part_bit) != 0
            open_ = local_cnt < budget
            inter = mu & mv & open_
            uni = (mu | mv) & open_
            if inter.any():
                cand = inter
            elif uni.any():
                cand = uni
            elif not placed[u] and not placed[v] and allow_defer:
                pending.setdefault(u, []).append(j)
                pending.setdefault(v, []).append(j)
                continue
            else:
                cand = open_ if open_.any() else np.ones(k, dtype=bool)
            p = int(np.argmin(np.where(cand, loads + local_cnt, big)))
            out[j] = p
            bit = np.uint64(1) << np.uint64(p % 64)
            for x in (u, v):
                mirrors[x, p // 64] |= bit
            loads[p] += 1
            local_cnt[p] += 1
            for x in (u, v):
                if not placed[x]:
                    placed[x] = True
                    for w in pending.pop(x, []):
                        stack.append(w)

    for i in range(n_edges):
        assign_one(i, allow_defer=True)
    for i in range(n_edges):  # drain leftovers in stream order
        if out[i] == -1:
            assign_one(i, allow_defer=False)
    return out


def _make_defer_runner(k: int, budget: np.ndarray, loads: np.ndarray):
    """applyInPandas factory for one defer-greedy suffix task group:
    seeds the local mirror bitset from the join columns, then runs
    ``_defer_greedy_assign``."""

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (pdf["dst"].to_numpy(), pdf["src"].to_numpy(), pdf["_ord"].to_numpy())
        )
        pdf = pdf.iloc[order]
        src_v = pdf["src"].to_numpy()
        dst_v = pdf["dst"].to_numpy()
        all_v = np.concatenate([src_v, dst_v])
        vids, first_idx = np.unique(all_v, return_index=True)
        words = (k + 63) // 64
        mirrors = np.zeros((len(vids), words), dtype=np.uint64)
        mirs = list(pdf["src_mir"]) + list(pdf["dst_mir"])
        for vi, row_i in enumerate(first_idx):
            mlist = mirs[row_i]
            if mlist is None or not len(mlist):
                continue
            ps = np.asarray(mlist, dtype=np.int64)
            np.bitwise_or.at(
                mirrors,
                (np.full(len(ps), vi, dtype=np.int64), ps // 64),
                np.uint64(1) << (ps % 64).astype(np.uint64),
            )
        src = np.searchsorted(vids, src_v)
        dst = np.searchsorted(vids, dst_v)
        parts = _defer_greedy_assign(src, dst, k, mirrors, loads.copy(), budget)
        return pd.DataFrame({"src": src_v, "dst": dst_v, "partition": parts})

    return run_group


def offstream_defer_spark(
    edges: DataFrame,
    k: int,
    ratio: float = 0.5,
    lamb: float = LAMBDA,
    balance_ratio: float = BALANCE_RATIO,
    offline_chunks: int = OFFSTREAM_OFFLINE_CHUNKS,
) -> DataFrame:
    """Offstream with the offstreamNWG defer-greedy streaming phase →
    DataFrame[src, dst, partition]. Offline prefix = chunked greedy
    (same as ``offstream_spark``); suffix = one streamed pass per task
    running ``_defer_greedy_assign`` against the frozen prefix mirror
    state under per-task balance budgets."""
    import numpy as np

    from linkgraph.partition.hdrf import _state_from_assignment

    m = edges.count()
    cap = max(1, int(balance_ratio * m / k))
    split = F.pmod(F.xxhash64("src", "dst", F.lit(31337)), F.lit(1000)) < int(
        ratio * 1000
    )
    prefix = edges.where(split)
    suffix = edges.where(~split)
    pre = _hdrf_chunked(
        prefix, k, lamb, balance_ratio, offline_chunks, total_edges=m
    )
    vstate, loads = _state_from_assignment(pre, k)
    n_tasks = DEFAULT_CHUNK_TASKS
    budget = np.maximum(1, np.ceil((cap - loads) / n_tasks)).astype(np.int64)

    s_state = vstate.select(
        F.col("vid").alias("src"), F.col("mirrors").alias("src_mir")
    )
    d_state = vstate.select(
        F.col("vid").alias("dst"), F.col("mirrors").alias("dst_mir")
    )
    joined = (
        suffix.join(s_state, "src", "left")
        .join(d_state, "dst", "left")
        .withColumn("_task", F.pmod(F.xxhash64("src", "dst", F.lit(7919)), F.lit(n_tasks)))
        .withColumn("_ord", F.xxhash64("src", "dst", F.lit(985)))
    )
    suf = joined.groupBy("_task").applyInPandas(
        _make_defer_runner(k, budget, loads),
        schema="src long, dst long, partition long",
    )
    return pre.unionByName(suf)


def _make_window_runner(
    k: int, cap: int, budget: np.ndarray, loads: np.ndarray,
    lamb: float, window_size: int
):
    """applyInPandas factory for one suffix task group: seeds local
    dense state (pdeg + mirror bitset + per-partition placement
    counts) from the join columns, then runs ``_window_assign``."""

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (pdf["dst"].to_numpy(), pdf["src"].to_numpy(), pdf["_ord"].to_numpy())
        )
        pdf = pdf.iloc[order]
        src_v = pdf["src"].to_numpy()
        dst_v = pdf["dst"].to_numpy()
        all_v = np.concatenate([src_v, dst_v])
        vids, first_idx = np.unique(all_v, return_index=True)
        n_local = len(vids)
        words = (k + 63) // 64
        pdeg = np.zeros(n_local, dtype=np.int64)
        mirrors = np.zeros((n_local, words), dtype=np.uint64)
        vp = np.zeros((n_local, k), dtype=np.int64)
        pdegs = np.concatenate(
            [
                pdf["src_pdeg"].fillna(0).to_numpy(dtype=np.int64),
                pdf["dst_pdeg"].fillna(0).to_numpy(dtype=np.int64),
            ]
        )
        pdeg[:] = pdegs[first_idx]
        mirs = list(pdf["src_mir"]) + list(pdf["dst_mir"])
        mcnts = list(pdf["src_mcnt"]) + list(pdf["dst_mcnt"])
        for vi, row_i in enumerate(first_idx):
            mlist = mirs[row_i]
            if mlist is None or not len(mlist):
                continue
            ps = np.asarray(mlist, dtype=np.int64)
            # bitwise_or.at, NOT fancy |=: several partitions share a
            # word, and buffered fancy assignment keeps only the last
            np.bitwise_or.at(
                mirrors,
                (np.full(len(ps), vi, dtype=np.int64), ps // 64),
                np.uint64(1) << (ps % 64).astype(np.uint64),
            )
            vp[vi, ps] = np.asarray(mcnts[row_i], dtype=np.int64)
        src = np.searchsorted(vids, src_v)
        dst = np.searchsorted(vids, dst_v)
        parts = _window_assign(
            src, dst, k, pdeg, mirrors, vp, loads.copy(), cap, budget,
            lamb=lamb, window_size=window_size,
        )
        return pd.DataFrame({"src": src_v, "dst": dst_v, "partition": parts})

    return run_group


def _counted_state_from_assignment(assigned: DataFrame):
    """DataFrame[vid, pdeg, mirrors: array<long>, mcnt: array<long>]
    from an edge assignment — like
    ``linkgraph.partition.hdrf._state_from_assignment`` but carrying
    the per-partition placement COUNTS the cs term needs (mirrors and
    mcnt are aligned, sorted by partition id). One distributed
    aggregation, nothing O(|V|) on the driver."""
    touched = assigned.select(F.col("src").alias("vid"), "partition").unionAll(
        assigned.select(F.col("dst").alias("vid"), "partition")
    )
    per = touched.groupBy("vid", "partition").agg(F.count("*").alias("c"))
    return per.groupBy("vid").agg(
        F.sum("c").alias("pdeg"),
        F.array_sort(F.collect_list(F.struct("partition", "c"))).alias("_pc"),
    ).select(
        "vid",
        "pdeg",
        F.transform("_pc", lambda x: x["partition"]).alias("mirrors"),
        F.transform("_pc", lambda x: x["c"]).alias("mcnt"),
    )


def offstream_window_spark(
    edges: DataFrame,
    k: int,
    ratio: float = 0.5,
    lamb: float = LAMBDA,
    balance_ratio: float = BALANCE_RATIO,
    offline_chunks: int = OFFSTREAM_OFFLINE_CHUNKS,
    window_size: int = WINDOW_SIZE,
) -> DataFrame:
    """Offstream with the ADWISE bounded-window streaming phase →
    DataFrame[src, dst, partition]. Offline prefix = chunked greedy
    scorer (same as ``offstream_spark``); suffix = one streamed pass
    whose per-task loop buffers ``window_size`` edges and assigns the
    window-best (edge, partition) each step (see module docstring)."""
    import numpy as np

    m = edges.count()
    cap = max(1, int(balance_ratio * m / k))
    split = F.pmod(F.xxhash64("src", "dst", F.lit(31337)), F.lit(1000)) < int(
        ratio * 1000
    )
    prefix = edges.where(split)
    suffix = edges.where(~split)
    pre = _hdrf_chunked(
        prefix, k, lamb, balance_ratio, offline_chunks, total_edges=m
    )
    vstate = _counted_state_from_assignment(pre)
    loads = np.zeros(k, dtype=np.int64)
    for r in pre.groupBy("partition").count().collect():  # ≤ k rows
        loads[r["partition"]] += r["count"]
    n_tasks = DEFAULT_CHUNK_TASKS
    budget = np.maximum(1, np.ceil((cap - loads) / n_tasks)).astype(np.int64)

    s_state = vstate.select(
        F.col("vid").alias("src"),
        F.col("pdeg").alias("src_pdeg"),
        F.col("mirrors").alias("src_mir"),
        F.col("mcnt").alias("src_mcnt"),
    )
    d_state = vstate.select(
        F.col("vid").alias("dst"),
        F.col("pdeg").alias("dst_pdeg"),
        F.col("mirrors").alias("dst_mir"),
        F.col("mcnt").alias("dst_mcnt"),
    )
    joined = (
        suffix.join(s_state, "src", "left")
        .join(d_state, "dst", "left")
        .withColumn("_task", F.pmod(F.xxhash64("src", "dst", F.lit(7919)), F.lit(n_tasks)))
        .withColumn("_ord", F.xxhash64("src", "dst", F.lit(985)))
    )
    suf = joined.groupBy("_task").applyInPandas(
        _make_window_runner(k, cap, budget, loads, lamb, window_size),
        schema="src long, dst long, partition long",
    )
    return pre.unionByName(suf)
