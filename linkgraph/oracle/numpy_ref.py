"""Independent NumPy / pure-Python oracle implementations of the
analytics (SURVEY.md §2.5) — the ground truth for pytest at
``allclose 1e-6`` / exact, per the north rule.

Deliberately different execution shape from the Spark code (dense
matrix iteration / BFS / dict counting) so agreement is evidence, not
tautology.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def _sym_adj(edges: list[tuple[int, int]]) -> dict[int, list[int]]:
    adj: dict[int, list[int]] = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    return adj


def pagerank_np(
    edges: list[tuple[int, int]],
    iterations: int = 20,
    damping: float = 0.85,
    directed: bool = False,
) -> dict[int, float]:
    """Dense-vector PageRank, dangling mass redistributed uniformly."""
    if directed:
        darts = edges
        vids = sorted({x for e in edges for x in e})
    else:
        darts = edges + [(v, u) for u, v in edges]
        vids = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    outdeg = np.zeros(n)
    for u, _ in darts:
        outdeg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    src = np.array([idx[u] for u, _ in darts])
    dst = np.array([idx[v] for _, v in darts])
    for _ in range(iterations):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] / outdeg[src])
        dangling = r[outdeg == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {v: float(r[idx[v]]) for v in vids}


def components_py(
    edges: list[tuple[int, int]], fixed_iterations: int | None = None
) -> dict[int, int]:
    """BFS components (component id = min vid) — or, with
    ``fixed_iterations``, exactly that many synchronous hash-min
    rounds (matching the fixed-round Spark/SQL mode)."""
    adj = _sym_adj(edges)
    vids = sorted(adj)
    if fixed_iterations is None:
        comp: dict[int, int] = {}
        for v in vids:
            if v in comp:
                continue
            queue, seen = [v], {v}
            while queue:
                x = queue.pop()
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        queue.append(y)
            root = min(seen)
            for x in seen:
                comp[x] = root
        return comp
    lab = {v: v for v in vids}
    for _ in range(fixed_iterations):
        lab = {
            v: min([lab[v]] + [lab[u] for u in adj[v]]) for v in vids
        }
    return lab


def lpa_py(edges: list[tuple[int, int]], iterations: int = 10) -> dict[int, int]:
    """Synchronous LPA: most frequent neighbor label, ties → min."""
    adj = _sym_adj(edges)
    lab = {v: v for v in adj}
    for _ in range(iterations):
        new = {}
        for v in adj:
            cnt = Counter(lab[u] for u in adj[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lab = new
    return lab


def triangles_py(edges: list[tuple[int, int]]) -> tuple[dict[int, int], int]:
    """Per-vertex and total triangle counts via adjacency-set
    intersection."""
    nbr: dict[int, set[int]] = defaultdict(set)
    for u, v in edges:
        nbr[u].add(v)
        nbr[v].add(u)
    per: dict[int, int] = {v: 0 for v in nbr}
    total = 0
    for u, v in edges:
        u, v = min(u, v), max(u, v)
        # each triangle a<b<c counted exactly once: at edge (a,b) with w=c
        for w in nbr[u] & nbr[v]:
            if w > v:
                per[u] += 1
                per[v] += 1
                per[w] += 1
                total += 1
    return per, total


def metrics_py(
    assignments: list[tuple[int, int, int]], k: int
) -> dict[str, float]:
    """Partition-quality metrics from (src, dst, partition) — pure
    Python mirror of /root/reference/partitioner/edgePartitioner.cpp:30-46."""
    mirrors = {(s, p) for s, d, p in assignments} | {
        (d, p) for s, d, p in assignments
    }
    vertices = {x for s, d, _ in assignments for x in (s, d)}
    loads = Counter(p for _, _, p in assignments)
    m = len(assignments)
    return {
        "replicas": len(mirrors),
        "n_vertices": len(vertices),
        "replication_factor": len(mirrors) / len(vertices),
        "max_edge": max(loads.values()),
        "min_edge": min((loads.get(j, 0) for j in range(k))),
        "alpha": max(loads.values()) * k / m,
    }
