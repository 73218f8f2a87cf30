"""Deterministic synthetic fixtures (FIXTURES.md F1/F2) — no external
data; everything derives from an explicit seed.

``graph_edges`` produces the known-a-priori ground-truth edge list;
``source_repo_table`` embeds those edges as ``import`` lines inside the
``content`` column of a (repo, path, commit, lang, content) table — the
BASELINE.json input shape — so extraction output is checkable exactly.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import DataFrame, SparkSession


# ------------------------------------------------------------ graphs

def graph_edges(shape: str, seed: int = 42, **params) -> list[tuple[int, int]]:
    """Known graph shapes (FIXTURES.md F2): canonical one-direction
    undirected edges (src < dst), deduplicated, no self-loops."""
    if shape == "triangle3":
        return [(0, 1), (0, 2), (1, 2)]
    if shape == "star_hub":
        leaves = params.get("leaves", 50)
        return [(0, i) for i in range(1, leaves + 1)]
    if shape == "two_cliques_bridge":
        edges = []
        for base in (0, 5):
            for i in range(5):
                for j in range(i + 1, 5):
                    edges.append((base + i, base + j))
        edges.append((4, 5))  # bridge
        return sorted(set(edges))
    if shape == "path_chain":
        n = params.get("n", 100)
        return [(i, i + 1) for i in range(n - 1)]
    if shape == "powerlaw_ba":
        return _barabasi_albert(
            params.get("n", 1000), params.get("m", 3), seed
        )
    if shape == "disconnected":
        pl = _barabasi_albert(params.get("n", 200), 3, seed)
        offset = 1000
        tail = [(offset + i, offset + i + 1) for i in range(9)]
        return sorted(set(pl)) + tail
    raise ValueError(f"unknown shape {shape!r}")


def _barabasi_albert(n: int, m: int, seed: int) -> list[tuple[int, int]]:
    """Seeded Barabási–Albert preferential attachment (power-law degree
    distribution — the regime DBH/HDRF are designed for)."""
    rng = random.Random(seed)
    targets = list(range(m))
    repeated: list[int] = []
    edges: set[tuple[int, int]] = set()
    for v in range(m, n):
        for t in targets:
            edges.add((min(v, t), max(v, t)))
        repeated.extend(targets)
        repeated.extend([v] * m)
        targets = list({rng.choice(repeated) for _ in range(m * 2)})[:m]
        while len(targets) < m:
            t = rng.randrange(v + 1)
            if t not in targets:
                targets.append(t)
    return sorted(edges)


# ------------------------------------------------------- repo corpus

def _vid_to_file(vid: int, files_per_repo: int) -> tuple[str, str]:
    repo = f"repo{vid // files_per_repo:04d}"
    local = vid % files_per_repo
    return repo, f"pkg{local // 10}/mod{local % 10}.py"


def _import_token(vid: int, files_per_repo: int) -> str:
    repo, path = _vid_to_file(vid, files_per_repo)
    mod = path.replace("/", ".")[: -len(".py")]
    return f"{repo}.{mod}"


FILLER_WORDS = [
    "graph", "edge", "vertex", "partition", "stream", "rank", "merge",
    "batch", "degree", "mirror", "shard", "superstep",
]


def source_repo_table(
    spark: SparkSession,
    shape: str = "powerlaw_ba",
    seed: int = 42,
    files_per_repo: int = 50,
    **params,
) -> tuple[DataFrame, list[tuple[int, int]]]:
    """Build the (repo, path, commit, lang, content) corpus embedding
    ``graph_edges(shape, seed)`` as import lines. Returns (table,
    ground_truth_edges). Every vertex becomes one python file; a few
    extra ``lang='text'`` rows carry import-looking lines that must NOT
    produce edges (negative extraction fixture)."""
    edges = graph_edges(shape, seed, **params)
    n = max(v for e in edges for v in e) + 1
    out_edges: dict[int, list[int]] = {}
    for u, v in edges:
        out_edges.setdefault(u, []).append(v)

    rng = random.Random(seed * 31 + 7)
    rows = []
    for vid in range(n):
        repo, path = _vid_to_file(vid, files_per_repo)
        commit = hashlib.sha1(repo.encode()).hexdigest()
        imports = [
            f"import {_import_token(t, files_per_repo)}"
            for t in sorted(out_edges.get(vid, []))
        ]
        filler = " ".join(rng.choice(FILLER_WORDS) for _ in range(rng.randrange(5, 25)))
        content = "\n".join(
            [f"# file {vid} of {n}", *imports, f'"""{filler}"""']
        )
        rows.append((repo, path, commit, "python", content))
    # negative rows: text files whose import-like lines must be ignored
    for i in range(3):
        rows.append(
            (
                f"repo{i:04d}",
                f"README{i}.md",
                hashlib.sha1(f"repo{i:04d}".encode()).hexdigest(),
                "text",
                f"import {_import_token((i * 7) % n, files_per_repo)}\nnot code",
            )
        )
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    return df, edges
