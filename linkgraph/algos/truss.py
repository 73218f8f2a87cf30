"""k-truss decomposition (edge-support peeling) — the cohesive-
subgraph companion to k-core (``algos/kcore.py``): the k-truss is the
maximal subgraph where every edge closes at least k-2 triangles
*within the subgraph*. Computed by the standard peel: per round,
count each edge's triangle support over the surviving edge set and
drop edges below k-2; supports only shrink, so the fixpoint is
reached once a round removes nothing and a fixed round count ≥ the
peel depth is exact (same argument as the k-core driver gate).

Scale shape per round: one degree-oriented triangle enumeration
(``triangle_list`` — wedge fan-out bounded by oriented out-degree,
O(√m) even on power-law graphs), one explode-to-edges partial-
aggregated count, one join back to the edge set. The surviving edge
set is rolled through localCheckpoint every round (it is referenced
four times per round: three enumeration legs + the survivor join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edge_support(edges: DataFrame) -> DataFrame:
    """Triangle support per canonical edge →
    ``DataFrame[src, dst, supp]`` (edges in no triangle absent)."""
    from linkgraph.algos.triangles import triangle_list

    tri = triangle_list(edges)
    pairs = (
        tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(tri.select(F.col("a").alias("u"), F.col("c").alias("v")))
        .unionAll(tri.select(F.col("b").alias("u"), F.col("c").alias("v")))
    )
    # triangle_list emits orientation order — canonicalize to src<dst
    return (
        pairs.select(
            F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst")
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("supp"))
    )


def k_truss(
    edges: DataFrame,
    k: int = 4,
    max_rounds: int = 30,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """Edges of the k-truss → ``DataFrame[src, dst]`` (canonical
    src < dst). ``fixed_rounds`` runs exactly that many peel rounds
    (driver-gate mode — exact once ≥ the peel depth); otherwise peels
    until a round removes no edge (one count action per round)."""
    from linkgraph.rolling import RollingCheckpoint

    roll = RollingCheckpoint()
    e = edges.select("src", "dst")
    n_prev = None if fixed_rounds is not None else e.count()
    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    for _ in range(rounds):
        supp = edge_support(e)
        e = roll(
            e.join(supp, ["src", "dst"])
            .where(F.col("supp") >= k - 2)
            .select("src", "dst")
        )
        if fixed_rounds is None:
            n = e.count()
            if n == n_prev:
                break
            n_prev = n
    return e
