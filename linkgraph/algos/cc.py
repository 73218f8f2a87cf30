"""Connected components via hash-min label exchange (Pregel-style).

label(v) ← min(label(v), min_{u ∈ N(v)} label(u)) until fixpoint;
initial label = vid; component id = min vid in the component.

Scale notes: plain hash-min needs O(diameter) supersteps — fine for
link graphs (small diameter); each superstep is one join + one
partial-aggregated min. For adversarial long-chain graphs, enable
``pointer_jumping=True``: after each neighbor-min round the labels are
compressed through one label→label(label) self-join (Shiloach-Vishkin
style halving), giving O(log n) convergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    max_iterations: int = 50,
    fixed_iterations: int | None = None,
    pointer_jumping: bool | None = None,
    checkpoint_every: int = 1,
    init_labels: DataFrame | None = None,
) -> DataFrame:
    """Returns ``DataFrame[vid: long, component: long]``.

    ``init_labels`` (DataFrame[vid, component]) warm-starts from a
    previous run's components — the incremental-edges story for CC:
    new edges only MERGE components, and hash-min converges to the
    minimum of the INITIAL labels over each (new) component, which for
    old-component ids is exactly the new component's min vid — the
    same answer as a cold start, reached in O(diameter of the
    component-merge graph) rounds instead of O(diameter of the full
    graph). Vertices absent from ``init_labels`` start at their own
    vid (tests/test_algos.py pins warm ≡ cold-converged).

    ``fixed_iterations`` runs exactly that many synchronous rounds
    without a convergence check (deterministic regardless of
    convergence — used by the SQL-oracle parity harness) and disables
    pointer jumping by default so the plain unrolled SQL oracle
    matches; default (convergence) mode enables pointer jumping —
    O(log n) rounds instead of O(diameter).

    ``checkpoint_every=1`` is deliberate, not conservative: each
    round's plan references the previous labels TWICE (the neighbor
    join and the fixpoint union; pointer jumping adds a third), and
    Spark re-executes uncheckpointed subtrees per reference — cost
    doubles per un-checkpointed round (measured at sf0.1: 80s at
    every-3 vs 5-12s at every-1 for the same 12 rounds).
    """
    from linkgraph.graph import join_ready, symmetrize, vertices

    if pointer_jumping is None:
        pointer_jumping = fixed_iterations is None

    from linkgraph.rolling import RollingCheckpoint

    roll = RollingCheckpoint()
    # join_ready: one upfront shuffle+sort of the static edge side so
    # every superstep's join reuses the cached partitioning/ordering
    # instead of re-exchanging+re-sorting |E| rows per round (§2.4)
    sym = join_ready(symmetrize(edges), "src").cache()
    if init_labels is not None:
        labels = roll(
            vertices(edges)
            .join(
                init_labels.select("vid", F.col("component").alias("_c0")),
                "vid",
                "left",
            )
            .select(
                "vid", F.coalesce(F.col("_c0"), F.col("vid")).alias("component")
            )
        )
    else:
        labels = vertices(edges).withColumn("component", F.col("vid"))

    rounds = fixed_iterations if fixed_iterations is not None else max_iterations
    prev_sum = None
    for i in range(rounds):
        nbr = sym.join(labels, sym["src"] == labels["vid"]).select(
            F.col("dst").alias("vid"), F.col("component")
        )
        new_labels = (
            nbr.unionByName(labels.select("vid", "component"))
            .groupBy("vid")
            .agg(F.min("component").alias("component"))
        )
        if pointer_jumping:
            # compress: component ← label(component) where known
            lab2 = new_labels.select(
                F.col("vid").alias("c_vid"), F.col("component").alias("c_comp")
            )
            new_labels = (
                new_labels.join(
                    lab2, new_labels["component"] == lab2["c_vid"], "left"
                )
                .select(
                    "vid",
                    F.coalesce(F.col("c_comp"), F.col("component")).alias(
                        "component"
                    ),
                )
            )
        at_checkpoint = (i + 1) % checkpoint_every == 0 or i == rounds - 1
        obs = None
        if fixed_iterations is None and at_checkpoint:
            # Convergence rides the checkpoint as an Observation (the
            # scc.py pattern): labels are monotone non-increasing per
            # vertex, so the exact decimal sum is unchanged between
            # two checkpoints iff no label moved — and the eager
            # checkpoint is already an action, so the sum costs ZERO
            # extra jobs (previously one agg job per checkpoint).
            # decimal(38,0): exact and overflow-safe at 10^12
            # vertices × 64-bit ids.
            from pyspark.sql import Observation

            obs = Observation()
            new_labels = new_labels.observe(
                obs, F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
            )
        if at_checkpoint:
            new_labels = roll(new_labels)
        labels = new_labels
        if obs is not None:
            cur_sum = obs.get["s"]
            if prev_sum is not None and cur_sum == prev_sum:
                break
            prev_sum = cur_sum
    return labels.select("vid", "component")
