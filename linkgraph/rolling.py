"""Rolling localCheckpoint for iterative loops.

Each superstep's localCheckpoint both truncates Catalyst lineage and
pins the materialized blocks in the block manager. Without freeing the
*previous* superstep's blocks, iteration time grows monotonically
(measured: 1.1s → 2.8s over 6 PageRank supersteps at sf0.1; stable at
~0.52s with rolling unpersist). Only the latest snapshot is live — the
predecessor is unreferenced by construction in a synchronous superstep
loop, so freeing it is safe.

The checkpointed blocks belong to the *internal* JVM RDD wrapped by
the returned Dataset's ``LogicalRDD`` plan node — ``DataFrame.rdd``
derives a fresh (never-persisted) RDD, so unpersisting that is a
no-op. We grab the JVM handle off the analyzed plan and unpersist it
directly (verified: the persistent-RDD map shrinks by exactly the
freed id each superstep).

Freeing is lagged by ONE generation (the grandparent is released, the
parent stays live): a localCheckpoint has no lineage to recompute
from, and convergence checks legitimately join the new state against
the immediately-previous one after rolling. Memory is still bounded
at two snapshots instead of growing per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _checkpointed_jrdd(df: DataFrame):
    """The persisted JVM RDD behind a localCheckpointed DataFrame, or
    None if the plan isn't the expected ``LogicalRDD`` shape."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return None
        return plan.rdd()
    except Exception:
        return None


class RollingCheckpoint:
    """Checkpoint a DataFrame eagerly and release the grandparent
    checkpoint's storage blocks (see module docstring)."""

    def __init__(self) -> None:
        self._prev_jrdd = None
        self._grandparent_jrdd = None

    def __call__(self, df: DataFrame, eager: bool = True) -> DataFrame:
        """``eager=False`` defers materialization to the snapshot's
        first consumer job — one fewer job launch per iteration when
        the next iteration's job is guaranteed to read the snapshot
        (the chunked-partitioner state handoff). The caller must ensure
        a consumer runs before the *parent* snapshot could be freed;
        with the two-generation lag here that holds whenever each
        iteration consumes the previous iteration's snapshot."""
        out = df.localCheckpoint(eager=eager)
        if self._grandparent_jrdd is not None:
            try:
                self._grandparent_jrdd.unpersist(False)
            except Exception:
                pass  # block already dropped — nothing to free
        self._grandparent_jrdd = self._prev_jrdd
        self._prev_jrdd = _checkpointed_jrdd(out)
        return out
