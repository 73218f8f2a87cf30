"""Edge extraction: source-repo table → edge table.

The ingest stage of the north star: from an Iceberg/parquet table
``(repo, path, commit, lang, content)`` (10^12 files at production
scale), parse import statements out of ``content`` inside a vectorized
Arrow UDF, resolve them to file vertex ids, and emit ``edges(src,
dst)`` — dropping self-loops (reference parity:
/root/reference/converter/conversions.hpp:52-56) and deduplicating.

Per-row sha256 invariant (north rule): the Arrow UDF computes
``hashlib.sha256(content)`` on the Python side of the boundary; the
result is joined back against the JVM-side ``F.sha2(content, 256)`` of
the source table and any mismatch (data corruption crossing the Arrow
boundary, encoding drift) fails the job. ``verify_sha`` returns the
mismatch count so tests can assert 0 and corruption tests can assert
detection.

Scale shape: the only wide ops are the resolve join (imports ⋈ file
ids on (repo, path) — shuffle on a composite key with near-uniform
distribution) and the final dedup. Column pruning keeps the 100 TB
``content`` column out of every stage after parsing.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMPORT_RE = re.compile(r"^import\s+([A-Za-z0-9_]+)\.([A-Za-z0-9_.]+)$", re.MULTILINE)


def file_ids(files: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Dense 0-based vertex id per (repo, path), ordered by (repo,
    path) — the Spark analog of the reference's contiguous vid contract
    (/root/reference/README.md:23-27) — WITHOUT a global sort:
    range-repartition on the key (contiguous key ranges per partition),
    sort within partitions only, then add per-partition offsets
    computed from a P-row size aggregate (P = #partitions — driver
    state is O(P), never O(|V|)). Produces exactly the ids of
    ``row_number() over (order by repo, path)`` (pinned in
    tests/test_extract.py) but the plan carries no SinglePartition
    exchange — the global-window formulation serializes 10^12 rows
    through one task."""
    distinct = files.select("repo", "path").distinct()
    spark = files.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    parts = (
        distinct.repartitionByRange(p, "repo", "path")
        .sortWithinPartitions("repo", "path")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    sizes = {
        r["_pid"]: r["count"] for r in parts.groupBy("_pid").count().collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    def add_ids(batches):
        seen = 0  # one invocation per partition → per-partition counter
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = offsets.get(int(pdf["_pid"].iloc[0]), 0)
            out = pdf[["repo", "path"]].copy()
            out["vid"] = pd.RangeIndex(base + seen, base + seen + len(pdf)).astype(
                "int64"
            )
            seen += len(pdf)
            yield out

    return parts.mapInPandas(add_ids, schema="repo string, path string, vid long")


def parse_imports(files: DataFrame, langs: tuple[str, ...] = ("python",)) -> DataFrame:
    """mapInArrow over code rows → (repo, path, sha_py, imp_repo,
    imp_path); one output row per import statement."""

    def parse(batches):
        for batch in batches:
            pdf = batch.to_pandas()
            out = {"repo": [], "path": [], "sha_py": [], "imp_repo": [], "imp_path": []}
            for repo, path, content in zip(pdf["repo"], pdf["path"], pdf["content"]):
                sha = hashlib.sha256(content.encode("utf-8")).hexdigest()
                for m in IMPORT_RE.finditer(content):
                    imp_repo, dotted = m.group(1), m.group(2)
                    out["repo"].append(repo)
                    out["path"].append(path)
                    out["sha_py"].append(sha)
                    out["imp_repo"].append(imp_repo)
                    out["imp_path"].append(dotted.replace(".", "/") + ".py")
            yield pa.RecordBatch.from_pandas(
                pd.DataFrame(out), preserve_index=False
            )

    code = files.where(F.col("lang").isin(*langs)).select("repo", "path", "content")
    return code.mapInArrow(
        parse,
        schema="repo string, path string, sha_py string, imp_repo string, imp_path string",
    )


def verify_sha(files: DataFrame, parsed: DataFrame) -> int:
    """North-rule per-row invariant: Python-side sha256 must equal the
    JVM-side sha2 for every extracted row. Returns mismatch count."""
    jvm = files.select(
        "repo", "path", F.sha2(F.col("content"), 256).alias("sha_jvm")
    )
    return (
        parsed.select("repo", "path", "sha_py")
        .distinct()
        .join(jvm, ["repo", "path"])
        .where(F.col("sha_py") != F.col("sha_jvm"))
        .count()
    )


def extract_edges(
    files: DataFrame,
    langs: tuple[str, ...] = ("python",),
    enforce_sha: bool = True,
) -> DataFrame:
    """Full extraction: parse → sha-verify → resolve to vids →
    self-loop filter → dedup → canonical undirected (src < dst)."""
    # cache: the Arrow parse over the full content column is the most
    # expensive stage of the job — without this, verify_sha's action
    # and the resolve joins would each run it (2× the 100 TB scan)
    parsed = parse_imports(files, langs).cache()
    if enforce_sha:
        bad = verify_sha(files, parsed)
        if bad:
            raise ValueError(f"sha256 invariant violated on {bad} rows")
    # vertex universe = code files only (non-code rows are not graph
    # vertices and must not shift the dense id space)
    ids = file_ids(files.where(F.col("lang").isin(*langs))).cache()
    src_ids = ids.withColumnRenamed("vid", "src")
    dst_ids = (
        ids.withColumnRenamed("repo", "imp_repo")
        .withColumnRenamed("path", "imp_path")
        .withColumnRenamed("vid", "dst")
    )
    edges = (
        parsed.join(src_ids, ["repo", "path"])
        .join(dst_ids, ["imp_repo", "imp_path"])
        .select("src", "dst")
    )
    canonical = edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    )
    return canonical.where(F.col("src") != F.col("dst")).distinct()
