"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched UDFs.

The image/audio codec libraries are not in this container, so the
*decode* steps are stubs (clearly marked, raising NotImplementedError
unless ``fake=True`` supplies a deterministic fake decode) — but the
Spark-side plumbing is real and tested: schema, binary columns through
Arrow batches, ``mapInPandas`` batch shapes, partition-preserving
metadata extraction. Swapping a real decoder in changes one function
body, not the pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, width int, height int"
)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table: the documents' text bytes stand
    in for an opaque codec payload (utf-8 encode — reproducible), plus
    typed metadata derived arithmetically from doc_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("media"),
        F.when(F.col("doc_id") % 2 == 0, "image/fake").otherwise("audio/fake").alias(
            "media_type"
        ),
        (F.col("doc_id") % 64 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 48 + 16).cast("int").alias("height"),
    )


def decode_media(media: bytes, media_type: str) -> np.ndarray:
    """STUB — real decode requires PIL/ffmpeg, absent in this
    container. The pipeline calls this through ``extract_features``;
    swap in a real decoder here."""
    raise NotImplementedError(
        "media decode requires an image/audio codec library (not in this "
        "container); use extract_features(..., fake=True) for the "
        "deterministic fake-decode path"
    )


def _fake_decode(media: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: tile the payload bytes into a
    (height, width) uint8 'frame'."""
    buf = np.frombuffer(media, dtype=np.uint8)
    reps = int(np.ceil(width * height / max(1, len(buf))))
    return np.tile(buf, reps)[: width * height].reshape(height, width)


def extract_features(media_df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary media: per row, a
    'decoded frame' (fake or real) → byte-histogram entropy + mean.
    Arrow-batched — the batch shape (pdf of binary cells in, pdf of
    floats out) is exactly what a real decoder needs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "mean_byte": [], "entropy": []}
            for doc_id, media, w, h in zip(
                pdf["doc_id"], pdf["media"], pdf["width"], pdf["height"]
            ):
                frame = (
                    _fake_decode(media, int(w), int(h))
                    if fake
                    else decode_media(media, "")
                )
                hist = np.bincount(frame.ravel(), minlength=256).astype(np.float64)
                p = hist / hist.sum()
                nz = p[p > 0]
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(media))
                out["mean_byte"].append(round(float(frame.mean()), 6))
                out["entropy"].append(round(float(-(nz * np.log2(nz)).sum()), 6))
            yield pd.DataFrame(out)

    return media_df.mapInPandas(
        run, schema="doc_id long, n_bytes long, mean_byte double, entropy double"
    )


def media_stats(media_df: DataFrame) -> DataFrame:
    """Pure-SQL metadata pass over the binary column (no decode):
    payload size + md5 fingerprint — column-prunable, pushdown-safe."""
    return media_df.select(
        "doc_id",
        F.length("media").cast("long").alias("n_bytes"),
        F.md5(F.col("media")).alias("media_md5"),
        "media_type",
        (F.col("width") * F.col("height")).cast("long").alias("n_pixels"),
    )
