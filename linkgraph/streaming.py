"""Structured Streaming surface.

The reference is batch-only (its "streaming" partitioners are
single-pass in-memory loops — SURVEY.md §2.3), and the link-graph
engine is batch-iterative by design. This module exists for the
*pipeline* side: incremental event/document feeds. It mirrors the
batch operators' semantics so a feed can be switched between batch
and streaming without changing downstream tables.

Tested with the file source + memory sink + ``processAllAvailable``
(synchronous drain — no codec or broker needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-based event stream (parquet drops into ``path``); swap the
    format for kafka in production — downstream is identical."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(path)
    )


def windowed_counts_stream(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows per event_type with a 2-hour watermark
    for late data — the streaming twin of the batch
    ``events_windowed_counts`` query."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour"), "event_type", "n", "sum_value"
        )
    )


def run_stream_to_memory(
    spark: SparkSession, src_path: str, query_name: str = "events_agg"
) -> DataFrame:
    """Drive the stream synchronously to completion (test/demo path):
    read files → windowed agg → memory sink → drain → return the
    result table."""
    agg = windowed_counts_stream(read_event_stream(spark, src_path))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
