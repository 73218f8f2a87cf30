"""Structured Streaming twin of the batch windowed-counts query:
file source → watermark + tumbling window → memory sink, drained
synchronously; results must equal the batch query."""

import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def stream_dir(spark, tmp_path):
    src = str(tmp_path / "events_in")
    (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .repartition(2)
        .write.mode("overwrite")
        .parquet(src)
    )
    yield src
    shutil.rmtree(src, ignore_errors=True)


def test_stream_matches_batch(spark, stream_dir):
    from linkgraph.streaming import run_stream_to_memory

    got = run_stream_to_memory(spark, stream_dir, query_name="t_agg")
    batch = (
        spark.read.parquet(stream_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n", "sum_value")
    )
    g = {(r["hour"], r["event_type"]): (r["n"], r["sum_value"]) for r in got.collect()}
    b = {(r["hour"], r["event_type"]): (r["n"], r["sum_value"]) for r in batch.collect()}
    assert g == b
    assert len(g) > 0
