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


def _batch_sessions(spark):
    from linkgraph.queries import q_events_sessionize

    return {
        r["user_id"]: (r["n_sessions"], r["max_session_events"])
        for r in q_events_sessionize(spark, "/root/testdata/sf0.001").collect()
    }


def test_stateful_sessionize_single_batch(spark, stream_dir):
    """applyInPandasWithState sessionizer ≡ the batch sessionization
    query when the whole feed arrives in one micro-batch."""
    from linkgraph.streaming import run_sessionize_stream_to_memory

    got_df = run_sessionize_stream_to_memory(spark, stream_dir, "t_sess1")
    got = {
        r["user_id"]: (r["n_sessions"], r["max_session_events"])
        for r in got_df.collect()
    }
    assert got == _batch_sessions(spark)


def test_stateful_sessionize_across_batches(spark, tmp_path):
    """State carries across micro-batches: the feed split into two
    time-ordered files, one batch each, converges to the same per-user
    sessions as the batch query (update mode → take the last update
    per user = the max, sessions are monotone)."""
    import shutil

    from pyspark.sql import functions as F

    from linkgraph.streaming import run_sessionize_stream_to_memory

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    epoch = F.col("ts").cast("timestamp").cast("double")
    cut = ev.agg(
        F.percentile_approx(epoch, F.lit(0.5), F.lit(10000))
    ).first()[0]
    src = str(tmp_path / "events_2batch")
    ev.where(epoch <= cut).coalesce(1).write.mode("overwrite").parquet(
        f"{src}/f=1"
    )
    ev.where(epoch > cut).coalesce(1).write.mode("overwrite").parquet(
        f"{src}/f=2"
    )
    try:
        got_df = run_sessionize_stream_to_memory(
            spark, f"{src}/f=*", "t_sess2", max_files_per_trigger=1
        )
        got = {
            r["user_id"]: (r["n_sessions"], r["max_session_events"])
            for r in got_df.groupBy("user_id")
            .agg(
                F.max("n_sessions").alias("n_sessions"),
                F.max("max_session_events").alias("max_session_events"),
            )
            .collect()
        }
        assert got == _batch_sessions(spark)
    finally:
        shutil.rmtree(src, ignore_errors=True)
