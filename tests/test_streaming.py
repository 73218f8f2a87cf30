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


def test_watermark_drops_late_events(spark, tmp_path):
    """The 2-hour watermark must actually DROP late data. Batch 1
    carries events through hour 10; batch 2 (hour 12) lets the 08:00
    watermark finalize + evict the hour-01 window (append mode emits
    it); batch 3 then delivers a LATE hour-01:45 event — below the
    watermark, its state already evicted ⇒ dropped pre-aggregation.
    The finalized hour-01 window holds ONLY batch 1's two events,
    while the batch twin over the same files counts all three — the
    difference is the watermark working. (Learned empirically: a late
    row landing while its window state is still LIVE is admitted —
    the watermark is a one-sided bound — so the drop needs the eviction
    batch in between.)"""
    import os
    import time as _time

    from linkgraph.streaming import EVENTS_SCHEMA, windowed_counts_stream

    src = str(tmp_path / "late_in")
    os.makedirs(src, exist_ok=True)

    def _rows(specs):
        return spark.createDataFrame(
            [
                (i, 100 + i, f"2024-01-01 {h:02d}:{m:02d}:00", "click", 1.0)
                for i, (h, m) in enumerate(specs)
            ],
            "event_id long, user_id long, ts string, event_type string, value double",
        ).select(
            "event_id", "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "event_type", "value",
        )

    _rows([(1, 0), (1, 30), (10, 0)]).coalesce(1).write.mode("overwrite").parquet(
        f"{src}/b1"
    )
    _time.sleep(1.1)  # file source orders micro-batches by mod time
    _rows([(12, 0)]).coalesce(1).write.mode("overwrite").parquet(f"{src}/b2")
    _time.sleep(1.1)
    _rows([(1, 45), (13, 0)]).coalesce(1).write.mode("overwrite").parquet(
        f"{src}/b3"
    )

    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*/*.parquet")
    )
    agg = windowed_counts_stream(events)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (str(r["hour"]), r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM t_late").collect()
    }
    # hour-01 window finalized with batch 1's TWO events only — the
    # hour-01:45 event from batch 2 arrived below the 08:00 watermark
    assert got[("2024-01-01 01:00:00", "click")] == 2
    # the batch twin (no watermark) counts all three
    batch = (
        spark.read.parquet(f"{src}/b*/*.parquet")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .count()
        .where(F.col("w.start") == "2024-01-01 01:00:00")
        .first()
    )
    assert batch["count"] == 3


def test_streaming_dedup_across_batches(spark, tmp_path):
    """Cross-batch exact dedup: a duplicate text arriving in a LATER
    micro-batch is dropped by the streaming state; with doc_id-ordered
    arrival the survivor set equals the batch dedup_exact keepers
    (min doc_id per text)."""
    import shutil

    from linkgraph.pipeline.dedup import dedup_exact
    from linkgraph.streaming import run_dedup_stream_to_memory

    rows1 = [(1, "alpha beta gamma", "en", "s0", 16),
             (2, "delta epsilon", "en", "s0", 13)]
    rows2 = [(3, "alpha beta gamma", "en", "s1", 16),  # dup of 1
             (4, "zeta eta", "en", "s1", 8)]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    src = str(tmp_path / "docs_2batch")
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(f"{src}/f=1")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(f"{src}/f=2")
    try:
        got = {
            r["doc_id"]
            for r in run_dedup_stream_to_memory(
                spark, f"{src}/f=*", "t_dedup2", max_files_per_trigger=1
            ).collect()
        }
        assert got == {1, 2, 4}  # 3 dropped as a cross-batch dup
        # batch keeper per text = min doc_id -> same survivor set
        batch = spark.createDataFrame(rows1 + rows2, schema)
        keepers = {
            r["canonical_doc_id"] for r in dedup_exact(batch).collect()
        }
        assert got == keepers
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_streaming_degrees_match_batch_across_batches(spark, tmp_path):
    """Incremental degree maintenance: edges arrive in two drops; the
    maintained table after each drain equals the batch ``degrees`` of
    everything seen so far (the ingest-time degree story, streaming)."""
    from linkgraph.graph import degrees
    from linkgraph.streaming import degree_stream, read_edge_stream

    src = str(tmp_path / "edges_in")
    batch1 = [(0, 1), (1, 2), (2, 3), (3, 3)]  # (3,3) self-loop dropped
    batch2 = [(0, 2), (4, 5), (1, 2)]  # parallel (1,2) counts again
    spark.createDataFrame(batch1, "src long, dst long").repartition(
        1
    ).write.mode("overwrite").parquet(src)

    out = degree_stream(read_edge_stream(spark, src))
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_deg")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {
            r["vid"]: r["degree"]
            for r in spark.sql("SELECT * FROM t_deg").collect()
        }
        e1 = spark.createDataFrame(
            [e for e in batch1 if e[0] != e[1]], "src long, dst long"
        )
        b1 = {r["vid"]: r["degree"] for r in degrees(e1).collect()}
        assert got1 == b1

        spark.createDataFrame(batch2, "src long, dst long").repartition(
            1
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
        got2 = {
            r["vid"]: r["degree"]
            for r in spark.sql("SELECT * FROM t_deg").collect()
        }
    finally:
        q.stop()
    all_edges = spark.createDataFrame(
        [e for e in batch1 + batch2 if e[0] != e[1]], "src long, dst long"
    )
    b2 = {r["vid"]: r["degree"] for r in degrees(all_edges).collect()}
    assert got2 == b2
    # vertex 2 appears in (1,2), (2,3), (0,2), (1,2) — the parallel
    # (1,2) counts per occurrence, matching the batch contract
    assert got2[2] == 4


def test_streaming_strength_matches_batch_across_batches(spark, tmp_path):
    """Weighted twin of the streaming degree test: two weighted edge
    drops; after each drain the maintained (degree, strength) table
    equals the batch aggregate of everything seen so far."""
    from pyspark.sql import functions as F

    from linkgraph.streaming import read_weighted_edge_stream, strength_stream

    src = str(tmp_path / "wedges_in")
    batch1 = [(0, 1, 5), (1, 2, 3), (2, 2, 9)]  # self-loop dropped
    batch2 = [(0, 2, 1), (1, 2, 2)]  # parallel (1,2) accumulates

    def batch_expected(rows):
        clean = [r for r in rows if r[0] != r[1]]
        exp: dict[int, list[int]] = {}
        for s, d, w in clean:
            for v in (s, d):
                deg, st = exp.get(v, (0, 0))
                exp[v] = (deg + 1, st + w)
        return exp

    spark.createDataFrame(
        batch1, "src long, dst long, weight long"
    ).repartition(1).write.mode("overwrite").parquet(src)
    out = strength_stream(read_weighted_edge_stream(spark, src))
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_strength")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {
            r["vid"]: (r["degree"], r["strength"])
            for r in spark.sql("SELECT * FROM t_strength").collect()
        }
        assert got1 == batch_expected(batch1)

        spark.createDataFrame(
            batch2, "src long, dst long, weight long"
        ).repartition(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got2 = {
            r["vid"]: (r["degree"], r["strength"])
            for r in spark.sql("SELECT * FROM t_strength").collect()
        }
        assert got2 == batch_expected(batch1 + batch2)
    finally:
        q.stop()


def test_streaming_cms_cells_match_batch_across_batches(spark, tmp_path):
    """Streaming Count-Min maintenance: token drops arrive in two
    micro-batches; the maintained D×W cell table equals the batch
    sketch's cell sums over the full corpus (constant-size keyed
    state — the streaming-sketch story)."""
    import shutil

    from pyspark.sql import functions as F

    from linkgraph.hashing import md5_prefix_hash
    from linkgraph.pipeline.sketches import CMS_D, CMS_W
    from linkgraph.streaming import run_cms_stream_to_memory

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    rows1 = [(1, "alpha beta alpha", "en", "s0", 16)]
    rows2 = [(2, "beta gamma", "en", "s0", 10), (3, "alpha", "en", "s1", 5)]
    src = str(tmp_path / "cms_docs")
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(f"{src}/f=1")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(f"{src}/f=2")
    try:
        got = {
            (r["row"], r["bucket"]): r["cell_sum"]
            for r in run_cms_stream_to_memory(
                spark, f"{src}/f=*", "t_cms", max_files_per_trigger=1
            ).collect()
        }
        # batch reference: explode all tokens, same D hashes
        toks = spark.createDataFrame(rows1 + rows2, schema).select(
            F.explode(F.split("text", " ")).alias("tok")
        )
        want = {}
        for i in range(CMS_D):
            for r in (
                toks.select(
                    (md5_prefix_hash(F.lit(str(i)), F.col("tok")) % CMS_W).alias("b")
                )
                .groupBy("b")
                .count()
                .collect()
            ):
                want[(i, r["b"])] = r["count"]
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
