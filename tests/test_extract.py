"""Edge extraction from the synthetic source-repo corpus: ground-truth
parity, lang filtering, sha256 invariant (and its violation path)."""

import pytest
from pyspark.sql import functions as F

from linkgraph.extract import extract_edges, file_ids, parse_imports, verify_sha
from linkgraph.synth import source_repo_table


@pytest.fixture(scope="module")
def corpus(spark):
    return source_repo_table(spark, shape="powerlaw_ba", n=60, m=2, seed=42)


def test_extraction_matches_ground_truth(spark, corpus):
    files, truth = corpus
    code = files.where(F.col("lang") == "python")
    ids = {(r["repo"], r["path"]): r["vid"] for r in file_ids(code).collect()}
    # ground-truth vids are the generator's dense ids; extraction ids
    # come from sorted (repo, path) order over code files — same order
    # by construction
    got = {(r["src"], r["dst"]) for r in extract_edges(files).collect()}
    want = {(min(u, v), max(u, v)) for u, v in truth}
    assert got == want
    assert len(ids) == max(v for e in truth for v in e) + 1


def test_text_rows_produce_no_edges(spark, corpus):
    files, _ = corpus
    parsed = parse_imports(files, langs=("python",))
    joined = parsed.join(
        files.where(F.col("lang") == "text").select("repo", "path"),
        ["repo", "path"],
    )
    assert joined.count() == 0


def test_sha_invariant_holds(spark, corpus):
    files, _ = corpus
    assert verify_sha(files, parse_imports(files)) == 0


def test_sha_invariant_detects_corruption(spark, corpus):
    files, _ = corpus
    parsed = parse_imports(files)
    # corrupt the source table after parsing (simulates content drift
    # between extraction passes)
    corrupted = files.withColumn(
        "content", F.concat(F.col("content"), F.lit("x"))
    )
    assert verify_sha(corrupted, parsed) > 0


def test_extract_edges_raises_on_corruption(spark, corpus):
    files, _ = corpus
    # a content column that differs between the Python hash path and
    # the JVM hash path cannot be constructed (both hash the same
    # bytes); instead assert the guard wiring: enforce_sha=True runs
    # clean on a valid corpus
    edges = extract_edges(files, enforce_sha=True)
    assert edges.count() > 0


def test_no_self_loops_and_canonical(spark, corpus):
    files, _ = corpus
    e = extract_edges(files)
    assert e.where(F.col("src") >= F.col("dst")).count() == 0
    assert e.count() == e.distinct().count()


def test_edges_from_events_contract(spark):
    """Second graph source honors the edge contract: src < dst,
    distinct, no self-loops, deterministic across invocations."""
    from linkgraph.graph import edges_from_events

    e1 = edges_from_events(spark, "/root/testdata/sf0.001")
    rows = e1.collect()
    assert all(r["src"] < r["dst"] for r in rows)
    assert len(rows) == len({(r["src"], r["dst"]) for r in rows})
    rows2 = edges_from_events(spark, "/root/testdata/sf0.001").collect()
    assert {(r["src"], r["dst"]) for r in rows} == {
        (r["src"], r["dst"]) for r in rows2
    }
