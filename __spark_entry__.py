"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: PageRank over the deterministic part
co-occurrence link graph at sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
(SURVEY.md §2); oracles are DuckDB SQL with unrolled fixed-iteration
CTEs for the iterative analytics.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from linkgraph.queries import q_pagerank

    return q_pagerank(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from linkgraph import queries as q
    from linkgraph.pipeline import queries as pq

    return {
        "edges_cooccur": q.q_edges,
        "degrees": q.q_degrees,
        "partition_hash": q.q_partition_hash,
        "partition_dbh": q.q_partition_dbh,
        "partition_grid": q.q_partition_grid,
        "partition_hdrf": q.q_partition_hdrf,
        "partition_greedy": q.q_partition_greedy,
        "partition_ldg": q.q_partition_ldg,
        "partition_fennel": q.q_partition_fennel,
        "vertex_cut_metrics": q.q_vertex_cut_metrics,
        "partition_metrics": q.q_partition_metrics,
        "pagerank": q.q_pagerank,
        "components": q.q_components,
        "label_propagation": q.q_label_propagation,
        "triangles": q.q_triangles,
        "triangle_total": q.q_triangle_total,
        "degree_topk": q.q_degree_topk,
        "events_windowed": q.q_events_windowed,
        "edges_events": q.q_edges_events,
        "events_graph_components": q.q_events_graph_components,
        "events_sessionize": q.q_events_sessionize,
        # training-data pipeline operators
        "token_counts": pq.q_token_counts,
        "text_quality": pq.q_quality,
        "lang_id": pq.q_lang_id,
        "doc_fingerprints": pq.q_fingerprints,
        "dedup_exact": pq.q_dedup_exact,
        "dedup_ngram_jaccard": pq.q_ngram_jaccard,
        "minhash_signatures": pq.q_minhash_signatures,
        "minhash_lsh_candidates": pq.q_minhash_lsh_candidates,
        "simhash": pq.q_simhash,
        "dedup_embedding": pq.q_embedding_dups,
        "knn_bruteforce": pq.q_knn,
        "ann_lsh_buckets": pq.q_ann_buckets,
        "media_stats": pq.q_media_stats,
    }


def oracle_sql() -> dict[str, str]:
    from linkgraph.oracle import sql as o
    from linkgraph.oracle import pipeline_sql as po

    return {
        "edges_cooccur": o.sql_edges(),
        "degrees": o.sql_degrees(),
        "partition_hash": o.sql_partition_hash(),
        "partition_dbh": o.sql_partition_dbh(),
        "partition_grid": o.sql_partition_grid(),
        "partition_metrics": o.sql_partition_metrics(),
        "pagerank": o.sql_pagerank(),
        "components": o.sql_components(),
        "label_propagation": o.sql_label_propagation(),
        "triangles": o.sql_triangles(),
        "triangle_total": o.sql_triangle_total(),
        "degree_topk": o.sql_degree_topk(),
        "events_windowed": o.sql_events_windowed(),
        "edges_events": o.sql_edges_events(),
        "events_graph_components": o.sql_events_graph_components(),
        "events_sessionize": o.sql_events_sessionize(),
        "token_counts": po.sql_token_counts(),
        "text_quality": po.sql_quality(),
        "lang_id": po.sql_lang_id(),
        "doc_fingerprints": po.sql_fingerprints(),
        "dedup_exact": po.sql_dedup_exact(),
        "dedup_ngram_jaccard": po.sql_ngram_jaccard(),
        "minhash_signatures": po.sql_minhash_signatures(),
        "minhash_lsh_candidates": po.sql_minhash_lsh_candidates(),
        "simhash": po.sql_simhash(),
        "dedup_embedding": po.sql_embedding_dups(),
        "knn_bruteforce": po.sql_knn(),
        "ann_lsh_buckets": po.sql_ann_buckets(),
        "media_stats": po.sql_media_stats(),
    }
