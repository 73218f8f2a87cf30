"""Driver-facing pipeline queries (dedup / similarity / text /
multimodal) over the documents and embeddings testdata tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from linkgraph.pipeline import dedup, multimodal, similarity, text


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q_token_counts(spark, sf_dir):
    return text.token_counts(_docs(spark, sf_dir))


def q_quality(spark, sf_dir):
    return text.quality_scores(_docs(spark, sf_dir))


def q_lang_id(spark, sf_dir):
    return text.lang_id(_docs(spark, sf_dir))


def q_fingerprints(spark, sf_dir):
    return text.fingerprints(_docs(spark, sf_dir))


def q_dedup_exact(spark, sf_dir):
    return dedup.dedup_exact(_docs(spark, sf_dir))


def q_ngram_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.1)


def q_minhash_signatures(spark, sf_dir):
    return dedup.minhash_signatures(_docs(spark, sf_dir))


def q_minhash_lsh_candidates(spark, sf_dir):
    return dedup.minhash_lsh_candidates(_docs(spark, sf_dir))


def q_simhash(spark, sf_dir):
    return dedup.simhash(_docs(spark, sf_dir))


def q_embedding_dups(spark, sf_dir):
    return dedup.embedding_dup_pairs(_emb(spark, sf_dir), threshold=0.5)


def q_knn(spark, sf_dir):
    return similarity.knn_bruteforce(_emb(spark, sf_dir), n_queries=10, k=5)


def q_ann_buckets(spark, sf_dir):
    return similarity.lsh_bucket_ids(_emb(spark, sf_dir))


def q_media_stats(spark, sf_dir):
    return multimodal.media_stats(multimodal.synthesize_media(spark, sf_dir))


def q_dedup_clusters(spark, sf_dir):
    return dedup.dedup_clusters(_docs(spark, sf_dir))


def q_ann_ivf_cells(spark, sf_dir):
    from linkgraph.pipeline import similarity

    return similarity.ivf_cells(_emb(spark, sf_dir))


def q_stratified_sample(spark, sf_dir):
    from linkgraph.pipeline import sampling

    return sampling.stratified_sample(_docs(spark, sf_dir))


def q_sample_rates(spark, sf_dir):
    from linkgraph.pipeline import sampling

    return sampling.sample_rates_realized(_docs(spark, sf_dir))


def q_pii_stats(spark, sf_dir):
    return text.pii_stats(_docs(spark, sf_dir))


def q_contamination(spark, sf_dir):
    return text.contamination(_docs(spark, sf_dir))


def q_pack_sequences(spark, sf_dir):
    from linkgraph.pipeline import sampling

    return sampling.pack_sequences(_docs(spark, sf_dir))


def q_domain_cap(spark, sf_dir):
    from linkgraph.pipeline import sampling

    return sampling.domain_cap(_docs(spark, sf_dir))


def q_vocab_topk(spark, sf_dir):
    return text.vocab_topk(_docs(spark, sf_dir))


def q_repetition_ratio(spark, sf_dir):
    return text.repetition_ratio(_docs(spark, sf_dir))


def q_unigram_logprob(spark, sf_dir):
    return text.unigram_logprob(_docs(spark, sf_dir))


def q_tfidf_top_terms(spark, sf_dir):
    return text.tfidf_top_terms(_docs(spark, sf_dir))


def q_chunk_documents(spark, sf_dir):
    return text.chunk_documents(_docs(spark, sf_dir))


def q_mixture_weights(spark, sf_dir):
    from linkgraph.pipeline import sampling

    return sampling.mixture_weights(_docs(spark, sf_dir))


def q_source_lang_entropy(spark, sf_dir):
    from linkgraph.pipeline import sampling

    return sampling.source_lang_entropy(_docs(spark, sf_dir))


def q_dup_rate_by_source(spark, sf_dir):
    return dedup.dup_rate_by_source(_docs(spark, sf_dir))


def q_dup_ngram_coverage(spark, sf_dir):
    return dedup.dup_ngram_coverage(_docs(spark, sf_dir))


def q_dedup_canonical(spark, sf_dir):
    return dedup.dedup_canonical(_docs(spark, sf_dir))


def q_hll_distinct(spark, sf_dir):
    from linkgraph.pipeline import sketches

    return sketches.hll_distinct(_docs(spark, sf_dir))


def q_heavy_hitters(spark, sf_dir):
    from linkgraph.pipeline import sketches

    return sketches.heavy_hitters_cms(_docs(spark, sf_dir))


def q_bigram_logprob(spark, sf_dir):
    return text.bigram_logprob(_docs(spark, sf_dir))


def q_ivf_cell_stats(spark, sf_dir):
    from linkgraph.pipeline import similarity

    return similarity.ivf_cell_stats(_emb(spark, sf_dir))


def q_quality_by_source(spark, sf_dir):
    return text.quality_by_source(_docs(spark, sf_dir))


def q_doc_length_quantiles(spark, sf_dir):
    return text.doc_length_quantiles(_docs(spark, sf_dir))


def q_bloom_membership(spark, sf_dir):
    from linkgraph.pipeline import sketches

    return sketches.bloom_membership(_docs(spark, sf_dir))


def q_verified_sim_pairs(spark, sf_dir):
    from linkgraph.pipeline import similarity

    return similarity.verified_sim_pairs(_emb(spark, sf_dir))
