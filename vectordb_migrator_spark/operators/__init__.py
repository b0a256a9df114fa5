"""Operator library — pure DataFrame -> DataFrame functions.

Flat lazy re-exports (PEP 562) so users can write
``from vectordb_migrator_spark.operators import semantic_dedup``
without paying import time for modules they don't touch (and without
risking import cycles between operator modules).
"""

from __future__ import annotations

import importlib

_EXPORTS = {
    # dedup
    "exact_dedup": "dedup",
    "exact_text_dedup": "dedup",
    "ngram_jaccard_pairs": "dedup",
    "ngram_containment_pairs": "dedup",
    "minhash_md5_pairs": "dedup",
    "simhash_md5_pairs": "dedup",
    "minhash_near_dup_pairs": "dedup",
    "simhash_near_dup_pairs": "dedup",
    "embedding_near_dup_pairs": "dedup",
    "lsh_embedding_near_dup_pairs": "dedup",
    "lsh_embedding_near_dup_pairs_multi": "dedup",
    "semantic_dedup": "dedup",
    "embedding_cross_near_dup": "dedup",
    "apply_dedup": "dedup",
    "apply_dedup_best": "dedup",
    "incremental_dedup": "dedup",
    "shingle_table": "dedup",
    # similarity / ANN
    "cosine_topk": "similarity",
    "knn_join": "similarity",
    "hard_negative_join": "similarity",
    "ivf_topk": "similarity",
    "build_ivf_index": "similarity",
    "ivf_index_append": "similarity",
    "ivf_index_topk": "similarity",
    "ivf_index_health": "similarity",
    "ivf_index_refit": "similarity",
    "ivf_index_filtered_topk": "similarity",
    "ivf_index_batch_topk": "similarity",
    "ivf_finish_swap": "similarity",
    "opq_balanced_permutation": "similarity",
    "blocked_candidates": "linkage",
    "fuzzy_join": "linkage",
    "best_match": "linkage",
    "nb_fit": "classify",
    "nb_score": "classify",
    "dsir_weights": "classify",
    "gram_matrix": "decomposition",
    "whitening_fit": "decomposition",
    "whiten_vectors": "decomposition",
    "pca_fit": "decomposition",
    "rotate_vectors": "decomposition",
    "jl_sign_matrix": "decomposition",
    "jl_project": "decomposition",
    "cms_build": "sketches",
    "cms_estimate": "sketches",
    "log_histogram": "sketches",
    "histogram_quantiles": "sketches",
    "bloom_build": "sketches",
    "bloom_mask_frame": "sketches",
    "bloom_might_contain": "sketches",
    "build_lsh_index": "similarity",
    "lsh_index_append": "similarity",
    "lsh_index_topk": "similarity",
    "lsh_bucket_topk": "similarity",
    "lsh_multiprobe_topk": "similarity",
    "hamming_topk": "similarity",
    "binary_rerank_topk": "similarity",
    "pq_sampled_codebooks": "similarity",
    "pq_encode": "similarity",
    "pq_adc_topk": "similarity",
    "pq_adc_topk_codes": "similarity",
    "ivfpq_topk": "similarity",
    "sq_topk": "similarity",
    "cosine_range_search": "similarity",
    # clustering / graph
    "kmeans_fit": "clustering",
    "assign_clusters": "clustering",
    "connected_components": "graph",
    "pagerank": "graph",
    "connected_components_two_phase": "graph",
    "dedup_keep_representatives": "graph",
    # text / cleaning / ranking
    "remove_boilerplate_lines": "cleaning",
    "gopher_rules": "cleaning",
    "curation_grain": "cleaning",
    "curation_sections": "cleaning",
    "ngram_contamination": "cleaning",
    "unigram_surprisal": "cleaning",
    "bigram_surprisal": "cleaning",
    "remove_repeated_spans": "cleaning",
    "bm25_topk": "ranking",
    "maxsim_topk": "ranking",
    "rrf_fuse": "ranking",
    "mmr_rerank": "ranking",
    "retrieval_metrics": "ranking",
    "recall_report": "ranking",
    # chunking / pooling
    "chunk_text": "chunking",
    "pack_chunks": "chunking",
    "pool_vectors": "pooling",
    # sampling / slicing
    "limit_offset": "slicing",
    "hash_split": "slicing",
    "per_group_head": "slicing",
    "stratified_sample": "slicing",
    "weighted_sample": "slicing",
    "stratified_weighted_sample": "slicing",
    "equal_frequency_bins": "slicing",
    "source_mixture": "slicing",
    "apply_source_mixture": "slicing",
    # relational / timeseries
    "asof_join": "relational",
    "sessionize": "relational",
    "merge_upsert": "relational",
    "scd2_history": "relational",
    "resample_fill_hourly": "timeseries",
    "zscore_anomalies": "timeseries",
    "seasonal_zscore_anomalies": "timeseries",
    "rolling_correlation": "timeseries",
    # scale / validation / transform
    "salted_join": "scale",
    "key_skew_stats": "scale",
    "write_bucketed": "scale",
    "write_partitioned": "scale",
    "zorder_write": "scale",
    "deterministic_shuffle": "scale",
    "export_shards": "scale",
    "zorder_value": "scale",
    "check_constraints": "validation",
    "dataset_diff": "validation",
    "constraints_from_config": "validation",
    "apply_transform": "transform",
    "image_header_info": "multimodal",
    "jpeg_dimensions": "multimodal",
    "explode_frames": "multimodal",
    "sample_frames": "multimodal",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    return getattr(importlib.import_module(f"{__name__}.{mod}"), name)
