from .asof import asof_join
from .bpe import bpe_merges, word_freqs
from .dedup import (
    cluster_pairs,
    dedup_clusters,
    exact_dedup,
    lsh_candidates,
    minhash_signatures,
    near_dup_pipeline,
    shingles,
    simhash,
    simhash_near_dups,
)
from .graph import (
    bfs_depths,
    label_propagation,
    kcore_survivors,
    connected_components,
    connected_components_star,
    connected_components_until,
    degree_stats,
    hits,
    triangle_count,
    undirected_edges,
)
from .inverted_index import (
    inverted_index,
    inverted_index_sharded,
    inverted_index_wiki,
    phrase_search,
    positional_index,
    tf_idf,
)
from .multimodal import (
    binarize_docs,
    decode_images,
    extract_features,
    frame_sample,
    resize_meta,
)
from .pagerank import (
    count_n,
    edges,
    link_graph,
    pagerank,
    pagerank_until,
    personalized_pagerank,
    parse_corpus,
    ranking,
    top_k,
)
from .pca import (
    covariance_matrix,
    project_onto_top_pc,
    top_principal_component,
)
from .packing import chunk_windows, pack_sequences
from .ranking import with_global_position
from .scale import read_bucketed, salted_agg, salted_join, write_bucketed
from .similarity import (
    cosine_topk,
    embedding_near_dups,
    ivf_kmeans_topk,
    ivf_topk,
    kmeans_centroids,
    srp_lsh_near_dups,
    srp_lsh_near_dups_multiprobe,
)
from .sampling import (
    bottom_k_per_group,
    bottom_k_sample,
    curriculum_order,
    hash_split,
    quantile_bins,
    stratified_sample,
    weighted_mix,
)
from .sketches import (
    bloom_join_audit,
    value_histogram,
    bloom_positions,
    bloom_probe,
    cms_counts,
    cms_estimate,
    cms_heavy_hitters,
    cms_join_size_estimate,
    hll_estimate,
    hll_registers,
)
from .text_analysis import (
    fingerprint,
    lang_id,
    ngram_counts,
    quality_score,
    redact_numbers,
    repetition_stats,
    token_count,
)

__all__ = [
    # pagerank pipeline
    "count_n",
    "edges",
    "link_graph",
    "pagerank",
    "pagerank_until",
    "personalized_pagerank",
    "parse_corpus",
    "ranking",
    "top_k",
    "with_global_position",
    # index / text
    "inverted_index",
    "inverted_index_sharded",
    "phrase_search",
    "positional_index",
    "inverted_index_wiki",
    "tf_idf",
    "fingerprint",
    "lang_id",
    "ngram_counts",
    "quality_score",
    "redact_numbers",
    "repetition_stats",
    "token_count",
    # sampling / splits / packing
    "bottom_k_per_group",
    "bottom_k_sample",
    "bpe_merges",
    "chunk_windows",
    "curriculum_order",
    "hash_split",
    "pack_sequences",
    "quantile_bins",
    "stratified_sample",
    "weighted_mix",
    "word_freqs",
    # graph
    "bfs_depths",
    "label_propagation",
    "connected_components",
    "connected_components_star",
    "connected_components_until",
    "degree_stats",
    "hits",
    "kcore_survivors",
    "triangle_count",
    "undirected_edges",
    # dedup
    "cluster_pairs",
    "dedup_clusters",
    "exact_dedup",
    "lsh_candidates",
    "minhash_signatures",
    "near_dup_pipeline",
    "shingles",
    "simhash",
    "simhash_near_dups",
    # similarity
    "cosine_topk",
    "embedding_near_dups",
    "ivf_kmeans_topk",
    "ivf_topk",
    "kmeans_centroids",
    "srp_lsh_near_dups",
    "srp_lsh_near_dups_multiprobe",
    # multimodal
    "binarize_docs",
    "decode_images",
    "extract_features",
    "frame_sample",
    "resize_meta",
    # pca
    "covariance_matrix",
    "project_onto_top_pc",
    "top_principal_component",
    # sketches
    "bloom_join_audit",
    "bloom_positions",
    "bloom_probe",
    "cms_counts",
    "cms_estimate",
    "cms_heavy_hitters",
    "cms_join_size_estimate",
    "hll_estimate",
    "hll_registers",
    "value_histogram",
    # joins / scale
    "asof_join",
    "read_bucketed",
    "salted_agg",
    "salted_join",
    "write_bucketed",
]
