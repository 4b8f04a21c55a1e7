from .graph import project_nodes, project_edges, route_sources, route_paths
from .edge_resolution import resolve_edges, dangling_edges
from .graph_algo import (
    node_degrees,
    connected_components,
    pagerank_fixedpoint,
    triangle_count,
    eigenvector_centrality,
    landmark_betweenness,
    fastrp_embeddings,
)
from .asof import asof_join, range_join
from .skew import salted_aggregate
from .dedup import (
    exact_duplicate_groups,
    deduplicate_exact,
    minhash_lsh_pairs,
    simhash_pairs,
)
from .similarity import (
    brute_force_topk,
    knn_join,
    lsh_topk,
    ivf_topk,
    embedding_near_dup_pairs_blocked,
)
from .text import bpe_top_merges, chunk_documents, profile_documents
from .quality import gopher_quality, top_ngram_coverage, with_gopher_keep
from .pii import redact_pii, scan_pii
from .sampling import (
    cap_per_group,
    cap_per_group_two_phase,
    deterministic_sample,
    importance_weights,
)
from .profile import cms_estimate, cms_sketch
from .profile import kmv_estimate, kmv_sketch
from .itemsets import frequent_pair_rules
from .similarity import mmr_topk
from .graph_algo import degree_assortativity
from .similarity import embedding_near_dup_pairs_blocked_np
from .dedup import (
    near_dup_groups,
    remove_repeated_passages,
    repeated_passage_profile,
)
from .similarity import (
    build_ivf_index,
    build_lsh_index,
    corpus_ann_stats,
    ivf_index_topk,
    lsh_index_topk,
    tune_ivf,
    tune_lsh,
)
from .pii import seed_synthetic_pii
from .dedup import (
    incremental_near_dup_filter,
    remove_boilerplate_lines,
    seed_boilerplate_lines,
)
from .packing import global_prefix_sum, pack_sequences
from .sampling import mixture_weights, sample_to_token_budget
from .similarity import sq8_quantize, sq8_stats, sq8_topk, two_stage_topk
from .dedup import decontaminate, set_similarity_join_pairs
from .quality import bigram_logprob_profile, linear_quality_score
from .retrieval import bm25_join, bm25_topk, corpus_df_stats
from .similarity import assign_clusters_literal, cluster_balanced_sample
from .graph_algo import (
    articlerank_fixedpoint,
    community_conductance,
    community_modularity,
    dag_longest_path,
    k1_coloring,
    louvain_local_move,
    pagerank_weighted,
    rwr_sample,
    topological_order,
)
from .profile import bloom_probe, bloom_sketch
from .similarity import pq_codebooks, pq_encode, pq_topk

__all__ = [
    "kmv_estimate",
    "kmv_sketch",
    "frequent_pair_rules",
    "mmr_topk",
    "degree_assortativity",
    "project_nodes",
    "project_edges",
    "route_sources",
    "route_paths",
    "resolve_edges",
    "dangling_edges",
    "node_degrees",
    "eigenvector_centrality",
    "landmark_betweenness",
    "fastrp_embeddings",
    "connected_components",
    "pagerank_fixedpoint",
    "pagerank_weighted",
    "articlerank_fixedpoint",
    "dag_longest_path",
    "topological_order",
    "k1_coloring",
    "louvain_local_move",
    "community_modularity",
    "community_conductance",
    "rwr_sample",
    "bloom_sketch",
    "bloom_probe",
    "pq_codebooks",
    "pq_encode",
    "pq_topk",
    "asof_join",
    "range_join",
    "salted_aggregate",
    "exact_duplicate_groups",
    "deduplicate_exact",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "brute_force_topk",
    "knn_join",
    "lsh_topk",
    "ivf_topk",
    "embedding_near_dup_pairs_blocked",
    "profile_documents",
    "bpe_top_merges",
    "chunk_documents",
    "gopher_quality",
    "top_ngram_coverage",
    "with_gopher_keep",
    "redact_pii",
    "scan_pii",
    "cap_per_group",
    "cap_per_group_two_phase",
    "importance_weights",
    "cms_sketch",
    "cms_estimate",
    "deterministic_sample",
    "embedding_near_dup_pairs_blocked_np",
    "near_dup_groups",
    "repeated_passage_profile",
    "remove_repeated_passages",
    "build_ivf_index",
    "ivf_index_topk",
    "build_lsh_index",
    "lsh_index_topk",
    "corpus_ann_stats",
    "tune_lsh",
    "tune_ivf",
    "seed_synthetic_pii",
    "remove_boilerplate_lines",
    "seed_boilerplate_lines",
    "incremental_near_dup_filter",
    "global_prefix_sum",
    "pack_sequences",
    "sample_to_token_budget",
    "mixture_weights",
    "sq8_stats",
    "sq8_quantize",
    "sq8_topk",
    "two_stage_topk",
    "decontaminate",
    "set_similarity_join_pairs",
    "bigram_logprob_profile",
    "bm25_topk",
    "bm25_join",
    "linear_quality_score",
    "assign_clusters_literal",
    "cluster_balanced_sample",
    "corpus_df_stats",
    "triangle_count",
]
from .scc import scc_condensation, strongly_connected_components
from .skyline import pareto_frontier, pareto_frontier_nd
from .colloc import bigram_collocations
from .mst import minimum_spanning_forest
from .profile import (
    exact_quantiles,
    exact_quantiles_grouped,
    exact_weighted_quantiles,
    exact_weighted_quantiles_grouped,
    kmv_set_ops,
)
from .biconnect import (
    articulation_points,
    biconnected_components,
    biconnectivity_state,
    bridges,
)
