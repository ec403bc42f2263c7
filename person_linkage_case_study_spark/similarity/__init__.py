from .ann import brute_force_topk, embedding_near_dup_pairs, lsh_bucket_topk
from .semdedup import eps_similarity_edges, semantic_dedup

__all__ = [
    "brute_force_topk",
    "embedding_near_dup_pairs",
    "eps_similarity_edges",
    "lsh_bucket_topk",
    "semantic_dedup",
]
