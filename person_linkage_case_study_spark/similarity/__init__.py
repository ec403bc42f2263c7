from .ann import brute_force_topk, embedding_near_dup_pairs, lsh_bucket_topk

__all__ = ["brute_force_topk", "embedding_near_dup_pairs", "lsh_bucket_topk"]
