from .exact import exact_dedup
from .minhash import minhash_candidate_pairs, minhash_signatures, shingles
from .ngram import ngram_jaccard_pairs
from .simhash import simhash, simhash_candidate_pairs

__all__ = [
    "exact_dedup",
    "minhash_candidate_pairs",
    "minhash_signatures",
    "shingles",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_candidate_pairs",
]
