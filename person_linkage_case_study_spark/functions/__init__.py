from .phonetics import nysiis_udf, reverse_soundex, soundex
from .similarity import (
    cosine_similarity,
    jaccard_tokens,
    jaro_winkler_udf,
)
from .standardize import (
    add_first_last_initial_categories,
    add_geokey,
    add_truncated_name_cols,
    add_zip3,
    initial_cut,
    normalize_missing,
    split_dob,
    standardize_address_part,
)

__all__ = [
    "nysiis_udf",
    "reverse_soundex",
    "soundex",
    "cosine_similarity",
    "jaccard_tokens",
    "jaro_winkler_udf",
    "add_first_last_initial_categories",
    "add_geokey",
    "add_truncated_name_cols",
    "add_zip3",
    "initial_cut",
    "normalize_missing",
    "split_dob",
    "standardize_address_part",
]
