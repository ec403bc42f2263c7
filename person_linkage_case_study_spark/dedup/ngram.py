"""Blocked n-gram / token-set Jaccard near-dup pairs.

The exact-similarity companion to MinHash: for candidate generation use
minhash (sub-quadratic); this operator computes the *true* Jaccard on a
bounded pair set — either candidates from LSH or pairs blocked on a
grouping column. Pure array built-ins (array_intersect/array_union).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import jaccard_tokens
from ..textops.analysis import tokens


def ngram_jaccard_pairs(
    df: DataFrame,
    block_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.2,
) -> DataFrame:
    """All same-block pairs with token-set Jaccard ≥ threshold."""
    t = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        F.array_distinct(tokens(F.col(text_col))).alias("toks"),
    )
    l = t.select(F.col("id").alias("id_l"), "blk", F.col("toks").alias("toks_l"))
    r = t.select(F.col("id").alias("id_r"), "blk", F.col("toks").alias("toks_r"))
    return (
        l.join(r, on="blk")
        .filter(F.col("id_l") < F.col("id_r"))
        .withColumn("jaccard", jaccard_tokens(F.col("toks_l"), F.col("toks_r")))
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("id_l").alias(f"{id_col}_l"),
            F.col("id_r").alias(f"{id_col}_r"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )
