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
    num_partitions: int | None = None,
) -> DataFrame:
    """All same-block pairs with token-set Jaccard ≥ threshold.

    The self-join explodes (|block|² pairs from |block| rows), so the join
    parallelism is pinned — AQE would coalesce the tiny input shuffle and
    funnel millions of array_intersect calls through a few tasks.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    t = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        F.array_distinct(tokens(F.col(text_col))).alias("toks"),
    )
    l = t.select(F.col("id").alias("id_l"), "blk", F.col("toks").alias("toks_l"))
    r = t.select(F.col("id").alias("id_r"), "blk", F.col("toks").alias("toks_r"))
    # salt the explosion: replicate the right side over k salt buckets and
    # split the left by id hash, so one language-block's pairs spread over
    # k × (block partitions) tasks instead of one
    k = max(1, num_partitions // max(t.select("blk").distinct().count(), 1))
    if k > 1:
        l = l.withColumn("__salt", F.pmod(F.hash("id_l"), F.lit(k)))
        r = r.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        join_keys = ["blk", "__salt"]
    else:
        join_keys = ["blk"]
    l = l.repartition(num_partitions, *join_keys)
    return (
        l.join(r, on=join_keys)
        .drop("__salt")
        .filter(F.col("id_l") < F.col("id_r"))
        .withColumn("jaccard", jaccard_tokens(F.col("toks_l"), F.col("toks_r")))
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("id_l").alias(f"{id_col}_l"),
            F.col("id_r").alias(f"{id_col}_r"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )
