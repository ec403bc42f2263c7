"""Approximate-nearest-neighbor search over an embedding column.

Two tiers, as a 100 TB pipeline needs:

- ``brute_force_topk``: exact cosine top-k — broadcast the (small) query
  set against the corpus, one window per query. The baseline and the
  correctness oracle for the approximate path.
- ``lsh_bucket_topk``: random-hyperplane LSH — deterministic seeded
  planes, sign-bit bucket per vector, candidates restricted to matching
  buckets (multi-probe over b tables). Sub-linear candidate sets at the
  cost of recall; planes are generated driver-side (numpy, seeded) and
  enter the plan as literals, so execution is pure JVM.

Vector math uses ``zip_with``/``aggregate`` built-ins (no UDF); for very
wide vectors a pandas_udf with numpy would win — the corpus here is
64-dim, where codegen wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.similarity import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query vector.

    ``queries`` is broadcast (use a small query batch per job at scale);
    ties broken deterministically by corpus id. Scores are rounded before
    ranking so the ordering is reproducible across engines.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("corpus_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                cosine_similarity(
                    F.col("query_vec").cast("array<double>"),
                    F.col("corpus_vec").cast("array<double>"),
                ),
                round_digits,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int):
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _bucket_expr(vec_col, planes) -> "F.Column":
    """Sign-bit bucket id of a vector against literal hyperplanes."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, lit_plane, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0))
    return bucket


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: candidates share an LSH bucket in ≥1 of
    ``n_tables`` hyperplane tables, ranked by exact cosine within the
    candidate set. Recall grows with n_tables; candidate count shrinks
    with n_planes (expected corpus/2^n_planes per bucket)."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("corpus_vec"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("query_vec"),
    )
    cand = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        cb = c.withColumn("bucket", _bucket_expr(F.col("corpus_vec"), planes)).select(
            "neighbor_id", "corpus_vec", "bucket"
        )
        qb = q.withColumn("bucket", _bucket_expr(F.col("query_vec"), planes)).select(
            "query_id", "query_vec", "bucket"
        )
        pairs = cb.join(F.broadcast(qb), on="bucket").drop("bucket")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.dropDuplicates(["query_id", "neighbor_id"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.withColumn(
        "cosine",
        F.round(cosine_similarity(F.col("query_vec"), F.col("corpus_vec")), 5),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    block_col: str | None = None,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (≥ threshold), optionally
    blocked on a partition column (e.g. an IVF/cluster label) to avoid the
    full cross product."""
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    l = c.select(
        F.col("id").alias("id_l"), F.col("vec").alias("vec_l"), *( ["blk"] if block_col else [] )
    )
    r = c.select(
        F.col("id").alias("id_r"), F.col("vec").alias("vec_r"), *( ["blk"] if block_col else [] )
    )
    pairs = l.join(r, on="blk") if block_col else l.crossJoin(r)
    return (
        pairs.filter(F.col("id_l") < F.col("id_r"))
        .withColumn(
            "cosine", F.round(cosine_similarity(F.col("vec_l"), F.col("vec_r")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("id_l").alias(f"{id_col}_l"),
            F.col("id_r").alias(f"{id_col}_r"),
            "cosine",
        )
    )
