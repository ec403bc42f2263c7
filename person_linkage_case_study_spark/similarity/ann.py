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

import numpy as np
import pandas as pd
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
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def auto_planes(n: int, target_occupancy: int = 64) -> int:
    """Hyperplane count holding expected bucket occupancy ≈
    ``target_occupancy``: ``ceil(log2(n / target_occupancy))``, clamped
    to [1, 24]. For a fixed plane count, per-bucket occupancy — and with
    it candidate volume — grows linearly with the corpus (quadratically
    for self-join dedup); deriving planes from a cheap count keeps it
    constant per query / linear overall at ANY corpus size."""
    import math

    return max(1, min(24, math.ceil(math.log2(max(n / target_occupancy, 2.0)))))


def seeded_int_planes(dim: int, n_planes: int, seed: int, scale: int = 1000):
    """Integer-valued random hyperplanes in [-scale, scale] from a seeded
    RNG. With vectors quantized to integers (``_quantize_int``), bucket
    bits come from the sign of an INTEGER dot product — bit-exact in any
    engine regardless of summation order, so the LSH assignment is
    engine-reproducible and a SQL oracle can replay it verbatim. (The
    float-dot sign of a near-zero projection is summation-order dependent
    — the same latent-flake class the r2 ADVICE flagged on
    mixture_upsample thresholds.)"""
    rng = np.random.default_rng(seed)
    return rng.integers(-scale, scale + 1, size=(n_planes, dim)).astype(np.int64)


def _quantize_int(V: np.ndarray, scale: float) -> np.ndarray:
    """floor(x*scale + 0.5) — three IEEE ops with no summation, identical
    in numpy and SQL ``floor(x*scale + 0.5)``, so both engines derive the
    same integer grid from the same float vectors."""
    return np.floor(V * scale + 0.5).astype(np.int64)


def _buckets_udf(all_planes, quantize: float | None = None):
    """Sign-bit bucket ids of a vector against every table's hyperplanes,
    as ONE Arrow-vectorized pass (array<long>, one bucket per table).

    Literal-plane expressions (n_tables × n_planes × dim F.lit nodes) made
    Catalyst analysis the bottleneck — same lesson as the IVF centroids;
    a numpy matmul per Arrow batch keeps the plan constant-size."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    # (n_tables, n_planes, dim) -> stacked (n_tables*n_planes, dim)
    P = np.stack(all_planes)
    n_tables, n_planes, dim = P.shape
    flat = P.reshape(n_tables * n_planes, dim)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @pandas_udf(ArrayType(LongType()))
    def buckets(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype="object")
        V = np.stack(vs.to_numpy())
        if quantize is not None:
            V = _quantize_int(V, quantize)  # int64 @ int64 — exact
        signs = (V @ flat.T) > 0  # (n, n_tables*n_planes)
        signs = signs.reshape(len(V), n_tables, n_planes)
        b = (signs * weights[None, None, :]).sum(axis=2)  # (n, n_tables)
        return pd.Series([row.tolist() for row in b])

    return buckets.asNondeterministic()


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int = 4,
    seed: int = 7,
    dim: int | None = None,
    quantize: float | None = None,
) -> DataFrame:
    """Approximate cosine top-k: candidates share an LSH bucket in ≥1 of
    ``n_tables`` hyperplane tables, ranked by exact cosine within the
    candidate set. Recall grows with n_tables; candidate count shrinks
    with n_planes (expected corpus/2^n_planes per bucket).

    ``n_planes=None`` (default) derives the plane count from a cheap
    corpus count so expected bucket occupancy stays ≈ ``max(64, 8k)``
    no matter the corpus size — per-query candidate work is then
    CONSTANT instead of growing linearly with the corpus, the same
    zero-knob contract as ``semdedup_candidates``. Pass an explicit
    value for n-independent determinism (the catalog oracle does).

    ``quantize``: when set (e.g. 10000), hyperplanes are integer-valued
    (``seeded_int_planes``) and vectors are snapped to the integer grid
    ``floor(x*quantize + 0.5)`` before the sign test — bucket assignment
    becomes exact integer arithmetic, reproducible bit-for-bit across
    engines (the catalog oracle replays it in SQL). Final ranking still
    uses the full-precision cosine."""
    if n_planes is None:
        n_planes = auto_planes(corpus.count(), max(64, 8 * k))
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    if quantize is not None:
        planes = [seeded_int_planes(dim, n_planes, seed + t) for t in range(n_tables)]
    else:
        planes = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    buckets = _buckets_udf(planes, quantize=quantize)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("corpus_vec"),
    ).select(
        "neighbor_id",
        "corpus_vec",
        F.posexplode(buckets(F.col("corpus_vec"))).alias("table_idx", "bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("query_vec"),
    ).select(
        "query_id",
        "query_vec",
        F.posexplode(buckets(F.col("query_vec"))).alias("table_idx", "bucket"),
    )
    cand = (
        c.join(F.broadcast(q), on=["table_idx", "bucket"])
        .drop("table_idx", "bucket")
        .dropDuplicates(["query_id", "neighbor_id"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
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


def _pair_cosine_udf():
    """Arrow-vectorized cosine over (vec_l, vec_r) pair columns — one numpy
    batch matmul-diagonal per Arrow batch instead of an interpreted
    zip_with/aggregate tree per pair (~36µs/pair → sub-µs). NULL in → NULL
    out; zero-norm → 0.0, matching ``cosine_similarity``."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def cos(l: pd.Series, r: pd.Series) -> pd.Series:
        if not len(l):
            return pd.Series([], dtype="float64")
        mask = l.notna() & r.notna()
        out = np.full(len(l), np.nan)
        if mask.any():
            L = np.stack(l[mask].to_numpy())
            R = np.stack(r[mask].to_numpy())
            num = np.einsum("ij,ij->i", L, R)
            dn = np.sqrt(np.einsum("ij,ij->i", L, L)) * np.sqrt(
                np.einsum("ij,ij->i", R, R)
            )
            out[mask.to_numpy()] = np.where(dn == 0, 0.0, num / np.where(dn == 0, 1.0, dn))
        s = pd.Series(out)
        if not mask.all():
            # NULL (not NaN) for null inputs — Spark orders NaN above all
            # numbers, so a NaN cosine would pass a >= threshold filter
            s = s.astype(object).where(mask.reset_index(drop=True), None)
        return s

    return cos.asNondeterministic()


def embedding_near_dup_pairs(
    corpus: DataFrame,
    block_col: str | None = None,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 64,
    allow_cross_join: bool = False,
    **bucket_kwargs,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (≥ threshold), blocked on a
    partition column (e.g. a label or an IVF cluster) so pair volume is
    Σ|block|², never |corpus|².

    With no ``block_col``, blocks are auto-derived by IVF coarse
    quantization (``ivf_train_centroids`` + ``ivf_assign``): pairs split
    across cluster boundaries are missed — the standard single-probe
    recall trade; raise ``n_clusters`` for smaller blocks, lower it for
    higher recall. The full cross product is never the silent default —
    ``allow_cross_join=True`` is an explicit opt-in for small corpora.

    Blocked scoring runs through the semdedup bucket kernel
    (``eps_similarity_edges_bucketed`` with the caller's blocks — r15,
    guide §2.3): each vector is shipped ONCE per block membership into a
    grouped BLAS cosine task instead of once per candidate pair through
    a self-join + per-pair UDF (the r14 shape moved 2·dim doubles per
    PAIR across the exchange; the bucket form moves them per ROW and
    inherits the grid-split straggler/mega-block guards). Cosines are
    rounded to 6dp by both kernels with Spark HALF_UP semantics; away
    from exact 6dp knife-edges the emitted edges are identical (the
    accepted summation-order class documented on the bucket kernel).
    The explicit ``allow_cross_join=True`` small-corpus path keeps the
    per-pair Arrow kernel (`_pair_cosine_udf`).

    The bucket kernel inherits its degenerate-input refusals
    (``max_grid_tasks``/``max_bucket``): a mega-block whose chunk-pair
    grid exceeds ``max_grid_tasks`` raises a typed ValueError naming the
    remedies rather than running ~|block|²/2 pair scores. Extra keyword
    arguments (``max_bucket=``, ``max_grid_tasks=``, ``pair_chunk=``)
    are forwarded to ``eps_similarity_edges_bucketed`` so callers can
    raise those ceilings through this API (r15 ADVICE).
    """
    if bucket_kwargs and block_col is None and allow_cross_join:
        raise ValueError(
            "bucket kernel kwargs have no effect on the explicit "
            f"cross-join path: {sorted(bucket_kwargs)}"
        )
    if block_col is None and not allow_cross_join:
        n = corpus.count()
        k = max(2, min(n_clusters, n // 2))
        centroids = ivf_train_centroids(
            corpus, n_centroids=k, iters=4, id_col=id_col, vec_col=vec_col
        )
        corpus = ivf_assign(corpus, centroids, vec_col=vec_col, cluster_col="__ivf_blk")
        # the bucket scorer's pinned exchange cannot be plan-deduplicated
        # across its two branches when the blocks come from a Python node
        # (see minhash_candidate_pairs) — persist so the Arrow matmul
        # runs one corpus pass, not two
        from pyspark import StorageLevel

        corpus = corpus.persist(StorageLevel.MEMORY_AND_DISK)
        block_col = "__ivf_blk"
    if block_col is not None:
        from .semdedup import eps_similarity_edges_bucketed

        edges = eps_similarity_edges_bucketed(
            corpus,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            block_col=block_col,
            **bucket_kwargs,
        )
        # the bucket kernel emits (id_l, id_r) = (larger, smaller); this
        # operator's contract is id_l < id_r — swap on the way out
        return edges.select(
            F.col("id_r").alias(f"{id_col}_l"),
            F.col("id_l").alias(f"{id_col}_r"),
            "cosine",
        )
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    l = c.select(F.col("id").alias("id_l"), F.col("vec").alias("vec_l"))
    r = c.select(F.col("id").alias("id_r"), F.col("vec").alias("vec_r"))
    pairs = l.crossJoin(r)
    cos = _pair_cosine_udf()
    return (
        pairs.filter(F.col("id_l") < F.col("id_r"))
        .withColumn("cosine", F.round(cos(F.col("vec_l"), F.col("vec_r")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("id_l").alias(f"{id_col}_l"),
            F.col("id_r").alias(f"{id_col}_r"),
            "cosine",
        )
    )


# ---------------------------------------------------------------------------
# IVF: k-means coarse quantizer + nprobe cell search — the third ANN
# tier. Training runs driver-side (numpy Lloyd's) on a bounded,
# deterministic sample — the standard IVF recipe: the quantizer needs
# ~O(100) points per centroid, not the corpus, and a distributed
# iteration pays multi-second job/plan overhead per pass (measured: 2.5s+
# per iteration both as literal expression trees, which bottleneck
# Catalyst ANALYSIS, and as broadcast-join passes). Corpus assignment is
# ONE vectorized Arrow pass (numpy matmul per batch). Centroids are k×dim
# floats — plan-literal scale is never an issue again.
# ---------------------------------------------------------------------------


def _train_kmeans_np(X, n_centroids: int, iters: int):
    C = X[:n_centroids].copy()
    for _ in range(iters):
        # argmin over |c|^2 - 2 v.c  ==  argmin squared L2
        d = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        lab = d.argmin(axis=1)
        for i in range(n_centroids):
            members = X[lab == i]
            if len(members):
                C[i] = members.mean(axis=0)
    return C


def ivf_train_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train_rows: int = 100_000,
) -> list[list[float]]:
    """Lloyd's k-means on a deterministic sample of the embedding column,
    returning centroids as plain lists.

    The sample is the first ``max_train_rows`` rows in hash(id) order —
    one distributed TakeOrdered pass; iteration happens driver-side in
    numpy (k ≤ a few hundred × dim doubles). Ties and empty clusters are
    deterministic: argmin takes the lowest cluster id, empty clusters
    keep their previous centroid.
    """
    sample = (
        corpus.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        )
        .orderBy(F.hash("id"), "id")
        .limit(max_train_rows)
        .collect()
    )
    X = np.stack([r["v"] for r in sample])
    if len(X) < n_centroids:
        raise ValueError(f"need >= {n_centroids} vectors, got {len(X)}")
    return [[float(x) for x in c] for c in _train_kmeans_np(X, n_centroids, iters)]


def _centroid_matrix(centroids, quantize: float | None):
    """(C, cn): centroid matrix and its per-row squared norms — quantized
    to the integer grid when ``quantize`` is set, so distance comparisons
    (cn - 2 v·c, the |v|²-free argmin form) are exact int64 arithmetic
    identical to a SQL replay."""
    C = np.asarray(centroids, dtype=np.float64)
    if quantize is not None:
        C = _quantize_int(C, quantize)
    cn = (C * C).sum(axis=1)
    return C, cn


def _assign_udf(centroids, quantize: float | None = None):
    """Vectorized nearest-centroid pandas UDF (ties -> lowest cluster id).

    asNondeterministic stops Catalyst cloning the UDF across pushdown
    boundaries (it is in fact deterministic)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    C, cn = _centroid_matrix(centroids, quantize)

    @pandas_udf(IntegerType())
    def assign(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype="int32")
        V = np.stack(vs.to_numpy())
        if quantize is not None:
            V = _quantize_int(V, quantize)
            d = cn[None, :] - 2 * (V @ C.T)
        else:
            d = cn[None, :] - 2.0 * (V @ C.T)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return assign.asNondeterministic()


def _probe_udf(centroids, nprobe: int, quantize: float | None = None):
    """Vectorized nprobe-nearest-cells pandas UDF -> array<int> per query
    (cells ordered by distance, ties by cluster id — stable argsort)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    C, cn = _centroid_matrix(centroids, quantize)

    @pandas_udf(ArrayType(IntegerType()))
    def probe(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype="object")
        V = np.stack(vs.to_numpy())
        if quantize is not None:
            V = _quantize_int(V, quantize)
            d = cn[None, :] - 2 * (V @ C.T)
        else:
            d = cn[None, :] - 2.0 * (V @ C.T)
        order = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return probe.asNondeterministic()


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cluster_col: str = "ivf_cluster",
    quantize: float | None = None,
) -> DataFrame:
    """Add the nearest-centroid id — usable directly as a ``block_col``
    for ``embedding_near_dup_pairs``."""
    assign = _assign_udf(centroids, quantize=quantize)
    return df.withColumn(
        cluster_col, assign(F.col(vec_col).cast("array<double>"))
    )


def ivf_medoid_centroids(
    corpus: DataFrame,
    centroid_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Medoid quantizer: centroids are the embedding vectors of explicit
    corpus ids (ordered as given). A shade worse than k-means as a coarse
    quantizer, but fully engine-reproducible: an oracle can fetch the
    same rows by id in SQL — no float means, no RNG, no training sample.
    """
    rows = (
        corpus.filter(F.col(id_col).isin(list(centroid_ids)))
        .select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    by_id = {r["id"]: r["v"] for r in rows}
    missing = [i for i in centroid_ids if i not in by_id]
    if missing:
        raise ValueError(f"centroid ids not in corpus: {missing}")
    return [[float(x) for x in by_id[i]] for i in centroid_ids]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    iters: int = 4,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    quantize: float | None = None,
) -> DataFrame:
    """Approximate cosine top-k: each query probes its ``nprobe`` nearest
    IVF cells; candidates in those cells are ranked by exact cosine.

    Recall/cost dial: candidates ≈ corpus × nprobe / n_centroids. The
    cell join shuffles on cluster id — at scale, write the corpus
    partitioned by cluster once and every query batch prunes to nprobe
    partitions (partition pruning on the scan).

    ``quantize``: snap vectors and centroids to the integer grid
    ``floor(x*quantize + 0.5)`` for assignment/probing — cell choice
    becomes exact int64 arithmetic a SQL oracle can replay (pair with
    ``ivf_medoid_centroids`` for engine-reproducible centroids). Final
    ranking still uses full-precision cosine.
    """
    if centroids is None:
        centroids = ivf_train_centroids(
            corpus, n_centroids=n_centroids, iters=iters, id_col=id_col, vec_col=vec_col
        )
    c = ivf_assign(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("corpus_vec"),
        ),
        centroids,
        vec_col="corpus_vec",
        cluster_col="cl",
        quantize=quantize,
    )
    probe = _probe_udf(centroids, nprobe, quantize=quantize)
    probed = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("query_vec"),
    ).withColumn("cl", F.explode(probe(F.col("query_vec"))))
    cand = c.join(F.broadcast(probed), on="cl").filter(
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
