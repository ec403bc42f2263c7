"""ANN: brute-force exactness and LSH recall."""

import math
import random

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def vectors(spark):
    rng = random.Random(17)
    rows = []
    for i in range(100):
        v = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((i, v))
    # planted: 100+i is a tiny perturbation of i for i<5 (near dup)
    for i in range(5):
        base = rows[i][1]
        rows.append((100 + i, [x + rng.gauss(0, 0.01) for x in base]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )


def test_brute_force_finds_planted_neighbors(vectors):
    from person_linkage_case_study_spark.similarity.ann import brute_force_topk

    q = vectors.filter(F.col("vec_id") < 5)
    top = brute_force_topk(vectors, q, k=1).collect()
    got = {r["query_id"]: (r["neighbor_id"], r["cosine"]) for r in top}
    for i in range(5):
        assert got[i][0] == 100 + i
        assert got[i][1] > 0.99


def test_lsh_recall_on_planted(vectors):
    from person_linkage_case_study_spark.similarity.ann import lsh_bucket_topk

    q = vectors.filter(F.col("vec_id") < 5)
    top = lsh_bucket_topk(
        vectors, q, k=1, n_planes=6, n_tables=6, dim=16
    ).collect()
    got = {r["query_id"]: r["neighbor_id"] for r in top}
    # near-identical vectors land in the same bucket in ≥1 of 6 tables with
    # overwhelming probability (they differ by ~0.01 in angle)
    hits = sum(1 for i in range(5) if got.get(i) == 100 + i)
    assert hits >= 4


def test_embedding_near_dup_pairs(vectors):
    from person_linkage_case_study_spark.similarity.ann import (
        embedding_near_dup_pairs,
    )

    # exact tier: explicit cross-join opt-in finds every planted pair
    pairs = embedding_near_dup_pairs(
        vectors, block_col=None, threshold=0.99, allow_cross_join=True
    ).collect()
    found = {(r["vec_id_l"], r["vec_id_r"]) for r in pairs}
    for i in range(5):
        assert (i, 100 + i) in found
    # scale tier: blockless default auto-derives IVF blocks — a subset of
    # the exact pairs with high recall (coarse clusters co-locate near-dups)
    auto = embedding_near_dup_pairs(
        vectors, block_col=None, threshold=0.99, n_clusters=8
    ).collect()
    found_auto = {(r["vec_id_l"], r["vec_id_r"]) for r in auto}
    assert found_auto <= found
    assert sum((i, 100 + i) in found_auto for i in range(5)) >= 4


def test_near_dup_pairs_forwards_bucket_kwargs(vectors, spark):
    from person_linkage_case_study_spark.similarity.ann import (
        embedding_near_dup_pairs,
    )

    # a one-block 105-row corpus with max_bucket=8 → 13 chunks → 91
    # chunk-pair tasks; max_grid_tasks=10 must now be reachable THROUGH
    # this API and trip the bucket kernel's typed refusal (r15 ADVICE)
    blocked = vectors.withColumn("blk", F.lit(1))
    with pytest.raises(Exception, match="grid-split refused"):
        embedding_near_dup_pairs(
            blocked, block_col="blk", threshold=0.99,
            max_bucket=8, max_grid_tasks=10,
        ).collect()
    # forwarded ceilings that DON'T trip produce the same pair set
    base = {
        (r["vec_id_l"], r["vec_id_r"])
        for r in embedding_near_dup_pairs(
            blocked, block_col="blk", threshold=0.99
        ).collect()
    }
    widened = {
        (r["vec_id_l"], r["vec_id_r"])
        for r in embedding_near_dup_pairs(
            blocked, block_col="blk", threshold=0.99,
            max_bucket=8, max_grid_tasks=1000,
        ).collect()
    }
    assert widened == base
    for i in range(5):
        assert (i, 100 + i) in base
    # kwargs on the cross-join path are a caller bug — typed error
    with pytest.raises(ValueError, match="no effect"):
        embedding_near_dup_pairs(
            vectors, threshold=0.99, allow_cross_join=True, max_bucket=8
        )


def test_ivf_centroids_deterministic_and_assign_total(vectors):
    from person_linkage_case_study_spark.similarity.ann import (
        ivf_assign,
        ivf_train_centroids,
    )

    c1 = ivf_train_centroids(vectors, n_centroids=8, iters=3)
    c2 = ivf_train_centroids(vectors, n_centroids=8, iters=3)
    assert c1 == c2
    assert len(c1) == 8 and len(c1[0]) == 16
    assigned = ivf_assign(vectors, c1)
    clusters = [r["ivf_cluster"] for r in assigned.collect()]
    assert len(clusters) == 105
    assert all(0 <= cl < 8 for cl in clusters)


def test_ivf_recall_on_planted(vectors):
    from person_linkage_case_study_spark.similarity.ann import ivf_topk

    q = vectors.filter(F.col("vec_id") < 5)
    top = ivf_topk(vectors, q, k=1, n_centroids=8, iters=3, nprobe=2).collect()
    got = {r["query_id"]: r["neighbor_id"] for r in top}
    # a near-identical vector shares its base's nearest IVF cell; nprobe=2
    # covers boundary cases
    hits = sum(1 for i in range(5) if got.get(i) == 100 + i)
    assert hits >= 4


def test_lsh_quantized_recall_and_determinism(vectors):
    """quantize= mode (integer planes + integer-grid vectors): planted
    neighbors still found, and two runs are bit-identical (the catalog
    oracle replays this arithmetic in SQL, so engine-reproducibility is
    the whole point)."""
    from person_linkage_case_study_spark.similarity.ann import lsh_bucket_topk

    q = vectors.filter(F.col("vec_id") < 5)
    runs = [
        sorted(
            (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
            for r in lsh_bucket_topk(
                vectors, q, k=1, dim=16, n_planes=6, n_tables=6, quantize=10000.0
            ).collect()
        )
        for _ in range(2)
    ]
    assert runs[0] == runs[1]
    got = {qid: nid for qid, nid, _, _ in runs[0]}
    hits = sum(1 for i in range(5) if got.get(i) == 100 + i)
    assert hits >= 4  # planted near-dups land in the same integer-grid bucket


def test_ivf_medoid_quantized_recall(vectors):
    """Medoid centroids + integer-grid assignment: the engine-reproducible
    IVF tier still finds planted neighbors."""
    from person_linkage_case_study_spark.similarity.ann import (
        ivf_medoid_centroids,
        ivf_topk,
    )

    cents = ivf_medoid_centroids(vectors, list(range(10, 26)))
    q = vectors.filter(F.col("vec_id") < 5)
    top = ivf_topk(
        vectors, q, k=1, centroids=cents, quantize=10000.0, nprobe=6
    ).collect()
    got = {r["query_id"]: r["neighbor_id"] for r in top}
    hits = sum(1 for i in range(5) if got.get(i) == 100 + i)
    assert hits >= 4


def test_catalog_ann_soundness_and_recall_floor(spark):
    """The merged catalog entry: every returned cosine is exact (checked
    by the driver's value-hash oracle; here we pin the in-data soundness
    flag) and recall@5 vs brute force stays above a floor per tier. On
    these isotropic synthetic embeddings recall ≈ the scanned corpus
    fraction (no cluster structure to exploit) — the planted-vector tests
    above demonstrate real recall; floors here catch config regressions."""
    from person_linkage_case_study_spark.queries import queries

    rows = queries()["ann_lsh_ivf_topk"](spark, "/root/testdata/sf0.01").collect()
    n_queries = 8
    for tier, floor in (("lsh", 0.05), ("ivf", 0.25)):
        tr = [r for r in rows if r["tier"] == tier]
        assert tr, tier
        recall = sum(r["in_exact_topk"] for r in tr) / (n_queries * 5)
        assert recall >= floor, (tier, recall)


def test_lsh_auto_planes_default(vectors):
    """Zero-knob lsh_bucket_topk: n_planes derived from the corpus count
    (occupancy target max(64, 8k)) — near-identical planted neighbors are
    still found, and the helper is the shared ann.auto_planes."""
    from person_linkage_case_study_spark.similarity.ann import (
        auto_planes,
        lsh_bucket_topk,
    )

    q = vectors.filter(F.col("vec_id") < 5)
    top = lsh_bucket_topk(vectors, q, k=1, n_tables=6, dim=16).collect()
    got = {r["query_id"]: r["neighbor_id"] for r in top}
    hits = sum(1 for i in range(5) if got.get(i) == 100 + i)
    assert hits >= 4
    # the semdedup re-export is the same function (one occupancy rule)
    from person_linkage_case_study_spark.similarity.semdedup import (
        auto_planes as semdedup_auto_planes,
    )

    assert semdedup_auto_planes is auto_planes
