"""Connected components / canonical-survivor resolution (dedup/cluster.py)."""

from pyspark.sql import functions as F

from person_linkage_case_study_spark.dedup.cluster import (
    canonical_documents,
    connected_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id_l long, doc_id_r long")


def test_components_basic(spark):
    # two clusters {1,2,3} (triangle) and {10,11}, plus chain {20..24}
    e = _edges(
        spark,
        [(1, 2), (2, 3), (1, 3), (10, 11), (20, 21), (21, 22), (22, 23), (23, 24)],
    )
    got = {r["id"]: r["component"] for r in connected_components(e).collect()}
    assert {got[1], got[2], got[3]} == {1}
    assert {got[10], got[11]} == {10}
    # a diameter-4 chain still collapses to its minimum
    assert {got[k] for k in (20, 21, 22, 23, 24)} == {20}


def test_components_bridge_merges_clusters(spark):
    e = _edges(spark, [(1, 2), (3, 4), (2, 3)])
    got = {r["id"]: r["component"] for r in connected_components(e).collect()}
    assert set(got.values()) == {1} and len(got) == 4


def test_canonical_documents_shape(spark):
    e = _edges(spark, [(5, 9), (9, 7)])
    out = canonical_documents(e).collect()
    got = {r["doc_id"]: r["canonical_id"] for r in out}
    assert got == {5: 5, 7: 5, 9: 5}
    # exactly one canonical per cluster, and it is a member
    assert set(got.values()) <= set(got.keys())
