"""Mergeable heavy-hitters (operators/topk.py): exact agreement with
DuckDB where capacity covers the domain, sound lower/upper bounds under
pruning, and a correct top-k certificate on skewed data."""

import duckdb
import pytest
from pyspark.sql import functions as F

from person_linkage_case_study_spark.operators.topk import (
    merge_topk,
    topk_exact,
    topk_increment,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def exact_counts():
    con = duckdb.connect()
    return dict(
        con.execute(
            f"""SELECT o_orderpriority, count(*)
                FROM read_parquet('{SF}/orders.parquet')
                WHERE o_orderpriority IS NOT NULL GROUP BY 1"""
        ).fetchall()
    )


def _slices(spark, col, capacity):
    df = spark.read.parquet(f"{SF}/orders.parquet")
    parts = [
        topk_increment(
            df.filter(f"o_orderkey % 4 = {i}"), col, capacity, slice_id=f"s{i}"
        )
        for i in range(4)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u


def test_full_capacity_merge_is_exact(spark, exact_counts):
    """capacity ≥ domain ⇒ every slice is exact (threshold 0), merged
    bounds collapse to the true counts, everything guaranteed."""
    got = merge_topk(_slices(spark, "o_orderpriority", capacity=10), k=5).collect()
    assert len(got) == 5
    for r in got:
        assert r["n_lower"] == r["n_upper"] == exact_counts[r["value"]]
        assert r["guaranteed"]
    # and it ranks identically to the exact one-shot operator
    exact = topk_exact(
        spark.read.parquet(f"{SF}/orders.parquet"), "o_orderpriority", 5
    ).collect()
    assert [r["value"] for r in got] == [r["value"] for r in exact]
    assert [r["n_lower"] for r in got] == [r["n"] for r in exact]


def test_pruned_merge_bounds_are_sound(spark, exact_counts):
    """capacity < domain ⇒ items get pruned from some slices; the merged
    interval must still contain the true count for every reported item."""
    got = merge_topk(_slices(spark, "o_orderpriority", capacity=2), k=5).collect()
    assert 0 < len(got) <= 5
    for r in got:
        true_n = exact_counts[r["value"]]
        assert r["n_lower"] <= true_n <= r["n_upper"], (
            r["value"], r["n_lower"], true_n, r["n_upper"],
        )


def test_certificate_on_skewed_data(spark):
    """Zipf-ish synthetic stream: value v appears ~N/(v+1)² times, so the
    head is unambiguous. With modest capacity the top-3 must come back
    GUARANTEED and match the exact top-3."""
    df = spark.range(0, 100_000).select(
        F.floor(F.sqrt(F.col("id") % 10_000)).cast("string").alias("v")
    )
    parts = [
        topk_increment(
            spark.range(0, 100_000)
            .filter(F.col("id") % 3 == i)
            .select(F.floor(F.sqrt(F.col("id") % 10_000)).cast("string").alias("v")),
            "v",
            20,
            slice_id=str(i),
        )
        for i in range(3)
    ]
    u = parts[0].unionByName(parts[1]).unionByName(parts[2])
    got = merge_topk(u, k=3).collect()
    exact = topk_exact(df, "v", 3).collect()
    assert [r["value"] for r in got] == [r["value"] for r in exact]
    assert all(r["guaranteed"] for r in got)
    for g, e in zip(got, exact):
        assert g["n_lower"] <= e["n"] <= g["n_upper"]


def test_thresholds_zero_when_nothing_pruned(spark):
    s = topk_increment(
        spark.read.parquet(f"{SF}/orders.parquet"), "o_orderpriority", 100, "a"
    ).collect()
    assert all(r["slice_threshold"] == 0 for r in s)


def test_increment_plan_has_no_ranking_window(spark):
    """Scale pin: the slice summarizer must take its top-(capacity+1) via
    distributed TakeOrderedAndProject, never a partition-less row_number
    window (which would drag every distinct value through one reducer —
    fatal for exactly the high-cardinality inputs heavy-hitters target)."""
    df = spark.read.parquet(f"{SF}/orders.parquet")
    plan = (
        topk_increment(df, "o_orderpriority", 3, "s0")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan


def test_certificate_sound_with_fewer_candidates_than_k(spark):
    """When the merged candidate set has <= k values, the cutoff must fall
    back to the TOTAL threshold sum (an item pruned from every slice can
    have true count up to that), never 0. Construction: c is pruned from
    BOTH slices with total possible count 7, which EXCEEDS partially-present
    candidates b and d (n_lower 4) — so only `a` may be guaranteed."""
    s1 = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 4 + [("c",)] * 4, "v string"
    )
    s2 = spark.createDataFrame(
        [("a",)] * 5 + [("d",)] * 4 + [("c",)] * 3, "v string"
    )
    u = topk_increment(s1, "v", 2, "s1").unionByName(
        topk_increment(s2, "v", 2, "s2")
    )
    got = {r["value"]: r for r in merge_topk(u, k=3).collect()}
    assert set(got) == {"a", "b", "d"}
    # slice thresholds: s1 pruned c@4, s2 pruned c@3 → total 7
    assert got["a"]["n_lower"] == 10 and got["a"]["guaranteed"]
    for v in ("b", "d"):
        assert got[v]["n_lower"] == 4
        # c's true count is 7 > 4: these must NOT be certified
        assert not got[v]["guaranteed"], v
    # bounds stay sound: true counts a=10, b=4, d=4 inside [lower, upper]
    for v, true_n in (("a", 10), ("b", 4), ("d", 4)):
        assert got[v]["n_lower"] <= true_n <= got[v]["n_upper"]
