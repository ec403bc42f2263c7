"""Single-pass profiler (operators/profile.py): exact stats equal DuckDB,
approximate stats within their published error bounds, one-job plan."""

import duckdb
import pytest

from person_linkage_case_study_spark.operators.profile import profile_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def prof(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet")
    return {r["column"]: r for r in profile_table(df).collect()}


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    return con.execute(
        f"""
        SELECT count(o_totalprice) AS cnt,
               count(*) - count(o_totalprice) AS nulls,
               count(DISTINCT o_custkey) AS ndv_cust,
               count(DISTINCT o_orderpriority) AS ndv_prio,
               min(o_totalprice) AS mn, max(o_totalprice) AS mx,
               avg(o_totalprice) AS mean,
               median(o_totalprice) AS med
        FROM read_parquet('{SF}/orders.parquet')
        """
    ).fetchone()


def test_exact_stats_match_duckdb(prof, oracle):
    cnt, nulls, _, _, mn, mx, mean, _ = oracle
    p = prof["o_totalprice"]
    assert p["count"] == cnt and p["nulls"] == nulls
    assert p["min"] == mn and p["max"] == mx
    assert abs(p["mean"] - mean) < 1e-4


def test_approx_ndv_within_hll_bound(prof, oracle):
    # HLL++ default rsd ~2.3%; assert a loose 5x band (one-sided misses
    # at this cardinality would indicate a wiring bug, not sketch noise)
    _, _, ndv_cust, ndv_prio, *_ = oracle
    assert abs(prof["o_custkey"]["approx_distinct"] - ndv_cust) <= 0.12 * ndv_cust
    # tiny cardinalities are exact in HLL++
    assert prof["o_orderpriority"]["approx_distinct"] == ndv_prio


def test_median_within_gk_bound(prof, oracle):
    *_, med = oracle
    p = prof["o_totalprice"]
    lo, hi = p["min"], p["max"]
    # rel_err=0.01 on rank, translated loosely to value space via range
    assert abs(p["q50"] - med) <= 0.05 * (hi - lo)
    assert p["q25"] <= p["q50"] <= p["q75"]


def test_non_numeric_columns_profiled_without_minmax(prof):
    p = prof["o_orderpriority"]
    assert p["min"] is None and p["mean"] is None
    assert p["count"] > 0 and p["approx_distinct"] > 0


def test_single_aggregate_plan(spark):
    """Scale pin: the whole profile is ONE scan + ONE partial/final
    aggregate pair — no per-column jobs, no extra exchange."""
    df = spark.read.parquet(f"{SF}/orders.parquet")
    plan = (
        profile_table(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1
    # one global-aggregate collapse: a single single-partition exchange
    assert plan.count("Exchange") == 1


# ---------------------------------------------------------------------------
# incremental (sketch-merge) profiler
# ---------------------------------------------------------------------------


def test_merged_slices_equal_single_pass(spark):
    """The incremental contract: profile 4 slices separately, merge the
    sketch rows — every stat (including the HLL NDV estimate, because
    sketch union is lossless) equals the one-pass profile of the whole."""
    from person_linkage_case_study_spark.operators.profile import (
        merge_increments,
        profile_increment,
    )

    df = spark.read.parquet(f"{SF}/orders.parquet")
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"]
    whole = {
        r["column"]: r
        for r in merge_increments(profile_increment(df, cols)).collect()
    }
    slices = [
        profile_increment(df.filter(f"o_orderkey % 4 = {i}"), cols)
        for i in range(4)
    ]
    u = slices[0]
    for s in slices[1:]:
        u = u.unionByName(s)
    merged = {r["column"]: r for r in merge_increments(u).collect()}
    assert set(merged) == set(whole)
    for c in cols:
        for field in ("count", "nulls", "approx_distinct", "min", "max", "mean"):
            assert merged[c][field] == whole[c][field], (c, field)


def test_incremental_ndv_within_sketch_bound(spark):
    from person_linkage_case_study_spark.operators.profile import (
        merge_increments,
        profile_increment,
    )

    df = spark.read.parquet(f"{SF}/orders.parquet")
    got = {
        r["column"]: r
        for r in merge_increments(
            profile_increment(df, ["o_custkey", "o_orderpriority"])
        ).collect()
    }
    con = duckdb.connect()
    ndv_cust, ndv_prio = con.execute(
        f"""SELECT count(DISTINCT o_custkey), count(DISTINCT o_orderpriority)
            FROM read_parquet('{SF}/orders.parquet')"""
    ).fetchone()
    # lg_k=12 → rsd ≈ 1.6%; 5x band, same stance as the one-pass test
    assert abs(got["o_custkey"]["approx_distinct"] - ndv_cust) <= 0.08 * ndv_cust
    assert got["o_orderpriority"]["approx_distinct"] == ndv_prio


def test_increment_is_single_scan(spark):
    from person_linkage_case_study_spark.operators.profile import profile_increment

    df = spark.read.parquet(f"{SF}/orders.parquet")
    plan = (
        profile_increment(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 1
