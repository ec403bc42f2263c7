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


def test_grouped_profile_matches_duckdb(spark):
    """by= grouped describe: one row per (group, column), exact stats
    equal DuckDB's per-group aggregates."""
    df = spark.read.parquet(f"{SF}/orders.parquet")
    got = {
        r["o_orderpriority"]: r
        for r in profile_table(
            df, cols=["o_totalprice"], by=["o_orderpriority"]
        ).collect()
    }
    con = duckdb.connect()
    for prio, cnt, mn, mx, mean, std in con.execute(
        f"""SELECT o_orderpriority, count(o_totalprice), min(o_totalprice),
                   max(o_totalprice), avg(o_totalprice),
                   stddev_samp(o_totalprice)
            FROM read_parquet('{SF}/orders.parquet') GROUP BY 1"""
    ).fetchall():
        p = got[prio]
        assert p["column"] == "o_totalprice"
        assert p["count"] == cnt and p["min"] == mn and p["max"] == mx
        assert abs(p["mean"] - mean) < 1e-4 and abs(p["std"] - std) < 1e-4


def test_grouped_profile_single_scan(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet")
    plan = (
        profile_table(df, cols=["o_totalprice"], by=["o_orderpriority"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1


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
    sketch rows — exact stats (count/nulls/min/max/mean) equal the
    one-pass profile of the whole EXACTLY; the HLL NDV estimate agrees
    within sketch error. (Sketch union is state-lossless, but a
    union-result sketch reports via the composite estimator while a
    directly-updated sketch uses HIP, so estimates are NOT bit-identical
    — both sit inside the lg_k=12 rsd ≈ 1.6% band; we pin 2·rsd.)"""
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
    rsd = 1.04 / (2**12) ** 0.5  # ≈ 1.63% at lg_k=12
    for c in cols:
        for field in ("count", "nulls", "min", "max", "mean"):
            assert merged[c][field] == whole[c][field], (c, field)
        m, w = merged[c]["approx_distinct"], whole[c]["approx_distinct"]
        assert abs(m - w) <= 2 * rsd * max(w, 1), (c, m, w)


def test_merged_quantiles_within_rank_error(spark):
    """q_summary grids fold to quantiles within the combined rank error
    (~1/quantile_k grid + GK accuracy), checked against DuckDB's exact
    quantiles in VALUE space via the rank-neighbourhood: the merged q50
    must lie between the exact 0.47 and 0.53 quantiles."""
    import duckdb

    from person_linkage_case_study_spark.operators.profile import (
        merge_increments,
        profile_increment,
    )

    df = spark.read.parquet(f"{SF}/orders.parquet")
    slices = [
        profile_increment(df.filter(f"o_orderkey % 4 = {i}"), ["o_totalprice"])
        for i in range(4)
    ]
    u = slices[0]
    for s in slices[1:]:
        u = u.unionByName(s)
    got = merge_increments(u).collect()[0]
    con = duckdb.connect()
    bands = con.execute(
        f"""SELECT quantile_cont(o_totalprice, [0.22, 0.28, 0.47, 0.53,
                                                0.72, 0.78])
            FROM read_parquet('{SF}/orders.parquet')"""
    ).fetchone()[0]
    assert bands[0] <= got["q25"] <= bands[1]
    assert bands[2] <= got["q50"] <= bands[3]
    assert bands[4] <= got["q75"] <= bands[5]


def test_hierarchical_merge_keep_state(spark):
    """keep_state=True output is itself a valid profile_increment row:
    merging (slices 0+1) and (slices 2+3) then folding the two merged
    rows equals the flat 4-way merge — exactly for exact stats, within
    sketch/rank error for the approximate ones."""
    from person_linkage_case_study_spark.operators.profile import (
        merge_increments,
        profile_increment,
    )

    df = spark.read.parquet(f"{SF}/orders.parquet")
    cols = ["o_custkey", "o_totalprice", "o_orderpriority"]
    slices = [
        profile_increment(df.filter(f"o_orderkey % 4 = {i}"), cols)
        for i in range(4)
    ]
    flat = {
        r["column"]: r
        for r in merge_increments(
            slices[0]
            .unionByName(slices[1])
            .unionByName(slices[2])
            .unionByName(slices[3])
        ).collect()
    }
    first = merge_increments(
        slices[0].unionByName(slices[1]), keep_state=True
    )
    second = merge_increments(
        slices[2].unionByName(slices[3]), keep_state=True
    )
    two_level = {
        r["column"]: r
        for r in merge_increments(first.unionByName(second)).collect()
    }
    rsd = 1.04 / (2**12) ** 0.5
    for c in cols:
        for field in ("count", "nulls", "min", "max", "mean"):
            assert two_level[c][field] == flat[c][field], (c, field)
        m, w = two_level[c]["approx_distinct"], flat[c]["approx_distinct"]
        assert abs(m - w) <= 2 * rsd * max(w, 1), (c, m, w)
    # quantiles: re-compressed grids add ≤1/128 rank error per level
    assert abs(two_level["o_totalprice"]["q50"] - flat["o_totalprice"]["q50"]) <= (
        0.04 * (flat["o_totalprice"]["max"] - flat["o_totalprice"]["min"])
    )


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


def test_merged_quantiles_with_null_bearing_slices(spark):
    """Grid weights must be the non-null count (`count` IS F.count(col),
    nulls already excluded) — the old `count - nulls` double-subtraction
    gave a 50%-null slice weight 0 (grid silently dropped) and a >50%-null
    slice NEGATIVE weight (non-monotone CDF → garbage interp). Two slices
    with identical value distributions but very different null rates must
    merge to the distribution's quantiles regardless."""
    from person_linkage_case_study_spark.operators.profile import (
        merge_increments,
        profile_increment,
    )

    # slice A: values 1..1000, no nulls; slice B: values 1..1000 plus
    # 3000 nulls (75% null — old weighting: -2000, i.e. garbage)
    a = spark.range(1, 1001).selectExpr("CAST(id AS DOUBLE) AS x")
    b = spark.range(1, 4001).selectExpr(
        "CASE WHEN id <= 1000 THEN CAST(id AS DOUBLE) END AS x"
    )
    u = profile_increment(a, ["x"]).unionByName(profile_increment(b, ["x"]))
    got = merge_increments(u).collect()[0]
    assert got["count"] == 2000 and got["nulls"] == 3000
    # both slices carry the SAME distribution; merged quantiles must sit
    # near 250/500/750 (grid rank error ~1/128 → ±~2%)
    assert abs(got["q25"] - 250) <= 25
    assert abs(got["q50"] - 500) <= 25
    assert abs(got["q75"] - 750) <= 25
    # a 50%-null slice must still contribute its grid (old code: weight 0)
    half = spark.range(1, 2001).selectExpr(
        "CASE WHEN id <= 1000 THEN CAST(id AS DOUBLE) + 10000 END AS x"
    )
    got2 = merge_increments(
        profile_increment(a, ["x"]).unionByName(profile_increment(half, ["x"]))
    ).collect()[0]
    # equal non-null mass from [1,1000] and [10001,11000] → median splits
    # the two blocks: far above 1000
    assert got2["q50"] > 900
