"""Binned range join (operators/range_join.py): semantics vs a DuckDB
inequality-join oracle, closed-endpoint variants, null/inverted bounds,
outer/semi/anti variants, a randomized fuzz, and the plan pin that
justifies the operator's existence (equi-join on bins, never a
nested-loop/cartesian plan).
"""

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from person_linkage_case_study_spark.operators.range_join import (
    interval_join,
    range_join,
)


@pytest.fixture(scope="module")
def frames(spark):
    # points: per-key events; intervals: validity windows (price epochs)
    points = spark.createDataFrame(
        [
            ("A", 5.0, 1),
            ("A", 10.0, 2),   # exactly at an interval start: closed-dependent
            ("A", 19.9, 3),
            ("A", 20.0, 4),   # exactly at an interval end: closed-dependent
            ("B", 7.0, 5),
            ("B", None, 6),   # null point: never matches
            ("C", 3.0, 7),    # key with no intervals
        ],
        "k string, ts double, pid long",
    )
    intervals = spark.createDataFrame(
        [
            ("A", 0.0, 10.0, 100),
            ("A", 10.0, 20.0, 101),
            ("A", 15.0, 40.0, 102),   # overlapping intervals both match
            ("B", 5.0, 9.0, 200),
            ("B", 9.0, 8.0, 201),     # inverted: never matches
            ("B", None, 99.0, 202),   # null bound: never matches
        ],
        "k string, lo double, hi double, iid long",
    )
    return points, intervals


def _oracle_pairs(points_pd, intervals_pd, closed="left"):
    lo_op = ">=" if closed in ("left", "both") else ">"
    hi_op = "<=" if closed in ("right", "both") else "<"
    con = duckdb.connect()
    con.register("p", points_pd)
    con.register("i", intervals_pd)
    return con.execute(
        f"""
        SELECT p.pid, i.iid
        FROM p JOIN i ON p.k = i.k
          AND p.ts {lo_op} i.lo AND p.ts {hi_op} i.hi
          AND i.lo <= i.hi
        ORDER BY p.pid, i.iid
        """
    ).fetchall()


@pytest.mark.parametrize("closed", ["left", "right", "both", "neither"])
def test_point_in_interval_matches_duckdb(spark, frames, closed):
    points, intervals = frames
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(
            points, intervals, on=["k"], point="ts", start="lo", end="hi",
            bin_width=4.0, closed=closed,
        ).collect()
    )
    assert got == _oracle_pairs(points.toPandas(), intervals.toPandas(), closed)


def test_left_join_keeps_unmatched_with_nulls(spark, frames):
    points, intervals = frames
    out = range_join(
        points, intervals, on=["k"], point="ts", start="lo", end="hi",
        bin_width=4.0, how="left",
    )
    rows = {r.pid: r for r in out.filter(F.col("iid").isNull()).collect()}
    # null point (6), no-interval key (7), and B@7.0 matched → NOT here;
    # A@20.0 is outside every half-open interval's [lo, hi)? no — inside
    # (15,40): matched. Unmatched-with-nulls = {6, 7}
    assert set(rows) == {6, 7}
    matched = out.filter(F.col("iid").isNotNull()).count()
    assert out.count() == matched + 2


def test_semi_and_anti(spark, frames):
    points, intervals = frames
    kw = dict(on=["k"], point="ts", start="lo", end="hi", bin_width=4.0)
    semi = {r.pid for r in range_join(points, intervals, how="left_semi", **kw).collect()}
    anti = {r.pid for r in range_join(points, intervals, how="left_anti", **kw).collect()}
    matched = {p for p, _ in _oracle_pairs(points.toPandas(), intervals.toPandas())}
    all_pids = {r.pid for r in points.collect()}
    assert semi == matched
    assert anti == all_pids - matched
    # semi/anti emit only left columns
    assert set(range_join(points, intervals, how="left_semi", **kw).columns) == {
        "k", "ts", "pid"
    }


def test_fuzz_against_duckdb(spark):
    rng = random.Random(20260814)
    pts = [
        (rng.choice("abcde"), round(rng.uniform(0, 100), 3), i)
        for i in range(300)
    ]
    ivs = []
    for j in range(120):
        lo = round(rng.uniform(0, 100), 3)
        ivs.append(
            (rng.choice("abcde"), lo, round(lo + rng.uniform(0, 25), 3), j)
        )
    points = spark.createDataFrame(pts, "k string, ts double, pid long")
    intervals = spark.createDataFrame(ivs, "k string, lo double, hi double, iid long")
    for width in (0.5, 7.0, 200.0):  # narrow, typical, one-giant-bin
        got = sorted(
            (r.pid, r.iid)
            for r in range_join(
                points, intervals, on=["k"], point="ts", start="lo", end="hi",
                bin_width=width,
            ).collect()
        )
        assert got == _oracle_pairs(points.toPandas(), intervals.toPandas())


def test_timestamp_points_and_bounds(spark):
    points = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["x", "x"],
                "ts": pd.to_datetime(["2030-04-01 00:30:00", "2030-04-01 02:00:00"]),
                "pid": [1, 2],
            }
        )
    )
    intervals = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["x"],
                "lo": pd.to_datetime(["2030-04-01 00:00:00"]),
                "hi": pd.to_datetime(["2030-04-01 01:00:00"]),
                "iid": [10],
            }
        )
    )
    out = range_join(
        points, intervals, on=["k"], point="ts", start="lo", end="hi",
        bin_width=600,  # seconds for temporal columns
    )
    assert [r.pid for r in out.collect()] == [1]


def test_interval_overlap_matches_duckdb(spark):
    rng = random.Random(7)
    mk = lambda n, tag: [  # noqa: E731
        (
            rng.choice("ab"),
            round(rng.uniform(0, 50), 2),
            0.0,
            i,
        )
        for i in range(n)
    ]
    lrows = [(k, lo, round(lo + rng.uniform(0.1, 12), 2), i) for k, lo, _, i in mk(80, "l")]
    rrows = [(k, lo, round(lo + rng.uniform(0.1, 12), 2), j) for k, lo, _, j in mk(60, "r")]
    left = spark.createDataFrame(lrows, "k string, ls double, le double, lid long")
    right = spark.createDataFrame(rrows, "k string, rs double, re double, rid long")
    got = sorted(
        (r.lid, r.rid)
        for r in interval_join(
            left, right, on=["k"], left_start="ls", left_end="le",
            right_start="rs", right_end="re", bin_width=5.0,
        ).collect()
    )
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    want = con.execute(
        """
        SELECT l.lid, r.rid FROM l JOIN r ON l.k = r.k
          AND l.ls < r.re AND r.rs < l.le
        ORDER BY l.lid, r.rid
        """
    ).fetchall()
    assert got == want
    # exactly-once: no duplicate pairs from multi-bin overlap
    assert len(got) == len(set(got))


def test_plan_is_equi_join_not_nested_loop(spark, frames):
    """The operator's reason to exist: the binned formulation must plan as
    a hash/sort-merge equi-join on (keys, bin); the naive inequality join
    plans as BroadcastNestedLoopJoin. At 100 TB the former shuffles
    |left|+|right| rows once; the latter is |left|x|right| per key."""
    points, intervals = frames
    plan = (
        range_join(
            points, intervals, on=["k"], point="ts", start="lo", end="hi",
            bin_width=4.0,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    # keyless (global intervals): naive spelling has NO equi-condition at
    # all and degenerates to a nested loop; the binned one still equi-joins
    naive_plan = (
        points.join(
            intervals.drop("k"),
            (points.ts >= F.col("lo")) & (points.ts < F.col("hi")),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" in naive_plan or "Cartesian" in naive_plan
    keyless_plan = (
        range_join(
            points, intervals.drop("k"), on=[], point="ts", start="lo",
            end="hi", bin_width=4.0,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in keyless_plan and "Cartesian" not in keyless_plan

    overlap_plan = (
        interval_join(
            points.withColumnRenamed("ts", "ls").withColumn("le", F.col("ls") + 1),
            intervals, on=["k"], left_start="ls", left_end="le",
            right_start="lo", right_end="hi", bin_width=4.0,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in overlap_plan and "Cartesian" not in overlap_plan


def test_mixed_unit_classes_raise(spark, frames):
    """A numeric point against timestamp intervals would bin in mismatched
    units (raw values vs epoch micros) and silently mismatch — must raise."""
    points, _ = frames
    tsi = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["A"],
                "lo": pd.to_datetime(["2030-01-01"]),
                "hi": pd.to_datetime(["2030-02-01"]),
                "iid": [1],
            }
        )
    )
    with pytest.raises(TypeError, match="temporal or all numeric"):
        range_join(
            points, tsi, on=["k"], point="ts", start="lo", end="hi", bin_width=4.0
        )
    with pytest.raises(TypeError, match="temporal or all numeric"):
        interval_join(
            points.withColumn("te", F.col("ts") + 1),
            tsi,
            on=["k"],
            left_start="ts",
            left_end="te",
            right_start="lo",
            right_end="hi",
            bin_width=4.0,
        )


def _overlap_frames(spark, seed=20260814, nl=90, nr=70):
    rng = random.Random(seed)
    lrows, rrows = [], []
    for i in range(nl):
        lo = round(rng.uniform(0, 50), 2)
        # sprinkle NULL / empty intervals: must count as unmatched
        if i % 11 == 0:
            lrows.append((rng.choice("ab"), None, lo + 5, i))
        elif i % 13 == 0:
            lrows.append((rng.choice("ab"), lo, lo, i))  # empty
        else:
            lrows.append((rng.choice("ab"), lo, round(lo + rng.uniform(0.1, 12), 2), i))
    for j in range(nr):
        lo = round(rng.uniform(0, 50), 2)
        rrows.append((rng.choice("ab"), lo, round(lo + rng.uniform(0.1, 12), 2), j))
    left = spark.createDataFrame(lrows, "k string, ls double, le double, lid long")
    right = spark.createDataFrame(rrows, "k string, rs double, re double, rid long")
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    matched = {
        lid
        for (lid,) in con.execute(
            """SELECT DISTINCT l.lid FROM l JOIN r ON l.k = r.k
               AND l.ls < l.le AND r.rs < r.re  -- empty intervals overlap nothing
               AND l.ls < r.re AND r.rs < l.le"""
        ).fetchall()
    }
    return left, right, matched


@pytest.mark.parametrize("width", [0.5, 5.0, 100.0])
def test_interval_join_outer_variants(spark, width):
    """left/semi/anti interval-overlap joins decide at the ORIGINAL row
    granularity: each left row appears exactly once in semi+anti, and
    'left' emits every pair once plus unmatched rows once with null
    payload — across narrow/typical/one-giant-bin widths."""
    left, right, matched = _overlap_frames(spark)
    kw = dict(
        on=["k"], left_start="ls", left_end="le",
        right_start="rs", right_end="re", bin_width=width,
    )
    all_lids = {r.lid for r in left.collect()}
    semi = [r.lid for r in interval_join(left, right, how="left_semi", **kw).collect()]
    anti = [r.lid for r in interval_join(left, right, how="left_anti", **kw).collect()]
    assert sorted(semi) == sorted(matched)
    assert sorted(anti) == sorted(all_lids - matched)
    assert len(semi) == len(set(semi)) and len(anti) == len(set(anti))
    # semi/anti emit only left columns
    assert set(interval_join(left, right, how="left_semi", **kw).columns) == {
        "k", "ls", "le", "lid"
    }

    out = interval_join(left, right, how="left", **kw).collect()
    null_rows = [r for r in out if r.rid is None]
    pair_rows = [(r.lid, r.rid) for r in out if r.rid is not None]
    assert {r.lid for r in null_rows} == all_lids - matched
    assert len(null_rows) == len(all_lids - matched)  # exactly once each
    assert len(pair_rows) == len(set(pair_rows))  # no dup pairs
    inner = {
        (r.lid, r.rid)
        for r in interval_join(left, right, how="inner", **kw).collect()
    }
    assert set(pair_rows) == inner


def test_interval_outer_pair_subtree_once(spark):
    """Efficiency pin: the outer variants reference the expensive binned
    pair subtree exactly ONCE (the 'left' variant is a plain left join of
    the original rows against the pair stream), so nothing pair-sized is
    ever cached. The `greatest(...)` one-bin-dedup residual is the pair
    subtree's fingerprint — it must appear exactly once in the plan."""
    left, right, _ = _overlap_frames(spark, nl=40, nr=30)
    kw = dict(
        on=["k"], left_start="ls", left_end="le",
        right_start="rs", right_end="re", bin_width=5.0, row_id="lid",
    )
    for how in ("left_semi", "left_anti", "left"):
        plan = (
            interval_join(left, right, how=how, **kw)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("greatest") == 1, (how, plan)
        # row_id path: zero caches, zero checkpoints
        assert "InMemoryTableScan" not in plan, how


def test_interval_outer_row_id_no_caches(spark):
    """Scoping pin (r5 item 3): with a caller-supplied row_id the outer
    variants create NO persistent RDDs — a second call cannot be holding
    the first call's storage because there is none."""
    jsc_sc = spark.sparkContext._jsc.sc()
    before = jsc_sc.getPersistentRDDs().size()
    left, right, matched = _overlap_frames(spark, nl=40, nr=30)
    kw = dict(
        on=["k"], left_start="ls", left_end="le",
        right_start="rs", right_end="re", bin_width=5.0, row_id="lid",
    )
    out = interval_join(left, right, how="left", **kw)
    got = {r.lid for r in out.collect() if r.rid is not None}
    assert got == matched
    # may legitimately DECREASE (ContextCleaner GC of earlier tests'
    # localCheckpoint RDDs); the pin is that THIS call added nothing
    assert jsc_sc.getPersistentRDDs().size() <= before


def test_interval_outer_row_id_fault_deterministic(spark):
    """Fault-determinism pin (r5 item 1): with row_id the matched /
    unmatched decision is pinned to caller data, so evicting EVERY cache
    between plan construction and each execution — the local stand-in for
    losing an executor's blocks and recomputing from lineage — cannot
    flip a row between matched and unmatched."""
    left, right, matched = _overlap_frames(spark)
    all_lids = {r.lid for r in left.collect()}
    kw = dict(
        on=["k"], left_start="ls", left_end="le",
        right_start="rs", right_end="re", bin_width=2.0, row_id="lid",
    )
    out = interval_join(left, right, how="left", **kw)
    runs = []
    for _ in range(2):
        spark.catalog.clearCache()
        rows = out.collect()
        null_ids = sorted(r.lid for r in rows if r.rid is None)
        pair_ids = sorted((r.lid, r.rid) for r in rows if r.rid is not None)
        runs.append((null_ids, pair_ids))
    assert runs[0] == runs[1]
    assert set(runs[0][0]) == all_lids - matched
    anti = interval_join(left, right, how="left_anti", **kw)
    spark.catalog.clearCache()
    assert {r.lid for r in anti.collect()} == all_lids - matched


def test_interval_outer_minted_id_reliable_checkpoint(spark, tmp_path):
    """Without row_id and WITH a checkpoint dir configured, the minted-id
    frame is reliably checkpointed (survives executor loss: re-read, not
    re-minted) — the plan reads an ExistingRDD and checkpoint files are
    on disk. Without a dir, eager localCheckpoint cuts lineage so a
    re-mint is impossible (loss fails loudly instead of corrupting)."""
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    left, right, matched = _overlap_frames(spark, nl=40, nr=30)
    all_lids = {r.lid for r in left.collect()}
    kw = dict(
        on=["k"], left_start="ls", left_end="le",
        right_start="rs", right_end="re", bin_width=5.0,
    )
    # no-dir path: localCheckpoint → lineage cut (scan of an existing RDD)
    local_plan = (
        interval_join(left, right, how="left_semi", **kw)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ExistingRDD" in local_plan
    ckpt = str(tmp_path / "ckpt")
    sc.setCheckpointDir(ckpt)
    try:
        semi = interval_join(left, right, how="left_semi", **kw)
        assert {r.lid for r in semi.collect()} == matched
        anti = interval_join(left, right, how="left_anti", **kw)
        assert {r.lid for r in anti.collect()} == all_lids - matched
        ckpt_files = [
            p for p in (tmp_path / "ckpt").rglob("*") if p.is_file()
        ]
        assert ckpt_files, "reliable checkpoint wrote no files"
    finally:
        sc._jsc.sc().setCheckpointDir(None)
    assert sc.getCheckpointDir() is None
