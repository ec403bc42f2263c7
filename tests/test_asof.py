"""As-of join (operators/asof.py): semantics + DuckDB ASOF JOIN oracle.

DuckDB implements ASOF JOIN natively, so the oracle here is an
independent engine's implementation of the same semantics — the
strongest check available for an operator Spark lacks.
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from person_linkage_case_study_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    # trades/quotes shape: per-key event stream + slower state stream
    trades = spark.createDataFrame(
        [
            ("A", 10.0, 1),
            ("A", 25.0, 2),
            ("A", 30.0, 3),  # exactly at a quote ts: tie is eligible
            ("B", 5.0, 4),   # before any B quote: no match
            ("B", 50.0, 5),
            ("C", 7.0, 6),   # key with no quotes at all
        ],
        "k string, ts double, trade_id long",
    )
    quotes = spark.createDataFrame(
        [
            ("A", 9.0, 100.0),
            ("A", 24.0, 101.0),
            ("A", 30.0, 102.0),
            ("B", 40.0, 200.0),
            ("B", 49.0, 201.0),
        ],
        "k string, ts double, px double",
    )
    return trades, quotes


def _oracle(trades_pd, quotes_pd, direction="backward"):
    con = duckdb.connect()
    con.register("t", trades_pd)
    con.register("q", quotes_pd)
    op = ">=" if direction == "backward" else "<="
    return con.execute(
        f"""
        SELECT t.k, t.ts, t.trade_id, q.ts AS ts_r, q.px
        FROM t ASOF LEFT JOIN q ON t.k = q.k AND t.ts {op} q.ts
        ORDER BY t.trade_id
        """
    ).df()


def _got(df):
    return (
        df.toPandas()
        .sort_values("trade_id")
        .reset_index(drop=True)[["k", "ts", "trade_id", "ts_r", "px"]]
    )


def test_backward_matches_duckdb_asof(frames):
    trades, quotes = frames
    got = _got(asof_join(trades, quotes, on=["k"], left_ts="ts"))
    want = _oracle(trades.toPandas(), quotes.toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_forward_matches_duckdb_asof(frames):
    trades, quotes = frames
    got = _got(asof_join(trades, quotes, on=["k"], left_ts="ts", direction="forward"))
    want = _oracle(trades.toPandas(), quotes.toPandas(), direction="forward")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_backward_fuzz_vs_duckdb(spark):
    """Randomized streams (seeded): equality with DuckDB's ASOF across
    duplicate timestamps, empty keys, and interleavings. Right ts are
    made unique per key (both engines leave the equal-ts winner among
    duplicate right rows implementation-defined; with unique ts the
    semantics are total)."""
    import random

    rng = random.Random(99)
    t_rows = [
        (rng.choice("ABCDE"), float(rng.randint(0, 100)), i) for i in range(200)
    ]
    seen = set()
    q_rows = []
    for _ in range(150):
        k = rng.choice("ABCDF")  # F: right-only key; E stays left-only
        ts = float(rng.randint(0, 100))
        if (k, ts) not in seen:
            seen.add((k, ts))
            q_rows.append((k, ts, float(len(q_rows))))
    trades = spark.createDataFrame(t_rows, "k string, ts double, trade_id long")
    quotes = spark.createDataFrame(q_rows, "k string, ts double, px double")
    got = _got(asof_join(trades, quotes, on=["k"], left_ts="ts"))
    want = _oracle(trades.toPandas(), quotes.toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_tolerance_nulls_out_far_matches(frames):
    trades, quotes = frames
    out = asof_join(
        trades, quotes, on=["k"], left_ts="ts", tolerance=F.lit(1.0)
    ).collect()
    by_id = {r["trade_id"]: r for r in out}
    assert by_id[1]["px"] == 100.0   # gap 1.0: kept
    assert by_id[2]["px"] == 101.0   # gap 1.0: kept
    assert by_id[3]["px"] == 102.0   # gap 0: kept
    assert by_id[5]["px"] == 201.0   # B quote at 49, trade at 50: gap 1.0, kept
    assert by_id[4]["px"] is None    # no earlier quote at all
    assert by_id[6]["px"] is None    # key never quoted


def test_equal_ts_rights_resolved_by_tiebreak(spark):
    left = spark.createDataFrame([("A", 10.0, 1)], "k string, ts double, id long")
    right = spark.createDataFrame(
        [("A", 10.0, 7.0, 1), ("A", 10.0, 9.0, 2), ("A", 10.0, 8.0, 0)],
        "k string, ts double, px double, seq long",
    )
    r = asof_join(
        left, right, on=["k"], left_ts="ts", tiebreak_cols=["seq"]
    ).collect()[0]
    assert r["px"] == 9.0 and r["seq"] == 2  # max seq wins deterministically


def test_single_shuffle_plan(frames):
    """Scale pin: the physical plan contains exactly ONE exchange (the
    union shuffled once on the key) — no pair explosion, no second
    shuffle, no broadcast of the big side."""
    trades, quotes = frames
    plan = asof_join(trades, quotes, on=["k"], left_ts="ts")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_null_timestamps_never_match(spark):
    """ASOF semantics (DuckDB/pandas): a right row with NULL ts matches
    nothing; a left row with NULL ts matches nothing — both previously
    leaked matches via nulls-first/last window ordering."""
    left = spark.createDataFrame(
        [("A", 5.0, 1), ("A", None, 2)], "k string, ts double, id long"
    )
    right = spark.createDataFrame(
        [("A", None, 100.0), ("A", 3.0, 101.0)], "k string, ts double, px double"
    )
    got = {r["id"]: r for r in asof_join(left, right, on=["k"], left_ts="ts").collect()}
    assert got[1]["px"] == 101.0 and got[1]["ts_r"] == 3.0  # real match only
    assert got[2]["px"] is None and got[2]["ts_r"] is None  # null-ts left: no match
    # forward direction: null-ts left previously saw every right under desc
    fwd = {r["id"]: r for r in asof_join(
        left, right, on=["k"], left_ts="ts", direction="forward"
    ).collect()}
    assert fwd[2]["px"] is None


def test_interval_tolerance_on_timestamps(spark):
    """The docstring's tolerance spelling for timestamp columns must work:
    timestamp - timestamp yields an interval, compared to the interval."""
    from datetime import datetime

    left = spark.createDataFrame(
        [("A", datetime(2030, 1, 1, 12, 0), 1), ("A", datetime(2030, 1, 1, 18, 0), 2)],
        "k string, ts timestamp, id long",
    )
    right = spark.createDataFrame(
        [("A", datetime(2030, 1, 1, 11, 30), 7.0)], "k string, ts timestamp, px double"
    )
    out = {r["id"]: r for r in asof_join(
        left, right, on=["k"], left_ts="ts", tolerance=F.expr("INTERVAL 1 HOUR")
    ).collect()}
    assert out[1]["px"] == 7.0      # 30 min gap: kept
    assert out[2]["px"] is None     # 6.5 h gap: nulled by tolerance


def test_map_payload_column_survives(spark):
    """Payload columns stay out of the window ORDER BY, so unorderable
    types (map) join fine."""
    left = spark.createDataFrame([("A", 5.0, 1)], "k string, ts double, id long")
    right = spark.createDataFrame(
        [("A", 3.0, {"x": 1})], "k string, ts double, attrs map<string,int>"
    )
    r = asof_join(left, right, on=["k"], left_ts="ts").collect()[0]
    assert r["attrs"] == {"x": 1}
