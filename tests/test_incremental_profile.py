"""Streaming incremental profiling: the fold of per-micro-batch mergeable
state must equal profiling the whole streamed dataset at once — exact for
the deterministic stats, within sketch/rank error for the approximate
tier — and batch-id replay must not double-count."""

import pytest
from pyspark.sql import functions as F

from person_linkage_case_study_spark.operators.profile import (
    merge_increments,
    profile_increment,
)
from person_linkage_case_study_spark.streaming.incremental_profile import (
    profile_of_stream,
    run_incremental_profile,
)

COLS = ["x", "s"]


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("inc_profile")
    full = spark.range(0, 3000).select(
        F.col("id").alias("rid"),
        (F.col("id") % 97).cast("double").alias("x"),
        F.concat(F.lit("v"), (F.col("id") % 13).cast("string")).alias("s"),
    )
    # three part-files → three micro-batches at maxFilesPerTrigger=1
    for lo, hi in ((0, 1000), (1000, 2000), (2000, 3000)):
        full.filter((F.col("rid") >= lo) & (F.col("rid") < hi)).coalesce(
            1
        ).write.mode("append").parquet(str(d / "in"))
    stream = (
        spark.readStream.schema("rid long, x double, s string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "in"))
    )
    q = run_incremental_profile(
        spark,
        stream,
        COLS,
        state_path=str(d / "state"),
        checkpoint_dir=str(d / "ckpt"),
    )
    q.awaitTermination()
    return spark, str(d), full


def test_stream_fold_equals_batch_profile(streamed):
    spark, d, full = streamed
    folded = {
        r["column"]: r
        for r in profile_of_stream(spark, f"{d}/state").collect()
    }
    direct = {
        r["column"]: r
        for r in merge_increments(profile_increment(full, COLS)).collect()
    }
    assert set(folded) == set(COLS)
    for c in COLS:
        for field in ("count", "nulls", "min", "max", "mean"):
            assert folded[c][field] == direct[c][field], (c, field)
        # NDV: union-of-batch-sketches vs one-pass sketch, within 2·rsd
        rsd = 1.04 / (2**12) ** 0.5
        m, w = folded[c]["approx_distinct"], direct[c]["approx_distinct"]
        assert abs(m - w) <= 2 * rsd * max(w, 1), (c, m, w)
    # quantiles of x: uniform 0..96 → q50 near 48 (grid rank error ~1/128)
    assert abs(folded["x"]["q50"] - 48) <= 4


def test_state_store_is_batch_partitioned_and_bounded(streamed):
    spark, d, _ = streamed
    state = spark.read.parquet(f"{d}/state")
    # one slice of #cols rows per micro-batch — bytes, never data-sized
    assert state.count() == 3 * len(COLS)
    assert set(
        r["ingest_batch"] for r in state.select("ingest_batch").distinct().collect()
    ) == {0, 1, 2}


def test_batch_window_fold_prunes(streamed):
    spark, d, full = streamed
    # folding batches 0-1 must profile exactly the first two thirds
    part = {
        r["column"]: r
        for r in profile_of_stream(spark, f"{d}/state", batch_hi=1).collect()
    }
    assert part["x"]["count"] == 2000


def test_replay_overwrites_instead_of_double_counting(streamed):
    spark, d, full = streamed
    # simulate a foreachBatch replay of batch 1: re-profile some subset
    # under the same batch id — the partition is REPLACED, not appended
    sub = full.filter((F.col("rid") >= 1000) & (F.col("rid") < 2000))
    profile_increment(sub, COLS).withColumn(
        "ingest_batch", F.lit(1)
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("ingest_batch").parquet(f"{d}/state")
    folded = {
        r["column"]: r
        for r in profile_of_stream(spark, f"{d}/state").collect()
    }
    assert folded["x"]["count"] == 3000  # unchanged — no double count
