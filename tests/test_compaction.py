"""Small-file compaction: content identity, file-count targets,
partition-pruning preservation, idempotence, and the quiescing filter.

The store under test mimics the streaming sinks' layout — one
``ingest_batch=N`` directory per micro-batch, several files each."""

import os

import pytest
from pyspark.sql import functions as F

from person_linkage_case_study_spark.sources.compaction import (
    compact_parquet,
    plan_compaction,
)


def _digest(df):
    return sorted(tuple(r) for r in df.collect())


def _data_files(root):
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith((".", "_"))]
        out.extend(
            os.path.join(dirpath, f)
            for f in filenames
            if not f.startswith((".", "_")) and not f.endswith(".crc")
        )
    return out


@pytest.fixture()
def store(spark, tmp_path):
    path = str(tmp_path / "store")
    df = spark.range(0, 4000).select(
        F.col("id").alias("rid"),
        (F.col("id") % 7).cast("double").alias("x"),
        F.concat(F.lit("v"), (F.col("id") % 13).cast("string")).alias("s"),
        (F.col("id") % 4).alias("ingest_batch"),
    )
    # 4 partitions × 8 files each, the post-ingest shape
    df.repartition(8).write.partitionBy("ingest_batch").mode(
        "overwrite"
    ).parquet(path)
    return path, df


def test_compaction_preserves_content_and_reduces_files(spark, store):
    path, df = store
    before = _digest(spark.read.parquet(path))
    n_before = len(_data_files(path))
    assert n_before >= 4 * 8

    summary = compact_parquet(spark, path)
    assert summary["leaves_scanned"] == 4
    assert summary["leaves_compacted"] == 4
    assert summary["files_before"] == n_before
    # tiny partitions → one file each
    assert summary["files_after"] == 4
    assert len(_data_files(path)) == 4
    # value-identical content, partition column included
    assert _digest(spark.read.parquet(path)) == before


def test_partition_pruning_survives_compaction(spark, store):
    path, _ = store
    compact_parquet(spark, path)
    pruned = spark.read.parquet(path).filter(F.col("ingest_batch") == 2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == 1000
    # the scan must still prune on the partition directory
    assert "ingest_batch" in plan


def test_compaction_is_idempotent(spark, store):
    path, _ = store
    first = compact_parquet(spark, path)
    assert first["leaves_compacted"] == 4
    second = compact_parquet(spark, path)
    assert second["leaves_compacted"] == 0
    assert second["files_before"] == 0


def test_dry_run_touches_nothing(spark, store):
    path, _ = store
    files = set(_data_files(path))
    summary = compact_parquet(spark, path, dry_run=True)
    assert summary["leaves_compacted"] == 4
    assert set(_data_files(path)) == files


def test_partition_filter_quiesces_live_batch(spark, store):
    path, _ = store
    # pretend batch 3 is the stream's live partition: don't touch it
    summary = compact_parquet(
        spark, path, partition_filter=lambda rel: "ingest_batch=3" not in rel
    )
    assert summary["leaves_compacted"] == 3
    assert summary["skipped_by_filter"] == 1
    remaining = [
        f for f in _data_files(path) if "ingest_batch=3" in f
    ]
    assert len(remaining) == 8


def test_target_bytes_yields_multiple_files(spark, tmp_path):
    path = str(tmp_path / "flat")
    spark.range(0, 200_000).select(
        F.col("id").alias("rid"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    ).repartition(16).write.mode("overwrite").parquet(path)
    before = _digest(spark.read.parquet(path))
    total = sum(os.path.getsize(f) for f in _data_files(path))
    target = total // 3  # expect ceil(total/target) == 4 (or 3) files
    summary = compact_parquet(spark, path, target_file_bytes=int(target))
    assert summary["leaves_scanned"] == 1  # unpartitioned root-as-leaf
    assert 3 <= summary["files_after"] <= 4
    assert _digest(spark.read.parquet(path)) == before


def test_plan_is_metadata_only_and_sorted(spark, store):
    path, _ = store
    plans = plan_compaction(spark, path)
    assert [p.path for p in plans] == sorted(p.path for p in plans)
    assert all(p.n_files == 8 and p.needs_compaction for p in plans)
    assert all(p.target_files == 1 for p in plans)
