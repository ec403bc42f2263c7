"""Streaming linkage must equal batch linkage on the same records."""

import pytest
from pyspark.sql import functions as F

from person_linkage_case_study_spark.operators.gamma import jw_comparison
from person_linkage_case_study_spark.operators.scoring import LinkageModel
from person_linkage_case_study_spark.streaming.incremental_linkage import (
    link_microbatch,
    run_incremental_linkage,
)


def make_model():
    c = jw_comparison("name", thresholds=(0.9,))
    c.m = [0.05, 0.15, 0.8]
    c.u = [0.9, 0.08, 0.02]
    return LinkageModel([c], lambda_prior=0.05)


@pytest.fixture(scope="module")
def data(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("inc_linkage")
    inputs = spark.createDataFrame(
        [(f"i{i}", i % 5, f"NAME{i}") for i in range(50)],
        "record_id string, blk int, name string",
    )
    # two part-files in one source dir so the stream sees ≥2 micro-batches
    # with maxFilesPerTrigger=1
    inputs.filter(F.col("record_id") < "i3").coalesce(1).write.mode("append").parquet(
        str(d / "in")
    )
    inputs.filter(F.col("record_id") >= "i3").coalesce(1).write.mode("append").parquet(
        str(d / "in")
    )
    reference = spark.createDataFrame(
        [(f"r{i}", i % 5, f"NAME{i}" if i % 2 == 0 else f"OTHER{i}") for i in range(50)],
        "record_id string, blk int, name string",
    )
    return str(d), inputs, reference


def test_streaming_equals_batch(spark, data):
    base, inputs, reference = data
    model = make_model()

    batch_links = link_microbatch(inputs, reference, model, ["blk"], 0.5)
    want = {
        (r["record_id_input"], r["record_id_reference"])
        for r in batch_links.collect()
    }
    assert len(want) > 0

    stream = (
        spark.readStream.schema("record_id string, blk int, name string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/in")
    )
    sink_path = f"{base}/links_out"
    q = run_incremental_linkage(
        spark, stream, reference, model, ["blk"], 0.5,
        sink=sink_path, checkpoint_dir=f"{base}/ckpt",
    )
    q.awaitTermination()
    got = {
        (r["record_id_input"], r["record_id_reference"])
        for r in spark.read.parquet(sink_path).collect()
    }
    assert got == want


def test_linkage_sink_replay_idempotent(spark, data, tmp_path_factory):
    """Same foreachBatch replay contract as incremental_dedup (r2
    ADVICE): re-running a batch with the same batch_id must overwrite
    that batch's sink partition, not append duplicate link rows."""
    from person_linkage_case_study_spark.streaming.incremental_linkage import (
        run_incremental_linkage,
    )

    base, inputs, reference = data
    model = make_model()
    tmp = tmp_path_factory.mktemp("linkage_replay")
    sink_path = str(tmp / "links")

    # drive the module's parquet sink writer directly, replaying batch 1
    import person_linkage_case_study_spark.streaming.incremental_linkage as mod

    b0 = inputs.filter(F.col("record_id") < "i3")
    b1 = inputs.filter(F.col("record_id") >= "i3")

    def write(links, batch_id):
        links.withColumn("ingest_batch", F.lit(batch_id)).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "ingest_batch"
        ).parquet(sink_path)

    for batch, bid in [(b0, 0), (b1, 1)]:
        write(mod.link_microbatch(batch, reference, model, ["blk"], 0.5), bid)
    first = spark.read.parquet(sink_path).count()
    # replay batch 1: partial/total prior write must be replaced, not appended
    write(mod.link_microbatch(b1, reference, model, ["blk"], 0.5), 1)
    assert spark.read.parquet(sink_path).count() == first


def test_parquet_sink_path_uses_partition_overwrite(spark, data, tmp_path_factory):
    """End-to-end: the string-sink path writes ingest_batch partitions
    (the physical layout replay idempotency depends on)."""
    import os

    base, inputs, reference = data
    model = make_model()
    tmp = tmp_path_factory.mktemp("linkage_sink_layout")
    stream = (
        spark.readStream.schema("record_id string, blk int, name string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/in")
    )
    sink_path = str(tmp / "links_out")
    q = run_incremental_linkage(
        spark, stream, reference, model, ["blk"], 0.5,
        sink=sink_path, checkpoint_dir=str(tmp / "ckpt"),
    )
    q.awaitTermination()
    parts = [p for p in os.listdir(sink_path) if p.startswith("ingest_batch=")]
    assert len(parts) >= 2  # two source files -> two micro-batch partitions
