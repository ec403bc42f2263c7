"""Structured Streaming twins must equal their batch forms on static data."""

import shutil

import pytest


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "events.parquet")
    return str(d)


def test_hourly_rollup_stream_equals_batch(spark, events_dir):
    from person_linkage_case_study_spark import queries as catalog
    from person_linkage_case_study_spark.streaming.stream import (
        hourly_rollup_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    stream = read_events_stream(spark, events_dir)
    result = run_stream_to_memory(
        hourly_rollup_stream(stream), "hourly_test", output_mode="complete"
    )
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in result.collect()
    }
    batch = catalog.queries()["events_hourly_rollup"](spark, "/root/testdata/sf0.001")
    want = {
        (r["hour"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert got == want


def test_sessionize_stream_runs(spark, events_dir):
    from person_linkage_case_study_spark.streaming.stream import (
        read_events_stream,
        run_stream_to_memory,
        sessionize_stream,
    )

    stream = read_events_stream(spark, events_dir)
    result = run_stream_to_memory(
        sessionize_stream(stream), "sessions_test", output_mode="complete"
    )
    rows = result.collect()
    assert len(rows) > 0
    assert all(r["n_events"] >= 1 for r in rows)


def test_stateful_first_seen_dedup_across_microbatches(spark, tmp_path_factory):
    """applyInPandasWithState: the seen-set persists across micro-batches
    (maxFilesPerTrigger=1 -> one batch per file)."""
    import pandas as pd
    from pyspark.sql import types as T

    from person_linkage_case_study_spark.streaming.stateful import (
        streaming_first_seen_dedup,
        with_fingerprint,
    )

    d = tmp_path_factory.mktemp("docs_stream")
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    # batch 1: A(1) B(2) + in-batch dup of A(3); batch 2: dup of B(4), C(5)
    spark.createDataFrame(
        [(1, "alpha"), (2, "bravo"), (3, "alpha")], schema
    ).coalesce(1).write.parquet(str(d / "b1"))
    spark.createDataFrame([(4, "bravo"), (5, "charlie")], schema).coalesce(
        1
    ).write.parquet(str(d / "b2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    deduped = streaming_first_seen_dedup(with_fingerprint(stream))
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select doc_id, text from dedup_test").collect()
    got = {(r["doc_id"], r["text"]) for r in rows}
    # in-batch dup (3) and cross-batch dup (4) are suppressed
    assert got == {(1, "alpha"), (2, "bravo"), (5, "charlie")}
