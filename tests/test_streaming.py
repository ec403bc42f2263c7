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
