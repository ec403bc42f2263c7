"""Structured Streaming equivalents of the batch event operators.

The reference is pure batch (SURVEY.md §2.10) — streaming here extends the
engine for continuous ingestion, built so every streaming aggregation has a
batch twin in queries.py (the driver's oracle diffs the batch twin; tests
run the stream with availableNow over the same files and assert equality).

Patterns: file-source readStream with pinned schema, watermarked tumbling
windows, and applyInPandasWithState-free sessionization (flatMapGroups-style
sessions need state; for parity tests we sessionize per micro-batch with
the batch window form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path_glob: str) -> DataFrame:
    """File-source stream over events parquet files. ``ts`` is declared
    TimestampType, matching the TIMESTAMP(MICROS) physical type of the
    testdata parquet (file streams require a pinned schema; a type drift
    in the source shows up here as epoch-garbage hours, not an error)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path_glob)
    )


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup — the streaming twin of the
    batch ``events_hourly_rollup`` query (late data beyond the watermark
    is dropped; in-order test data produces identical results)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session windows via the built-in session_window (state handled by
    the streaming engine; gap-based, per user)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", f"{gap_minutes} minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming query to completion on available data (availableNow
    trigger) and return the in-memory result table."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"select * from {query_name}")
