"""Streaming incremental table profiling.

Beyond-reference extension tying two of this engine's contracts
together: the mergeable-summaries profiler (``operators/profile.py`` —
HLL NDV sketches + equi-depth quantile grids, the A8/A9 surface made
incremental) and Structured Streaming's foreachBatch micro-batch loop.

Each micro-batch is profiled ONCE into a #cols-row mergeable state slice
(``profile_increment``) appended to a parquet state store partitioned by
``ingest_batch`` with dynamic partition overwrite — the same
replay-idempotency contract as ``incremental_linkage``/``incremental_dedup``:
a foreachBatch REPLAY of a batch id replaces its own partition instead
of double-counting the batch. "What does the whole stream look like" is
then answered at READ time by folding the state rows
(``merge_increments``) — #batches × #cols rows, never a rescan of the
streamed data. This is exactly the day→month→total contract
(`mergeable_rollup_capstone`) with days replaced by micro-batches.

At 100 TB-scale ingest this is the difference between "profile the
table" being a nightly full scan and being a metadata fold: the stream
pays one single-pass aggregate per micro-batch (the data is in memory
anyway), and any window of batches can be profiled after the fact by
folding a subset of state rows (``WHERE ingest_batch BETWEEN a AND b``
prunes on the partition column).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.profile import merge_increments, profile_increment


def run_incremental_profile(
    spark: SparkSession,
    input_stream: DataFrame,
    cols: Sequence[str],
    state_path: str,
    checkpoint_dir: str | None = None,
    lg_k: int = 12,
    quantile_k: int = 128,
):
    """Start a foreachBatch streaming query profiling ``input_stream``
    into the mergeable state store at ``state_path``.

    ``lg_k`` must be constant for the store's lifetime (sketch union
    requires one configuration). Returns the StreamingQuery (caller
    awaits)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        inc = profile_increment(
            batch, cols, lg_k=lg_k, quantile_k=quantile_k
        ).withColumn("ingest_batch", F.lit(batch_id))
        inc.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("ingest_batch").parquet(state_path)

    writer = input_stream.writeStream.foreachBatch(process).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def profile_of_stream(
    spark: SparkSession,
    state_path: str,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    batch_lo: int | None = None,
    batch_hi: int | None = None,
) -> DataFrame:
    """Fold the state store into final per-column stats — a metadata
    operation over #batches × #cols rows. ``batch_lo``/``batch_hi``
    restrict the fold to a batch window (partition-pruned scan)."""
    state = spark.read.parquet(state_path)
    if batch_lo is not None:
        state = state.filter(F.col("ingest_batch") >= batch_lo)
    if batch_hi is not None:
        state = state.filter(F.col("ingest_batch") <= batch_hi)
    return merge_increments(state.drop("ingest_batch"), quantiles=quantiles)
