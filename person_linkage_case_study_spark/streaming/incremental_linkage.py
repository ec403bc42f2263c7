"""Incremental (streaming) record linkage.

Beyond-reference extension: the batch cascade assumes the full input file
is present; here new input records arrive as a stream and are linked
against a static (broadcast-friendly) reference file micro-batch by
micro-batch with ``foreachBatch`` — each micro-batch runs the SAME
blocked-pairs → gamma → Fellegi-Sunter plan as the batch engine, so
semantics are identical by construction (tested: streaming the input in
chunks produces exactly the batch result).

State: confirmed links accumulate in a parquet sink partitioned by
``ingest_batch`` and written with dynamic partition overwrite, so a
foreachBatch REPLAY (same batch_id after a mid-batch failure) replaces
any partial write instead of appending duplicate link rows — the same
idempotency contract as ``incremental_dedup``. The "already linked"
exclusion happens naturally because each input record arrives exactly
once (file/queue source semantics); for at-least-once sources, dedup on
record_id at read (dropDuplicates with watermark).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.blocking import blocked_pairs
from ..operators.scoring import LinkageModel, score_pairs


def link_microbatch(
    batch: DataFrame,
    reference: DataFrame,
    model: LinkageModel,
    block_on: list[str],
    threshold: float,
) -> DataFrame:
    """One micro-batch through the batch scoring plan (shared code path)."""
    pairs = blocked_pairs(batch, reference, block_on)
    scored = score_pairs(pairs, model, threshold_match_probability=threshold)
    return scored.select(
        F.col("record_id_l").alias("record_id_input"),
        F.col("record_id_r").alias("record_id_reference"),
        "match_weight",
        "match_probability",
    )


def run_incremental_linkage(
    spark: SparkSession,
    input_stream: DataFrame,
    reference: DataFrame,
    model: LinkageModel,
    block_on: list[str],
    threshold: float,
    sink: Callable[[DataFrame, int], None] | str,
    checkpoint_dir: str | None = None,
):
    """Start a foreachBatch streaming query linking ``input_stream``
    against ``reference``.

    ``sink``: a callable (links_df, batch_id) or a parquet path for a
    replay-idempotent per-batch-partition sink. Returns the
    StreamingQuery (caller awaits)."""
    reference = reference.persist()

    if isinstance(sink, str):
        sink_path = sink

        def write_links(links: DataFrame, batch_id: int) -> None:
            links.withColumn("ingest_batch", F.lit(batch_id)).write.mode(
                "overwrite"
            ).option("partitionOverwriteMode", "dynamic").partitionBy(
                "ingest_batch"
            ).parquet(sink_path)

        sink_fn = write_links
    else:
        sink_fn = sink

    def process(batch: DataFrame, batch_id: int) -> None:
        links = link_microbatch(batch, reference, model, block_on, threshold)
        sink_fn(links, batch_id)

    writer = input_stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
