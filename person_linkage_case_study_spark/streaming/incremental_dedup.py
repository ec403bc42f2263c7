"""Incremental (streaming) near-duplicate suppression.

The training-data-firehose companion to ``incremental_linkage``: documents
arrive as a stream; each micro-batch is MinHash-signed (the zero-shuffle
arrow kernel — foreachBatch hands us a plain batch DataFrame) and
LSH-matched against (a) lower-id documents in the same micro-batch and
(b) an accumulating parquet store of EVERY signature seen so far. A
document that near-matches anything earlier is flagged a duplicate;
everything — survivor or not — lands in the store.

Storing all signatures (not just survivors) is what makes the decision
CHUNKING-INVARIANT: "drop d iff d matches any earlier-arrived doc" gives
the same survivor set whether the corpus arrives in 1 chunk or 100,
because a dropped doc can still be the earlier witness for a later one
(A≈B dropped, B≈C, A̸≈C: C must still drop). Keying the rule on arrival
order only — never on a doc's own dup status — removes the order
sensitivity that plagues greedy streaming dedup. (The survivor set
equals the single-batch run's whenever chunk boundaries respect the id
order — the natural case for file sources named in ingest order; under
arbitrary arrival the decisions are still deterministic, keyed on actual
arrival order.) Pinned by
tests/test_streaming_dedup.py::test_chunking_invariance.

Scale shape per micro-batch: signature build is row-local (no shuffle);
the store join is banded LSH (``minhash_candidate_pairs_between``), so
cost tracks candidate collisions, not |store|; the store itself is a
parquet table of (doc_id, signature) — 64 longs/doc — PARTITIONED BY
ingest_batch: each micro-batch lands as a dynamic-partition OVERWRITE of
its own partition, so a foreachBatch replay after a mid-batch failure
replaces any partial write instead of appending duplicates, and the
cross-match reads only strictly-earlier partitions
(ingest_batch < batch_id) so a replayed doc never LSH-matches its own
stored signature. Decisions use the same overwrite-by-batch scheme —
both sinks are exactly-once under replay.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dedup.minhash import (
    minhash_candidate_pairs,
    minhash_candidate_pairs_between,
    minhash_signatures,
)

_STORE_SCHEMA = "doc_id long, signature array<long>, ingest_batch long"


def _read_store(spark: SparkSession, store_path: str) -> DataFrame:
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(_STORE_SCHEMA).parquet(store_path)
    except AnalysisException:  # first batch: store directory does not exist
        # yet. ONLY the missing-path case degrades to an empty store; any
        # other read failure (corrupt file, permissions, transient FS
        # error) propagates — silently treating it as "no history" would
        # wave dups through with no error surfaced (r2 ADVICE).
        return spark.createDataFrame([], _STORE_SCHEMA)


def dedup_microbatch(
    batch_sigs: DataFrame,
    store_sigs: DataFrame,
    est_jaccard_threshold: float,
    bands: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, is_dup) decisions for one micro-batch of signatures.

    ``is_dup`` ⟺ the doc LSH-matches a lower-id doc in the same batch or
    any doc already in the store (arrival order = batch order, ties within
    a batch broken by id — deterministic for file/queue sources).
    """
    intra = minhash_candidate_pairs(
        batch_sigs,
        id_col=id_col,
        bands=bands,
        est_jaccard_threshold=est_jaccard_threshold,
    ).select(F.col(f"{id_col}_r").alias(id_col))  # higher id loses
    cross = minhash_candidate_pairs_between(
        batch_sigs,
        store_sigs,
        id_col=id_col,
        bands=bands,
        est_jaccard_threshold=est_jaccard_threshold,
    ).select(F.col(f"{id_col}_l").alias(id_col))  # new doc loses to history
    dups = intra.unionByName(cross).distinct()
    return batch_sigs.select(id_col).join(
        dups.withColumn("is_dup", F.lit(True)), on=id_col, how="left"
    ).select(id_col, F.coalesce("is_dup", F.lit(False)).alias("is_dup"))


def parquet_decisions_sink(sink_path: str) -> Callable[[DataFrame, int], None]:
    """Decisions sink writing overwrite-by-batch partitions: a replayed
    batch replaces its own rows instead of appending duplicates."""

    def write_decisions(decisions: DataFrame, batch_id: int) -> None:
        decisions.withColumn("ingest_batch", F.lit(batch_id)).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "ingest_batch"
        ).parquet(sink_path)

    return write_decisions


def process_dedup_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    store_path: str,
    sink_fn: Callable[[DataFrame, int], None],
    est_jaccard_threshold: float = 0.5,
    num_hashes: int = 64,
    shingle_n: int = 2,
    bands: int = 16,
    hash_fn: str = "crc32",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One micro-batch of the incremental dedup — IDEMPOTENT under
    foreachBatch replay (module-level so the replay contract is testable
    without driving a StreamingQuery).

    Replay idempotency (foreachBatch re-runs a batch with the SAME
    batch_id after a mid-batch failure): the cross-match reads only
    STRICTLY EARLIER batches — if the failed attempt already wrote (part
    of) this batch's store partition, matching against it would flag
    every replayed doc as a dup of its own signature — and the store
    write is a dynamic-partition overwrite of THIS batch's partition, so
    a replay replaces any partial write instead of duplicating rows.
    """
    sigs = minhash_signatures(
        batch,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        shingle_n=shingle_n,
        hash_fn=hash_fn,
    ).persist()  # consumed by intra-join (2 sides), cross-join, store append
    store = _read_store(spark, store_path).filter(
        F.col("ingest_batch") < F.lit(batch_id)
    )
    decisions = dedup_microbatch(
        sigs, store, est_jaccard_threshold, bands=bands, id_col=id_col
    )
    sink_fn(decisions, batch_id)
    # store write AFTER deciding: it must hold strictly-earlier docs
    sigs.withColumn("ingest_batch", F.lit(batch_id)).write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "dynamic").partitionBy(
        "ingest_batch"
    ).parquet(store_path)
    sigs.unpersist()


def run_incremental_near_dedup(
    spark: SparkSession,
    doc_stream: DataFrame,
    store_path: str,
    sink: Callable[[DataFrame, int], None] | str,
    est_jaccard_threshold: float = 0.5,
    num_hashes: int = 64,
    shingle_n: int = 2,
    bands: int = 16,
    hash_fn: str = "crc32",
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
):
    """Start a foreachBatch streaming query deduplicating ``doc_stream``.

    ``sink`` receives (decisions_df, batch_id) — decisions carry every
    batch doc with its ``is_dup`` flag — or a parquet path for an
    append-only sink. Returns the StreamingQuery (caller awaits)."""
    sink_fn = parquet_decisions_sink(sink) if isinstance(sink, str) else sink

    def process(batch: DataFrame, batch_id: int) -> None:
        process_dedup_batch(
            spark,
            batch,
            batch_id,
            store_path,
            sink_fn,
            est_jaccard_threshold=est_jaccard_threshold,
            num_hashes=num_hashes,
            shingle_n=shingle_n,
            bands=bands,
            hash_fn=hash_fn,
            text_col=text_col,
            id_col=id_col,
        )

    writer = doc_stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
