"""Incremental near-dup suppression: chunked streaming == single batch.

The invariance argument (store ALL signatures, decide on arrival order
only) is in streaming/incremental_dedup.py's module docstring; these
tests pin it on a corpus with a transitive near-dup chain A≈B≈C where
A and C do NOT collide directly — the case greedy survivor-only stores
get wrong.
"""

import pytest
from pyspark.sql import functions as F

from person_linkage_case_study_spark.streaming.incremental_dedup import (
    run_incremental_near_dedup,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden today"
)


def _docs():
    # 1≈2 (one word), 2≈3 (two words, overlapping 1's change) — a chain;
    # 4, 5, 6 unique; 7 exact dup of 4 arriving much later
    return [
        (1, BASE),
        (2, BASE.replace("lazy", "sleepy")),
        (3, BASE.replace("lazy", "sleepy").replace("warm", "cold")),
        (4, "completely different text about spark dataframes and shuffles"),
        (5, "otro documento totalmente distinto sobre flores y montañas"),
        (6, "yet another unique piece of text mentioning parquet and arrow"),
        (7, "completely different text about spark dataframes and shuffles"),
    ]


def _run(spark, tmp, chunks):
    """Write id-ordered chunks as separate files, stream 1 file/trigger."""
    src = tmp / "src"
    src.mkdir()
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(src / f"chunk_{i:03d}.parquet"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    sink = str(tmp / "decisions")
    q = run_incremental_near_dedup(
        spark,
        stream,
        store_path=str(tmp / "store"),
        sink=sink,
        est_jaccard_threshold=0.5,
        shingle_n=2,
        checkpoint_dir=str(tmp / "ckpt"),
    )
    q.awaitTermination(120)
    return {
        r["doc_id"]: r["is_dup"] for r in spark.read.parquet(sink).collect()
    }


@pytest.fixture(scope="module")
def single_batch_result(spark, tmp_path_factory):
    return _run(spark, tmp_path_factory.mktemp("dedup_1chunk"), [_docs()])


def test_known_dups_flagged(single_batch_result):
    d = single_batch_result
    assert len(d) == 7
    assert d[1] is False  # first of the chain survives
    assert d[2] is True  # ≈1
    assert d[3] is True  # ≈2 (the transitive case)
    assert d[7] is True  # exact dup of 4
    assert d[4] is False and d[5] is False and d[6] is False


def test_chunking_invariance(spark, tmp_path_factory, single_batch_result):
    docs = _docs()
    chunked = _run(
        spark,
        tmp_path_factory.mktemp("dedup_3chunk"),
        [docs[:2], docs[2:5], docs[5:]],
    )
    assert chunked == single_batch_result


def test_store_accumulates_all(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dedup_store")
    _run(spark, tmp, [_docs()[:3], _docs()[3:]])
    store = spark.read.parquet(str(tmp / "store"))
    assert store.count() == 7  # dups stored too — they witness later docs
    assert store.select(F.size("signature")).distinct().collect()[0][0] == 64


def test_replay_idempotent(spark, tmp_path_factory):
    """foreachBatch replay contract: re-running a batch with the same
    batch_id (the restart-after-mid-batch-failure case, where the failed
    attempt may already have written this batch's store partition) must
    produce the SAME decisions and store — no self-matching, no
    duplicated rows (r2 ADVICE)."""
    from person_linkage_case_study_spark.streaming.incremental_dedup import (
        parquet_decisions_sink,
        process_dedup_batch,
    )

    tmp = tmp_path_factory.mktemp("dedup_replay")
    docs = _docs()
    store, sink = str(tmp / "store"), str(tmp / "decisions")
    sink_fn = parquet_decisions_sink(sink)
    b0 = spark.createDataFrame(docs[:3], "doc_id long, text string")
    b1 = spark.createDataFrame(docs[3:], "doc_id long, text string")

    def snapshot():
        dec = {
            r["doc_id"]: r["is_dup"]
            for r in spark.read.parquet(sink).collect()
        }
        st = spark.read.parquet(store)
        return dec, st.count(), {r["doc_id"] for r in st.select("doc_id").collect()}

    process_dedup_batch(spark, b0, 0, store, sink_fn, shingle_n=2)
    process_dedup_batch(spark, b1, 1, store, sink_fn, shingle_n=2)
    first = snapshot()
    assert first[1] == 7 and len(first[0]) == 7
    # worst-case replay: batch 1's store partition is fully present
    process_dedup_batch(spark, b1, 1, store, sink_fn, shingle_n=2)
    assert snapshot() == first
    # doc 7 must still be flagged (dup of 4, batch 0 history), and the
    # unique batch-1 docs must NOT have been self-matched on replay
    dec = snapshot()[0]
    assert dec[7] is True and dec[4] is False and dec[5] is False


def test_read_store_propagates_non_missing_errors(spark, tmp_path_factory):
    """Only the missing-path case degrades to an empty store; a corrupt
    store file must raise, not silently disable cross-batch dedup."""
    import pytest as _pytest

    from person_linkage_case_study_spark.streaming.incremental_dedup import (
        _read_store,
    )

    tmp = tmp_path_factory.mktemp("dedup_store_err")
    # missing path → empty store
    assert _read_store(spark, str(tmp / "nope")).count() == 0
    # corrupt file → error surfaces at read/execute time
    bad = tmp / "bad"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"this is not a parquet file")
    with _pytest.raises(Exception):
        _read_store(spark, str(bad)).count()
