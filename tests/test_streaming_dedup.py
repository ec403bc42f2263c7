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
