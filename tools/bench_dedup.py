"""Dedup-at-scale rehearsal: MinHash LSH → exact Jaccard on a REALISTIC corpus.

The catalog's documents table is adversarial for LSH (small shared
vocabulary → nearly every pair is genuinely similar; SCALING.md "worst-case
pair density"). This rehearsal measures the other regime — the one a 100 TB
web corpus actually lives in: a wide vocabulary (1M content words) with a
Zipf-ish stopword head (30% of tokens from a 100-word pool), so random doc
pairs sit at unigram-set J ≈ 0.06 while planted near-dups (3% token
substitution) sit at J ≈ 0.94.

What it proves, with numbers:

* candidate volume is ~LINEAR in corpus size (spurious collisions only from
  the LSH false-positive floor), not quadratic — the property that makes
  near-dedup feasible at 100 TB;
* recall of planted near-dups at threshold 0.8 is 100% (banding math:
  r=4 rows/band × 32 bands → P(miss at J=0.94) ≈ 1e-13);
* the r=2 default that suits J≈0.5 searches is the WRONG knob here: at
  r=2 the J≈0.06 floor collides ~11% of ALL pairs (measured in dev) —
  num_hashes=128 / bands=32 (r=4) drops the floor to ~4e-4 while keeping
  the high-J recall guarantee. Choosing r by threshold is the documented
  operating procedure (SCALING.md dedup section).

Corpus is synthesized in-plan from ``spark.range`` — pure xxhash64
projections, zero shuffle, deterministic across partitionings/retries, so
the rehearsal scales to any ``mult`` without input files.

Usage: python tools/bench_dedup.py [mult] [threshold] [chunks] [bands]
  mult: corpus = 100k docs × mult (+5% planted near-dups)
  chunks: >1 scores the candidate set in that many bounded sequential
          passes (SCALING.md dedup mitigation 3) — live shuffle scratch
          ~1/chunks of the one-shot footprint, at the cost of re-running
          the tokenize/encode prologue per pass
  bands: LSH bands over the 128 minhashes (default 32 → r=4). The r
         knob is the PRIMARY floor control: the random-pair (J≈0.06)
         collision floor is ~n² per band space and doubles the per-doc
         candidate rate each corpus doubling at r=4 (measured
         51/103/204 at mults 4/8/16); bands=16 → r=8 pushes the floor
         to ~1e-9 of pairs while keeping P(miss at J≈0.94) ≈ 3e-7
Prints ONE JSON line:
{"metric": "dedup_rehearsal_wall", "value": sec, "docs": N,
 "candidates": C, "pairs": P, "planted": K, "recall": r, "mult": m}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from person_linkage_case_study_spark.dedup.minhash import (
    minhash_candidate_pairs,
    minhash_signatures,
)
from person_linkage_case_study_spark.dedup.ngram import ngram_jaccard_pairs
from person_linkage_case_study_spark.session import get_spark

BASE_DOCS = 100_000
DUP_EVERY = 20          # 5% of base docs get a planted near-dup
SUB_EVERY = 33          # ~3% of the dup's tokens substituted → J ≈ 0.94
STOP_POOL = 100         # stopword head
VOCAB = 1_000_000       # content-word vocabulary


def synthesize(spark: SparkSession, n_base: int) -> DataFrame:
    """(doc_id, text): n_base originals + one near-dup per DUP_EVERY-th
    original (dup doc_id = base doc_id + n_base). All columns are pure
    hash projections — regenerating any partition yields identical rows."""
    base = spark.range(n_base).select(F.col("id").alias("doc_id"))
    dups = (
        spark.range(n_base)
        .filter(F.xxhash64(F.lit("dup?"), F.col("id")) % DUP_EVERY == 0)
        .select((F.col("id") + n_base).alias("doc_id"))
    )
    docs = base.unionByName(dups)
    eff = F.when(F.col("doc_id") < n_base, F.col("doc_id")).otherwise(
        F.col("doc_id") - n_base
    )
    is_dup = F.col("doc_id") >= n_base
    n_tok = (F.abs(F.xxhash64(F.lit("len"), eff)) % 80 + 100).cast("int")

    def token(i):
        # 30% stopword head, 70% wide-vocab content word
        h = F.xxhash64(F.lit("tok"), eff, i)
        stop = F.abs(F.xxhash64(F.lit("stop?"), eff, i)) % 10 < 3
        word = F.when(
            stop, F.concat(F.lit("the"), (F.abs(h) % STOP_POOL).cast("string"))
        ).otherwise(F.concat(F.lit("w"), (F.abs(h) % VOCAB).cast("string")))
        # planted near-dup: substitute ~3% of content positions
        subbed = F.abs(F.xxhash64(F.lit("sub?"), eff, i)) % SUB_EVERY == 0
        return F.when(
            is_dup & subbed & ~stop,
            F.concat(F.lit("x"), (F.abs(h) % VOCAB).cast("string")),
        ).otherwise(word)

    return docs.select(
        "doc_id",
        F.array_join(
            F.transform(F.sequence(F.lit(0), n_tok - 1), token), " "
        ).alias("text"),
    )


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.8
    chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    bands = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    n_base = BASE_DOCS * mult
    # size the session with the data, the way a cluster submit would
    # (same pattern as tools/bench_linkage.py): at mult 16 an
    # AQE-converted broadcast build overflowed the standard 8g driver
    # ("Not enough memory to build and broadcast"), and more reducers
    # keep per-task scoring state shrinking as the corpus grows
    heap_g = min(64, max(8, mult))
    shuffle_parts = max(32, 2 * mult)
    extra = {
        "spark.driver.memory": f"{heap_g}g",
        "spark.sql.shuffle.partitions": str(shuffle_parts),
    }
    if mult >= 16:
        # past ~1.7M docs the banding self-join's size estimate tempts the
        # planner into broadcasting a signatures-sized table that no longer
        # fits any driver ("Not enough memory to build and broadcast",
        # measured at mult 16 even with a 16g heap) — there are no small
        # dims in this rehearsal, so auto-broadcast buys nothing here
        extra["spark.sql.autoBroadcastJoinThreshold"] = "-1"
    spark = get_spark(f"dedup-rehearsal-{mult}x", extra_conf=extra)

    t0 = time.time()
    docs = synthesize(spark, n_base)
    # 128 hashes / 32 bands → r=4: keeps P(miss) ~1e-13 at planted J≈0.94
    # while crushing the random-pair (J≈0.06) collision floor to ~4e-4.
    sigs = minhash_signatures(docs, shingle_n=1, num_hashes=128)
    # persist BEFORE counting: only the signatures are persisted inside
    # minhash_candidate_pairs, so without this the band self-join +
    # dropDuplicates would re-execute inside ngram_jaccard_pairs and the
    # exact_scoring stage wall would include candidate recomputation
    cands = minhash_candidate_pairs(
        sigs, bands=bands, est_jaccard_threshold=None
    ).persist()
    n_cands = cands.count()
    t_cand = time.time()
    if chunks <= 1:
        pairs = ngram_jaccard_pairs(docs, candidates=cands, threshold=threshold)
        pairs = pairs.persist()
        n_pairs = pairs.count()
    else:
        # SCALING.md dedup mitigation (3): score the candidate set in
        # `chunks` bounded SEQUENTIAL passes so live shuffle scratch is
        # ~1/chunks of the one-shot footprint — the one-box fallback when
        # "more executors" (the cluster answer: aggregate scratch scales
        # linearly with the fleet) isn't available. Each pass writes its
        # narrow surviving pairs to parquet; shuffle files of finished
        # passes are released between jobs (System.gc() nudges the
        # ContextCleaner, whose file cleanup is GC-triggered).
        import tempfile

        tmp = tempfile.mkdtemp(prefix="dedup_chunks_")
        for k in range(chunks):
            sub = cands.filter(
                F.pmod(F.xxhash64("doc_id_l", "doc_id_r"), F.lit(chunks)) == k
            )
            ngram_jaccard_pairs(
                docs, candidates=sub, threshold=threshold
            ).write.mode("append").parquet(f"{tmp}/pairs")
            spark.sparkContext._jvm.System.gc()
        pairs = spark.read.parquet(f"{tmp}/pairs").persist()
        n_pairs = pairs.count()
    t_score = time.time()
    cands.unpersist()

    planted = (
        docs.filter(F.col("doc_id") >= n_base)
        .select(
            (F.col("doc_id") - n_base).alias("doc_id_l"),
            F.col("doc_id").alias("doc_id_r"),
        )
    )
    n_planted = planted.count()
    n_found = planted.join(
        pairs, ["doc_id_l", "doc_id_r"], "left_semi"
    ).count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "dedup_rehearsal_wall",
                "value": round(wall, 1),
                "unit": "sec",
                "docs": n_base + n_planted,
                "candidates": n_cands,
                "pairs": n_pairs,
                "planted": n_planted,
                "recall": round(n_found / max(1, n_planted), 6),
                "stage_walls": {
                    "candidates": round(t_cand - t0, 1),
                    "exact_scoring": round(t_score - t_cand, 1),
                },
                "mult": mult,
                "threshold": threshold,
                "score_chunks": chunks,
                "bands": bands,
            }
        )
    )


if __name__ == "__main__":
    main()
