"""Per-phase wall profiling of dedup_near_exact_pipeline (r15).

Times each phase of the pipeline separately with noop sinks and labeled
jobs, so the optimization round can see where the entry's seconds go.
Usage: python tools/profile_dedup.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from person_linkage_case_study_spark.session import get_spark


def t(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.3f}s" + (f" [{out}]" if out is not None else ""))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-dedup")
    sc = spark.sparkContext

    from person_linkage_case_study_spark.dedup.minhash import (
        minhash_candidate_pairs,
        minhash_signatures,
        pick_bands,
    )
    from person_linkage_case_study_spark.dedup.ngram import ngram_jaccard_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    d.count()  # warm scan

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # vocab murmur3 collision check (fused-path precondition)
    vocab = (
        d.select(F.explode(F.array_distinct(
            F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != "")
        )).alias("tok")).distinct()
    )
    n_vocab, n_hash = t(
        "vocab+hash distinct",
        lambda: vocab.agg(
            F.count(F.lit(1)), F.countDistinct(F.hash("tok"))
        ).collect()[0][0:2],
    )
    print(f"vocab={n_vocab} distinct_hashes={n_hash}")

    for rep in range(2):
        sc.setJobDescription("phase: signatures")
        sigs = minhash_signatures(d, shingle_n=1)
        t(f"[{rep}] signatures noop", lambda: noop(sigs))

        sc.setJobDescription("phase: candidates")
        sigs2 = minhash_signatures(d, shingle_n=1)
        cands = minhash_candidate_pairs(
            sigs2,
            bands=pick_bands(0.8, num_hashes=64, min_recall=1 - 1e-9),
            est_jaccard_threshold=None,
        )
        t(f"[{rep}] cand count", lambda: cands.count())

        sc.setJobDescription("phase: full entry")
        sigs3 = minhash_signatures(d, shingle_n=1)
        cands3 = minhash_candidate_pairs(
            sigs3,
            bands=pick_bands(0.8, num_hashes=64, min_recall=1 - 1e-9),
            est_jaccard_threshold=None,
        )
        full = ngram_jaccard_pairs(d, candidates=cands3, threshold=0.8)
        t(f"[{rep}] full noop", lambda: noop(full))
        sc.setJobDescription(None)


if __name__ == "__main__":
    main()
