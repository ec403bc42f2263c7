"""r16 optimization-round profiling: the three VERDICT targets.

Usage: python tools/profile_r16.py <which> [sf_dir]
  which ∈ {minhash, dedup, semdedup}

- minhash: times the signature kernel + full minhash_near_dups entry at a
  ladder of spread partition counts (the r15 anti-scaling finding: ~500
  docs repartitioned to defaultParallelism=32 python tasks).
- dedup: per-phase walls of dedup_near_exact_pipeline (construct vs final
  action) — the §2.6 serialized-driver-jobs target.
- semdedup: construct-time (plan build) vs exec wall of
  semantic_dedup_embeddings, with a py4j round-trip count of the
  construct phase.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from person_linkage_case_study_spark import queries as catalog
from person_linkage_case_study_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def py4j_counter():
    """Wrap the gateway client's send_command to count driver round trips."""
    import py4j.clientserver as cs

    counts = {"n": 0}
    orig = cs.ClientServerConnection.send_command

    def counted(self, command):
        counts["n"] += 1
        return orig(self, command)

    cs.ClientServerConnection.send_command = counted
    return counts, lambda: setattr(cs.ClientServerConnection, "send_command", orig)


def run_minhash(sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from person_linkage_case_study_spark.dedup.minhash import (
        minhash_candidate_pairs,
        minhash_signatures,
    )

    spark = get_spark("profile-r16-minhash")
    sc = spark.sparkContext
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n = d.count()
    print(f"docs={n} defaultParallelism={sc.defaultParallelism}")

    # warm the kernel path once
    noop(minhash_signatures(d, shingle_n=2, hash_fn="md5"))

    # ladder: manually pre-spread the input, then call with tokens_col to
    # skip the internal repartition — isolates spread-width effect.
    from person_linkage_case_study_spark.textops.analysis import tokens

    for parts in (1, 2, 4, 8, 16, 32):
        walls = []
        for _ in range(3):
            sc.setJobDescription(f"sig spread={parts}")
            t0 = time.time()
            spread = (
                d.filter(F.col("text").isNotNull())
                .repartition(parts)
                .select(F.col("doc_id"), tokens(F.col("text")).alias("__tk"))
            )
            sigs = minhash_signatures(
                spread, id_col="doc_id", shingle_n=2, hash_fn="md5",
                tokens_col="__tk",
            )
            noop(sigs)
            walls.append(time.time() - t0)
        print(f"sig parts={parts:3d}  min {min(walls):.3f}s  {[round(w,3) for w in walls]}")

    # full entry at current HEAD for reference
    walls = []
    for _ in range(3):
        sc.setJobDescription("minhash_near_dups full")
        t0 = time.time()
        noop(catalog.minhash_near_dups(spark, sf_dir))
        walls.append(time.time() - t0)
    print(f"entry full  min {min(walls):.3f}s  {[round(w,3) for w in walls]}")


def run_dedup(sf_dir: str) -> None:
    spark = get_spark("profile-r16-dedup")
    sc = spark.sparkContext
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm scan

    for rep in range(3):
        sc.setJobDescription(f"dedup construct rep{rep}")
        t0 = time.time()
        df = catalog.dedup_near_exact_pipeline(spark, sf_dir)
        t1 = time.time()
        sc.setJobDescription(f"dedup action rep{rep}")
        noop(df)
        t2 = time.time()
        print(f"[{rep}] construct {t1-t0:.3f}s  action {t2-t1:.3f}s  total {t2-t0:.3f}s")
    sc.setJobDescription(None)


def run_semdedup(sf_dir: str) -> None:
    spark = get_spark("profile-r16-semdedup")
    sc = spark.sparkContext
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()  # warm scan

    # warm plan/JIT once
    noop(catalog.semantic_dedup_embeddings(spark, sf_dir))

    for rep in range(3):
        counts, restore = py4j_counter()
        sc.setJobDescription(f"semdedup construct rep{rep}")
        t0 = time.time()
        df = catalog.semantic_dedup_embeddings(spark, sf_dir)
        t1 = time.time()
        n_construct = counts["n"]
        sc.setJobDescription(f"semdedup action rep{rep}")
        noop(df)
        t2 = time.time()
        restore()
        print(
            f"[{rep}] construct {t1-t0:.3f}s ({n_construct} py4j)  "
            f"action {t2-t1:.3f}s  total {t2-t0:.3f}s"
        )
    sc.setJobDescription(None)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "dedup"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    {"minhash": run_minhash, "dedup": run_dedup, "semdedup": run_semdedup}[which](sf_dir)


if __name__ == "__main__":
    main()
