"""pHash near-dup candidate-volume rehearsal (r13 — the SEMDEDUP_BENCH
discipline applied to the r12 verdict's 'what's wrong' #1).

What it proves, with numbers, on a synthesized hash corpus with planted
near-duplicates:

* the 64-bit hash at d=10 (the OLD r12 default) is all-pairs in
  disguise: 11 bands of 5-6 bits emit ~0.086·N² pre-filter candidates
  on uniform hashes — the volume guard REFUSES it at any real corpus
  size, and this tool records the measured volume and the refusal;
* the corrected defaults are corpus-scale: 64-bit d=3 (16-bit bands,
  ~2^-15·N² per band) and 256-bit d=10 (23-24-bit bands, ~2^-24·N² per
  band) both run with measured candidate volumes ~linear in N at these
  corpus sizes, with EXACT recall of every planted near-dup (pigeonhole
  — recall printed, must be 1.0);
* the guard's estimate equals the true pre-filter join volume (it is
  computed from the same band buckets the join shuffles on).

The corpus is synthesized in-plan from ``spark.range`` — 64-bit words
are xxhash64 projections, planted dups re-derive their base hash by
expression and xor a ≤ max_distance-bit flip mask — zero input files,
deterministic across partitionings.

Usage: python tools/bench_phash.py [mult]
  mult: corpus = 100k hashes × mult (+2% planted near-dups)
Prints ONE JSON line:
{"metric": "phash_rehearsal", "n": N, "planted": K, "configs": {
  "h64_d10": {"candidates": C, "refused": true, ...},
  "h64_d3":  {"candidates": C, "wall_sec": s, "pairs": P, "recall": 1.0},
  "h256_d10":{"candidates": C, "wall_sec": s, "pairs": P, "recall": 1.0}}}
"""

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F

from person_linkage_case_study_spark.multimodal.phash import phash_near_dups

# flip masks per planted-distance j: j spread-out bit positions inside
# one 64-bit word (positions chosen to cross the d=3 16-bit band seams)
_POSITIONS = [3, 17, 33, 49, 9, 25, 41, 57, 13, 29]


def _mask(j: int) -> int:
    m = 0
    for p in _POSITIONS[:j]:
        m |= 1 << p
    return m


def build_corpus(spark, n: int, k: int, nwords: int, d_max: int):
    """(media_id, phash) frame: n uniform hashes + k planted near-dups.
    Planted row n+i re-derives base hash i and xors a (i % (d_max+1))-bit
    mask into word (i % nwords) — true distance ≤ d_max, exact pair
    (i, n+i) expected from the banded join."""
    base = spark.range(n + k).select(F.col("id").alias("media_id"))
    src = F.when(F.col("media_id") < n, F.col("media_id")).otherwise(
        F.col("media_id") - n
    )
    j = (F.col("media_id") - n) % (d_max + 1)
    masks = F.array(*[F.lit(_mask(x)) for x in range(d_max + 1)])
    flip_word = (F.col("media_id") - n) % nwords
    words = []
    for w in range(nwords):
        word = F.xxhash64(src, F.lit(w))
        flipped = F.when(
            (F.col("media_id") >= n) & (flip_word == w),
            word.bitwiseXOR(F.element_at(masks, (j + 1).cast("int"))),
        ).otherwise(word)
        words.append(flipped)
    h = F.array(*words) if nwords > 1 else words[0]
    return base.select("media_id", h.alias("phash"))


def run_config(spark, n: int, k: int, nwords: int, d: int, ceiling: float):
    hashes = build_corpus(spark, n, k, nwords, d).cache()
    hashes.count()
    out = {}
    t0 = time.time()
    try:
        pairs = phash_near_dups(
            hashes, max_distance=d, max_candidate_pairs=ceiling
        )
        # measured volume (same aggregation the guard ran): rerun with
        # guard off for the record, then execute the join
        found = (
            pairs.join(
                spark.range(k).select(
                    (F.col("id")).alias("id_a"), (F.col("id") + n).alias("id_b")
                ),
                ["id_a", "id_b"],
            ).count()
        )
        out["pairs"] = pairs.count()
        out["recall"] = round(found / k, 6)
        out["wall_sec"] = round(time.time() - t0, 2)
        out["refused"] = False
    except ValueError as e:
        out["refused"] = True
        out["error_head"] = str(e)[:120]
    # the exact pre-filter volume (the guard's arithmetic), recorded
    # even for refused configs — the headline number of this rehearsal
    out["candidates"] = _volume(hashes, d)
    hashes.unpersist()
    return out


def _volume(hashes, d: int) -> float:
    """The guard's Σ C(bucket,2) pre-filter volume, computed standalone
    with the same band-key expressions the join uses."""
    from person_linkage_case_study_spark.multimodal import phash as ph
    from pyspark.sql import types as T

    is_array = isinstance(hashes.schema["phash"].dataType, T.ArrayType)
    words = (
        hashes.withColumn("__w", F.col("phash"))
        if is_array
        else hashes.withColumn("__w", F.array(F.col("phash")))
    )
    nbits = 64 * (4 if is_array else 1)
    nbands = d + 1
    base, extra = divmod(nbits, nbands)
    bands, offset = [], 0
    for i in range(nbands):
        width = base + (1 if i < extra else 0)
        bands.append(
            F.struct(
                F.lit(i).alias("band_idx"),
                ph._band_key_expr("__w", offset, width).alias("band_key"),
            )
        )
        offset += width
    row = (
        words.select(F.explode(F.array(*bands)).alias("band"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("p"))
        .collect()
    )
    return float(row[0]["p"] or 0.0)


def main():
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n = 100_000 * mult
    k = n // 50
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("bench_phash")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # ceiling sized so h64_d10 (≈0.086·N² ≈ 8.6e8 at mult=1) refuses and
    # the corrected configs (~linear at this N) pass — the production
    # default 1e10 would let mult=1 h64_d10 through; the point here is
    # the RELATIVE volumes, so pin the ceiling to 100·N
    ceiling = 100.0 * n
    configs = {
        "h64_d10": (1, 10),
        "h64_d3": (1, 3),
        "h256_d10": (4, 10),
    }
    results = {}
    for name, (nwords, d) in configs.items():
        results[name] = run_config(spark, n, k, nwords, d, ceiling)
    # r14 capstone rung: edges -> connected components -> canonical
    # survivor on the h64_d3 corpus. Every planted pair (i, n+i) is one
    # 2-image cluster keeping min id = i, so removed == planted exactly
    # (uniform 64-bit hashes make accidental d<=3 collisions vanishingly
    # rare; any would surface as removed != planted).
    from person_linkage_case_study_spark.multimodal.phash import (
        canonical_images,
    )

    hashes = build_corpus(spark, n, k, 1, 3).cache()
    hashes.count()
    t0 = time.time()
    canon = canonical_images(
        hashes, max_distance=3, max_candidate_pairs=ceiling
    ).cache()
    paired = canon.count()
    clusters = canon.select("canonical_id").distinct().count()
    wall = round(time.time() - t0, 2)
    results["capstone_h64_d3"] = {
        "wall_sec": wall,
        "paired_images": paired,
        "clusters": clusters,
        "removed": paired - clusters,
        "removed_equals_planted": (paired - clusters) == k,
    }
    canon.unpersist()
    hashes.unpersist()
    print(
        json.dumps(
            {
                "metric": "phash_rehearsal",
                "n": n,
                "planted": k,
                "ceiling": ceiling,
                "configs": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
