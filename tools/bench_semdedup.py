"""Semantic-dedup-at-scale rehearsal: seeded-LSH SemDeDup over a
synthesized embedding corpus with planted near-duplicates.

What it proves, with numbers:

* candidate volume stays ~LINEAR in corpus size when ``n_planes`` scales
  with log2(n) (buckets/table ~= n / target_bucket, so Σ|bucket|² ≈
  n × target_bucket per table) — the knob a 100 TB corpus turns, exactly
  like bands/rows for MinHash (SCALING.md dedup section);
* recall of planted near-dups (cosine ≈ 0.999) across ``n_tables``
  OR-amplified tables: per-plane flip prob at angle θ is θ/π ≈ 0.008, so
  a 14-plane table matches with p ≈ 0.89 and missing all 4 tables is
  ~1.4e-4 — the printed recall measures this directly;
* false drops of the mutually near-orthogonal base vectors are ~0 at
  threshold 0.9 (dim-64 random cosine std ≈ 0.125).

The corpus is synthesized in-plan from ``spark.range`` — per-dimension
values are pure xxhash64 projections (uniform in [-1, 1]), planted dups
re-derive their base vector by expression and add a 0.02-amplitude hash
noise — zero shuffle, no input files, deterministic across
partitionings/retries, any ``mult``.

Usage: python tools/bench_semdedup.py [mult] [threshold] [target_bucket] [scorer]
  mult: corpus = 100k vectors × mult (+5% planted near-dups)
  target_bucket: 0 (default) = the operator's own auto-scaled
  ``n_planes`` (``auto_planes``, occupancy 64) — i.e. what a caller
  gets with NO knobs; >0 = manual ceil(log2(n/target_bucket)) planes
  scorer: "join" (default; candidate DISTINCT + vector rehydration) or
  "bucket" (applyInPandas per LSH bucket — vectors ship n_tables copies
  instead of once per pair; no candidate shuffle at all, so the
  "candidates" stage wall is folded into scoring)
Prints ONE JSON line:
{"metric": "semdedup_rehearsal_wall", "value": sec, "vectors": N,
 "candidates": C, "planted": K, "dropped_planted": D, "recall": r,
 "false_drops": F, "n_planes": p, "mult": m}

MEGA-CLUSTER mode (r7 — the occupancy-guard rehearsal):

  python tools/bench_semdedup.py mega [mult] [groups] [copies] [variant]

plants a boilerplate mega-cluster — ``groups`` mutually NEAR-identical
group vectors (cosine ≈ 0.9999 across groups), each repeated ``copies``
times EXACTLY (byte-identical doubles, the same-embedding-from-same-
boilerplate shape of a web crawl) — into a 100k×mult base corpus, and
runs ``semantic_dedup`` end-to-end under one ``variant``:

  default            zero-knob path: exact-dup pre-collapse + guarded
                     bucket scorer (the r7 production default)
  ceiling-only       collapse OFF, bucket scorer WITH the max_bucket
                     grid-split (isolates the ceiling's contribution)
  bucket-unguarded   collapse OFF, max_bucket effectively infinite —
                     the r6 default, whose mega-bucket O(|b|²) runs in
                     ONE task per table (the straggler cliff)
  join               collapse OFF, join scorer — the mega cluster
                     materializes its full quadratic id-pair stream

Every variant computes the SAME decisions (pre-collapse and grid-split
are work-shape changes, not answer changes) — the JSON carries an
order-insensitive xxhash64 checksum over (id, kept, dup_of) to prove
it across runs. Expected: all mega rows except the globally smallest
id are dropped; ~zero false drops of base vectors.

BLOCK_COL mode (r8 — the routing-fix rehearsal):

  python tools/bench_semdedup.py blockcol [mult] [block_rows] [variant]

brings caller-supplied clustering (``block_col``): a 100k×mult base
corpus in ~64-row hash blocks plus ONE planted ``block_rows``-row block
of DISTINCT near-identical vectors (0.005-amplitude per-row noise,
mutual cosine ≈ 0.99997 — collapse_exact cannot help, the sub-threshold-
mega regime's harder sibling with a full quadratic edge set). Variants:

  default       the r8 routing: block_col → guarded bucket scorer
                (max_bucket grid-split bounds the planted block)
  join-routed   the r7 routing: block_col → join scorer, whose id-pair
                stream is O(|block|²) rows BEFORE the DISTINCT can
                shrink it (the plan that DNF'd >80 GB of spill on the
                r7 mega-cluster)

Same decision checksum across variants when both complete.
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from person_linkage_case_study_spark.session import get_spark
from person_linkage_case_study_spark.similarity.semdedup import (
    auto_planes,
    eps_similarity_edges,
    eps_similarity_edges_bucketed,
    semdedup_candidates,
)

DIM = 64
SEED = 1234


def _unit_hash(col_expr, tag: str):
    """Deterministic uniform in [-1, 1] from (expr, dim-index, tag)."""
    return (
        F.pmod(
            F.xxhash64(col_expr, F.lit(tag), F.lit(SEED)), F.lit(2_000_001)
        ).cast("double")
        / 1_000_000.0
        - 1.0
    )


def _vec(id_expr, tag: str):
    """array<double> of DIM deterministic uniforms for a (possibly
    derived) id expression — pure projection, zero shuffle."""
    return F.array(
        *[
            _unit_hash(F.concat(id_expr.cast("string"), F.lit(f"|{d}")), tag)
            for d in range(DIM)
        ]
    )


def synthesize(spark: SparkSession, n_base: int) -> DataFrame:
    """n_base random vectors (ids 0..n_base-1) + 5% planted near-dups
    (ids n_base..: vec = base_vec(id - n_base) + 0.02 × noise)."""
    n_planted = n_base // 20
    base = spark.range(n_base).select(
        F.col("id").alias("vec_id"), _vec(F.col("id"), "v").alias("embedding")
    )
    src = F.col("id") - F.lit(n_base)  # planted i duplicates base row i
    planted = spark.range(n_base, n_base + n_planted).select(
        F.col("id").alias("vec_id"),
        F.zip_with(
            _vec(src, "v"),
            _vec(F.col("id"), "noise"),
            lambda v, n: v + 0.02 * n,
        ).alias("embedding"),
    )
    return base.unionByName(planted)


def synthesize_mega(spark: SparkSession, n_base: int, groups: int, copies: int):
    """Base corpus + a planted mega-cluster: ``groups`` near-identical
    group vectors (one anchor + 0.005-amplitude per-group hash noise),
    each repeated ``copies`` times byte-identically (same deterministic
    expression ⇒ same doubles). Mega ids start at ``n_base``."""
    base = spark.range(n_base).select(
        F.col("id").alias("vec_id"), _vec(F.col("id"), "v").alias("embedding")
    )
    grp = F.floor((F.col("id") - F.lit(n_base)) / F.lit(copies))
    mega = spark.range(n_base, n_base + groups * copies).select(
        F.col("id").alias("vec_id"),
        F.zip_with(
            _vec(F.lit(-1), "mega_anchor"),
            _vec(grp, "mega_noise"),
            lambda v, n: v + 0.005 * n,
        ).alias("embedding"),
    )
    return base.unionByName(mega)


def main_mega() -> None:
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    groups = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    copies = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    variant = sys.argv[5] if len(sys.argv) > 5 else "default"
    # threshold picks the regime: 0.9 (default) makes the whole mega
    # cluster mutual EDGES (quadratic edge set — the exact-dup collapse
    # is the guard that matters); with copies=1 and threshold 0.99999
    # the distinct near-identical members (mutual cosine ≈ 0.999975)
    # still share buckets but are NOT edges — quadratic SCORING with an
    # empty edge set, the regime that isolates the max_bucket grid-split
    threshold = float(sys.argv[6]) if len(sys.argv) > 6 else 0.9

    n_base = 100_000 * mult
    mega_n = groups * copies
    heap_g = min(64, max(12, mult))
    spark = get_spark(
        "bench-semdedup-mega",
        extra_conf={
            "spark.driver.memory": f"{heap_g}g",
            "spark.sql.shuffle.partitions": str(32 * max(1, mult // 4)),
        },
    )
    from pyspark import StorageLevel

    from person_linkage_case_study_spark.similarity.semdedup import (
        semantic_dedup,
    )

    corpus = synthesize_mega(spark, n_base, groups, copies).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    corpus.count()

    kw = dict(threshold=threshold, n_tables=4, seed=SEED, quantize=1000.0,
              dim=DIM)
    variants = {
        "default": dict(),
        "ceiling-only": dict(scorer="bucket", collapse_exact=False),
        "bucket-unguarded": dict(
            scorer="bucket", collapse_exact=False, max_bucket=1 << 30
        ),
        "join": dict(scorer="join", collapse_exact=False),
    }
    t0 = time.time()
    out = semantic_dedup(corpus, **kw, **variants[variant])
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~F.col("kept") & (F.col("vec_id") >= n_base)).cast("long")).alias(
            "mega_dropped"
        ),
        F.sum((~F.col("kept") & (F.col("vec_id") < n_base)).cast("long")).alias(
            "false_drops"
        ),
        # order-insensitive decision checksum: identical across variants
        # (bit_xor: overflow-free, rows unique by vec_id so nothing cancels)
        F.expr("bit_xor(xxhash64(vec_id, kept, dup_of))").alias("checksum"),
    ).collect()[0]
    wall = round(time.time() - t0, 1)

    print(json.dumps({
        "metric": "semdedup_megacluster_wall",
        "value": wall,
        "unit": "sec",
        "variant": variant,
        "vectors": int(stats["n"]),
        "mega_rows": mega_n,
        "mega_groups": groups,
        "mega_copies": copies,
        "mega_dropped": int(stats["mega_dropped"]),
        "mega_recall": round(int(stats["mega_dropped"]) / (mega_n - 1), 6),
        "false_drops": int(stats["false_drops"]),
        "decision_checksum": int(stats["checksum"]),
        "threshold": threshold,
        "n_tables": 4,
        "mult": mult,
    }))


def synthesize_blockcol(
    spark: SparkSession, n_base: int, block_rows: int
) -> DataFrame:
    """Base corpus in ~64-row hash blocks (caller-clustering stand-in for
    an IVF cell / k-means assignment) + one planted ``block_rows``-row
    block of DISTINCT near-identical vectors (one anchor, 0.005-amplitude
    per-ROW hash noise — no two rows byte-identical, so collapse_exact
    leaves all of them for the scorer). Planted ids start at n_base."""
    n_blocks = max(1, n_base // 64)
    base = spark.range(n_base).select(
        F.col("id").alias("vec_id"),
        _vec(F.col("id"), "v").alias("embedding"),
        F.pmod(F.xxhash64("id", F.lit("blk"), F.lit(SEED)), F.lit(n_blocks))
        .cast("string")
        .alias("blk"),
    )
    hot = spark.range(n_base, n_base + block_rows).select(
        F.col("id").alias("vec_id"),
        F.zip_with(
            _vec(F.lit(-1), "hot_anchor"),
            _vec(F.col("id"), "hot_noise"),
            lambda v, n: v + 0.005 * n,
        ).alias("embedding"),
        F.lit("HOT").alias("blk"),
    )
    return base.unionByName(hot)


def main_blockcol() -> None:
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    block_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
    variant = sys.argv[4] if len(sys.argv) > 4 else "default"
    threshold = float(sys.argv[5]) if len(sys.argv) > 5 else 0.9

    n_base = 100_000 * mult
    heap_g = min(64, max(12, mult))
    spark = get_spark(
        "bench-semdedup-blockcol",
        extra_conf={
            "spark.driver.memory": f"{heap_g}g",
            "spark.sql.shuffle.partitions": str(32 * max(1, mult // 4)),
        },
    )
    from pyspark import StorageLevel

    from person_linkage_case_study_spark.similarity.semdedup import (
        semantic_dedup,
    )

    corpus = synthesize_blockcol(spark, n_base, block_rows).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    corpus.count()

    variants = {
        "default": dict(),                  # r8 routing: bucket + grid split
        "join-routed": dict(scorer="join"),  # the r7 block_col routing
    }
    t0 = time.time()
    out = semantic_dedup(
        corpus, threshold=threshold, block_col="blk", dim=DIM,
        **variants[variant],
    )
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~F.col("kept") & (F.col("vec_id") >= n_base)).cast("long")).alias(
            "hot_dropped"
        ),
        F.sum((~F.col("kept") & (F.col("vec_id") < n_base)).cast("long")).alias(
            "base_dropped"
        ),
        F.expr("bit_xor(xxhash64(vec_id, kept, dup_of))").alias("checksum"),
    ).collect()[0]
    wall = round(time.time() - t0, 1)

    print(json.dumps({
        "metric": "semdedup_blockcol_wall",
        "value": wall,
        "unit": "sec",
        "variant": variant,
        "vectors": int(stats["n"]),
        "hot_block_rows": block_rows,
        "hot_dropped": int(stats["hot_dropped"]),
        "hot_recall": round(int(stats["hot_dropped"]) / (block_rows - 1), 6),
        "base_dropped": int(stats["base_dropped"]),
        "decision_checksum": int(stats["checksum"]),
        "threshold": threshold,
        "mult": mult,
    }))


def synthesize_widedim(
    spark: SparkSession, n_base: int, block_rows: int, dim: int
) -> DataFrame:
    """Wide-dim corpus for the r10 cap-derivation rehearsal: ``n_base``
    seeded-numpy vectors in ~64-row hash blocks + one planted
    ``block_rows``-row HOT block of DISTINCT near-identical vectors
    (0.005-amplitude per-row noise — mutual cosine ≈ 1, so at threshold
    0.9 the block is a full quadratic edge set, the exact r8 cliff
    shape). Generated via mapInPandas — a 4096-wide ``F.array``
    projection would blow past codegen's method-size limit — with a
    per-id seed, so the corpus is deterministic and layout-invariant."""
    import numpy as np
    import pandas as pd

    n_blocks = max(1, n_base // 64)

    def gen(it):
        anchor = np.random.default_rng(SEED - 1).uniform(-1.0, 1.0, dim)
        for pdf in it:
            out = []
            for vid in pdf["id"]:
                vid = int(vid)
                rng = np.random.default_rng(SEED + vid)
                if vid < n_base:
                    v = rng.uniform(-1.0, 1.0, dim)
                    blk = str((vid * 2654435761) % n_blocks)
                else:
                    v = anchor + 0.005 * rng.uniform(-1.0, 1.0, dim)
                    blk = "HOT"
                out.append((vid, v.tolist(), blk))
            yield pd.DataFrame(out, columns=["vec_id", "embedding", "blk"])

    return spark.range(n_base + block_rows).mapInPandas(
        gen, "vec_id long, embedding array<double>, blk string"
    )


def main_widedim() -> None:
    """The dim-derived ``max_bucket`` rehearsal, run at the first dim
    where the SHIPPED derivation bites (the A/B at a dim whose derived
    cap equals the r8 constant is a no-op — the r10 docstring made that
    mistake at 4096, and the r11 budget move to 128 MB re-makes it at
    8192). With the 128 MB budget the boundary is 16384: derived cap
    512 (~134 MB input batches, the r11-proven point) vs the ``r8cap``
    variant's forced 1024 (~268 MB batches, approaching the r8 ~400 MB
    cliff). Decisions must be identical either way (cap is a work-shape
    knob); the artifact records whether the old constant merely bloats
    batches at this heap or re-enters the allocator cliff.
    SEMDEDUP_BENCH_r11 measured the PREVIOUS boundary head-to-head at
    dim 8192 — cap 1024 83.0s vs cap 512 205.6s, checksum identical,
    recall 1.0 both — which is the measurement that moved the budget.

    Usage: python tools/bench_semdedup.py widedim [n_base] [block_rows]
           [dim] [variant: derived|r8cap]"""
    n_base = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    block_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 8_000
    dim = int(sys.argv[4]) if len(sys.argv) > 4 else 16384
    variant = sys.argv[5] if len(sys.argv) > 5 else "derived"

    from person_linkage_case_study_spark.similarity.semdedup import (
        derive_max_bucket,
        semantic_dedup,
    )

    spark = get_spark(
        "bench-semdedup-widedim",
        extra_conf={"spark.driver.memory": "16g"},
    )
    from pyspark import StorageLevel

    corpus = synthesize_widedim(spark, n_base, block_rows, dim).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    corpus.count()

    # collapse_exact off: every planted row is DISTINCT (per-row noise),
    # so the collapse would only add a corpus-wide window shuffle of the
    # 32 KB-wide payload for zero collapsed rows
    kw = dict(
        threshold=0.9, block_col="blk", dim=dim, collapse_exact=False
    )
    if variant == "r8cap":
        kw["max_bucket"] = 1024  # the r8 constant, dim-blind
    t0 = time.time()
    out = semantic_dedup(corpus, **kw)
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~F.col("kept") & (F.col("vec_id") >= n_base)).cast("long")).alias(
            "hot_dropped"
        ),
        F.sum((~F.col("kept") & (F.col("vec_id") < n_base)).cast("long")).alias(
            "base_dropped"
        ),
        F.expr("bit_xor(xxhash64(vec_id, kept, dup_of))").alias("checksum"),
    ).collect()[0]
    wall = round(time.time() - t0, 1)

    print(json.dumps({
        "metric": "semdedup_widedim_wall",
        "value": wall,
        "unit": "sec",
        "variant": variant,
        "dim": dim,
        "effective_max_bucket": kw.get("max_bucket", derive_max_bucket(dim)),
        "vectors": n_base + block_rows,
        "hot_block_rows": block_rows,
        "hot_dropped": int(stats["hot_dropped"]),
        "hot_recall": round(int(stats["hot_dropped"]) / (block_rows - 1), 6),
        "base_dropped": int(stats["base_dropped"]),
        "decision_checksum": int(stats["checksum"]),
        "threshold": 0.9,
    }))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "mega":
        main_mega()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "blockcol":
        main_blockcol()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "widedim":
        main_widedim()
        return
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    target_bucket = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    scorer = sys.argv[4] if len(sys.argv) > 4 else "join"

    n_base = 100_000 * mult
    n_planted = n_base // 20
    n = n_base + n_planted
    if target_bucket > 0:
        n_planes = max(4, round(math.log2(n / target_bucket)))
    else:
        # the operator's zero-knob default (computed here only so the
        # JSON line can report it; semdedup_candidates derives the same)
        n_planes = auto_planes(n)

    # size the single-JVM heap with the data, the bench_linkage ladder
    # lesson (SCALING.md 128× rung): mult 64 on the stock 8 g heap dies
    # in a map-side OOM while the box sits near-idle — a CONFIG ceiling.
    # ~mult/4 GiB (floor 8, cap 64) is the local analog of adding
    # executors; a cluster submit sizes executors instead.
    heap_g = min(64, max(8, mult // 4))
    spark = get_spark(
        "bench-semdedup",
        extra_conf={
            "spark.driver.memory": f"{heap_g}g",
            "spark.sql.shuffle.partitions": str(
                32 * max(1, mult // 4)
            ),
        },
    )

    from pyspark import StorageLevel

    # caller-owned cache contract: eps_similarity_edges rehydrates via
    # two joins against the corpus and does NOT persist it internally
    corpus = synthesize(spark, n_base).persist(StorageLevel.MEMORY_AND_DISK)

    t0 = time.time()
    if scorer == "bucket":
        # one fused stage: buckets are scored in-place, no candidate
        # id-pair shuffle exists to count separately
        n_candidates = None
        t1 = t0
        edges = eps_similarity_edges_bucketed(
            corpus, threshold=threshold, n_tables=4, n_planes=n_planes,
            seed=SEED, quantize=1000.0, dim=DIM,
        )
    else:
        cand = semdedup_candidates(
            corpus, n_tables=4, n_planes=n_planes, seed=SEED, quantize=1000.0,
            dim=DIM,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        n_candidates = cand.count()
        t1 = time.time()
        edges = eps_similarity_edges(
            corpus, threshold=threshold, candidates=cand
        )
    # greedy decisions + recall accounting in ONE aggregate pass
    dup = edges.groupBy("id_l").agg(F.min("id_r").alias("dup_of"))
    stats = (
        corpus.select("vec_id")
        .join(dup, corpus["vec_id"] == dup["id_l"], "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                ((F.col("vec_id") >= n_base) & F.col("dup_of").isNotNull()).cast(
                    "long"
                )
            ).alias("dropped_planted"),
            F.sum(
                ((F.col("vec_id") < n_base) & F.col("dup_of").isNotNull()).cast(
                    "long"
                )
            ).alias("false_drops"),
        )
        .collect()[0]
    )
    t2 = time.time()

    payload = {
        "metric": "semdedup_rehearsal_wall",
        "value": round(t2 - t0, 1),
        "unit": "sec",
        "vectors": int(stats["n"]),
        "candidates": n_candidates,
        "planted": n_planted,
        "dropped_planted": int(stats["dropped_planted"]),
        "recall": round(int(stats["dropped_planted"]) / n_planted, 6),
        "false_drops": int(stats["false_drops"]),
        "stage_walls": {
            "candidates": round(t1 - t0, 1),
            "scoring": round(t2 - t1, 1),
        },
        "n_planes": n_planes,
        "auto_planes": target_bucket == 0,
        "n_tables": 4,
        "threshold": threshold,
        "scorer": scorer,
        "mult": mult,
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
