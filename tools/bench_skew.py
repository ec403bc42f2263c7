"""Skew rehearsal: hot-key pair explosion through the blocking join.

The scale problem this measures: at USA scale one blocking key (surname
SMITH) can hold a constant FRACTION of both sides, so the blocked join's
pair output for that key grows with the product of the sides while every
other reducer finishes early — the canonical straggler. The engine has
two mitigations, both exercised here against an unmitigated control:

* **AQE skew-join split** (session default ON): splits oversized shuffle
  partitions at runtime and replicates the matching partition of the
  other side. Free, but keyed to shuffle-INPUT bytes — it helps when the
  hot key's input rows are themselves big.
* **Explicit salting** (``blocked_pairs(salt_partitions=n)``, the
  reference's own mitigation, 03_link_datasets.ipynb:1971-1975): spreads
  the hot key's PAIRS over n reducers regardless of input size — the
  right tool when the skew is an output explosion from modest inputs
  (exactly this rehearsal's shape, and exactly what AQE cannot see).

Rehearsal shape: left = ``400k × mult`` rows with ~25% on ONE hot key and
the rest uniform over 10k keys; right = 20k reference rows with 100 on
the hot key. Hot pairs ≈ 94% of all pairs through one key. Per-pair work
is JVM-codegen ``levenshtein`` on 10-char hashes — a stand-in for the
comparison-vector arithmetic of a real linkage pass. Broadcast is
disabled for the join (``autoBroadcastJoinThreshold=-1``): a 20k-row dim
would auto-broadcast and dissolve the skew entirely (no shuffle, pairs
minted map-side where the left is uniformly partitioned) — which IS the
first-choice fix when one side fits in memory, but the 100 TB case this
rehearses is both sides too big to broadcast. AQE's skew thresholds are
lowered to rehearsal scale (the hot partition is ~10 MB here; at real
scale the 256 MB default triggers on its own).

All three configs must produce the SAME pair count and per-pair checksum
(salting is lossless — pinned in tests/test_operators.py too); the tool
raises otherwise. Synthesis is pure hash projections over spark.range:
deterministic under any partitioning, no input files.

Usage: python tools/bench_skew.py [mult] [salt]
Prints ONE JSON line:
{"metric": "skew_rehearsal_wall", "unit": "sec", "pairs": P,
 "hot_share": h, "configs": {"no_mitigation": s, "aqe_skew": s,
 "salted": s}, "mult": m, "salt": n}
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from person_linkage_case_study_spark.operators.blocking import blocked_pairs
from person_linkage_case_study_spark.session import get_spark

LEFT_BASE = 400_000
RIGHT_ROWS = 20_000
COLD_KEYS = 10_000
HOT_EVERY = 4  # ~25% of left rows on the hot key
RIGHT_HOT = 100  # right rows on the hot key


def synthesize(spark: SparkSession, n_left: int) -> tuple[DataFrame, DataFrame]:
    key = lambda idcol, hot_mod: F.when(
        F.pmod(F.xxhash64(F.lit("hot?"), idcol), hot_mod) == 0, F.lit("HOT")
    ).otherwise(
        F.concat(F.lit("key_"), F.pmod(F.xxhash64(F.lit("cold"), idcol), COLD_KEYS))
    )
    left = spark.range(n_left).select(
        key(F.col("id"), F.lit(HOT_EVERY)).alias("block_key"),
        F.substring(F.md5(F.concat(F.lit("L"), F.col("id"))), 1, 10).alias("name"),
    )
    # right: first RIGHT_HOT ids are the hot rows, rest uniform-cold
    right = spark.range(RIGHT_ROWS).select(
        F.when(F.col("id") < RIGHT_HOT, F.lit("HOT"))
        .otherwise(
            F.concat(
                F.lit("key_"), F.pmod(F.xxhash64(F.lit("cold"), F.col("id")), COLD_KEYS)
            )
        )
        .alias("block_key"),
        F.substring(F.md5(F.concat(F.lit("R"), F.col("id"))), 1, 10).alias("name"),
    )
    return left, right


def run_config(left, right, salt: int | None) -> tuple[float, int, int]:
    pairs = blocked_pairs(left, right, ["block_key"], salt_partitions=salt)
    scored = pairs.select(
        F.levenshtein("name_l", "name_r").alias("d")
    )
    t0 = time.time()
    row = scored.agg(
        F.count(F.lit(1)).alias("n"), F.sum("d").alias("chk")
    ).first()
    return time.time() - t0, int(row["n"]), int(row["chk"])


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    salt = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(
        "bench-skew",
        extra_conf={
            # both sides "too big to broadcast" (the 100 TB premise)
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            # AQE skew thresholds scaled to the rehearsal's ~10 MB hot
            # partition; at cluster scale the defaults (256 MB) fire
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512k",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        },
    )
    left, right = synthesize(spark, LEFT_BASE * mult)
    left.write.format("noop").mode("overwrite").save()  # warm JVM

    results: dict[str, float] = {}
    counts: set[tuple[int, int]] = set()

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    wall, n, chk = run_config(left, right, None)
    results["no_mitigation"] = round(wall, 1)
    counts.add((n, chk))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    wall, n, chk = run_config(left, right, None)
    results["aqe_skew"] = round(wall, 1)
    counts.add((n, chk))

    # salting spreads pairs regardless of AQE; measure it with AQE skew
    # back off so the two mitigations aren't conflated
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    wall, n, chk = run_config(left, right, salt)
    results["salted"] = round(wall, 1)
    counts.add((n, chk))

    if len(counts) != 1:
        raise SystemExit(f"mitigations disagree on (pairs, checksum): {counts}")

    n_pairs = next(iter(counts))[0]
    hot_pairs = (
        left.filter(F.col("block_key") == "HOT").count()
        * right.filter(F.col("block_key") == "HOT").count()
    )
    print(
        json.dumps(
            {
                "metric": "skew_rehearsal_wall",
                "unit": "sec",
                "pairs": n_pairs,
                "hot_share": round(hot_pairs / n_pairs, 4),
                "configs": results,
                "mult": mult,
                "salt": salt,
            }
        )
    )


if __name__ == "__main__":
    main()
