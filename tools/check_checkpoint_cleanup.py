"""Observe ContextCleaner checkpoint reclamation under
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` — the conf the
100 TB submit template sets (conf/spark-cluster.conf) so a long-lived
session's minted-id interval joins (operators/range_join.py:_pin_row_ids)
don't accumulate a full left-frame copy per call until the volume fills.

The conf had never been OBSERVED working here (r7 verdict, next-round
item 6): deletion is driven by the driver's GC — the cleaner holds weak
references to checkpointed RDDs and removes the files only when the JVM
collects the RDD object — so this script proves the full chain:

  1. run a minted-id OUTER interval join with a checkpoint dir set
     (the reliable-checkpoint path a decommission-enabled fleet takes),
  2. record the checkpoint dir contents,
  3. drop every reference (Python AND the py4j-held JVM refs),
  4. force a driver JVM GC,
  5. poll the dir until the rdd-* directory disappears.

Prints ONE JSON line:
{"metric": "checkpoint_cleanup", "reclaimed": bool, "wait_sec": s,
 "dirs_before": n, "dirs_after": n}

Run standalone (local session) or under spark-submit through
tools/standalone_rehearsal.sh — the chain is identical; the cleaner and
the checkpoint dir both live on the driver side either way.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from person_linkage_case_study_spark.operators.range_join import interval_join
from person_linkage_case_study_spark.session import get_spark


def _rdd_dirs(root: str) -> set[str]:
    found = set()
    for dirpath, dirnames, _ in os.walk(root):
        for d in dirnames:
            if d.startswith("rdd-"):
                found.add(os.path.join(dirpath, d))
    return found


def main() -> None:
    spark = get_spark(
        "check-checkpoint-cleanup",
        extra_conf={
            "spark.cleaner.referenceTracking.cleanCheckpoints": "true",
            "spark.sql.shuffle.partitions": "8",
        },
    )
    ckpt_root = tempfile.mkdtemp(prefix="ckpt-cleanup-")
    spark.sparkContext.setCheckpointDir(ckpt_root)

    left = spark.range(200_000).select(
        (F.col("id") % 100).alias("k"),
        (F.col("id") % 1000).cast("double").alias("s"),
        (F.col("id") % 1000 + 10).cast("double").alias("e"),
    )
    right = spark.range(50_000).select(
        (F.col("id") % 100).alias("k"),
        (F.col("id") % 1000).cast("double").alias("rs"),
        (F.col("id") % 1000 + 5).cast("double").alias("re"),
    )
    # OUTER how= with no row_id -> _pin_row_ids -> reliable checkpoint
    out = interval_join(
        left, right, on=["k"], left_start="s", left_end="e",
        right_start="rs", right_end="re", bin_width=50.0, how="left",
    )
    n = out.count()
    before = _rdd_dirs(ckpt_root)
    assert before, "expected a reliable checkpoint to be written"

    # drop every reference to the checkpointed plan: the local variable
    # AND the JVM-side objects py4j keeps alive through the plan handle
    del out
    import gc

    gc.collect()  # releases the py4j proxies -> JVM refs can die
    jvm = spark.sparkContext._jvm
    t0 = time.time()
    reclaimed = False
    deadline = t0 + 120
    while time.time() < deadline:
        jvm.System.gc()  # driver JVM GC: weak refs enqueue -> cleaner runs
        time.sleep(2)
        if not (_rdd_dirs(ckpt_root) & before):
            reclaimed = True
            break
    after = _rdd_dirs(ckpt_root)

    print(
        json.dumps(
            {
                "metric": "checkpoint_cleanup",
                "reclaimed": reclaimed,
                "wait_sec": round(time.time() - t0, 1),
                "dirs_before": len(before),
                "dirs_after": len(after),
                "rows": n,
            }
        )
    )


if __name__ == "__main__":
    main()
