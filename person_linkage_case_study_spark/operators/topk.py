"""Mergeable heavy-hitters (top-k) summaries.

The reference's frequency analysis is `value_counts` (A8 in SURVEY §2) —
exact and fine when the table fits one engine. At 100 TB the question is
usually asked of a GROWING table (top domains this month, top tokens per
source), and re-counting the whole table per slice is a rescan per day.
This module keeps the per-slice summaries MERGEABLE, the same contract as
``operators/profile.py``'s sketch rows:

* ``topk_increment`` — per slice, the exact top-``capacity`` counts plus
  the largest DROPPED count as the slice's error threshold. The classic
  pruned-counter guarantee (Mergeable Summaries, Agarwal et al., PODS'12
  §3): any item absent from a slice's summary has a true count in that
  slice of at most ``slice_threshold``.
* ``merge_topk`` — fold any set of slice summaries: per item,
  ``n_lower`` = sum of kept counts (exact mass actually seen),
  ``n_upper`` = ``n_lower`` + Σ thresholds of the slices where the item
  was pruned. An item is ``guaranteed`` top-k when its lower bound beats
  the (k+1)-th largest upper bound — a certificate, not a heuristic.

Everything is built-in DataFrame ops (groupBy counts + windows over
summary-sized data); the merge input is #slices × capacity rows — bytes,
never data-sized. Rule of thumb: ``capacity ≥ k / ε`` bounds each
slice's threshold by ε × slice_total, so uncertainty shrinks linearly in
the summary size you're willing to store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_exact(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact top-k values by count: ``(value, n)``, count-desc then
    value-asc for a deterministic ordering under ties."""
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("value"))
        .limit(k)
    )


def topk_increment(
    df: DataFrame, col: str, capacity: int, slice_id: str
) -> DataFrame:
    """Summarize ONE slice: ``(slice_id, value, n, slice_threshold)``.

    Keeps the exact counts of the top ``capacity`` values (ties broken by
    value so the kept set is deterministic); ``slice_threshold`` is the
    largest pruned count (0 when nothing was pruned — then the slice is
    exact and contributes no uncertainty).

    One shuffle on the grouped column; the top-``capacity`` cut is a
    distributed ``TakeOrderedAndProject`` (each map task keeps its local
    top ``capacity + 1``), never a partition-less ranking window — at
    100 TB the distinct-value table (URLs, tokens) is itself huge, and a
    global ``row_number`` window would drag every distinct value through
    one reducer. The largest pruned count is exactly the
    ``capacity + 1``-th ordered count, so the threshold needs only the
    top ``capacity + 1`` rows.
    """
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.desc("n"), F.asc("value")).limit(capacity + 1)
    # (capacity+1)-th count == min(n) over the top set, present only when
    # something was actually pruned (i.e. the set is full)
    thr = top.agg(
        F.when(F.count(F.lit(1)) > capacity, F.min("n"))
        .otherwise(F.lit(0))
        .alias("slice_threshold")
    )
    return (
        top.orderBy(F.desc("n"), F.asc("value"))
        .limit(capacity)
        .crossJoin(F.broadcast(thr))
        .select(F.lit(slice_id).alias("slice_id"), "value", "n", "slice_threshold")
    )


def merge_topk(summaries: DataFrame, k: int) -> DataFrame:
    """Fold slice summaries (union of :func:`topk_increment` outputs) into
    ``(value, n_lower, n_upper, guaranteed)`` for the top-k candidates.

    ``n_lower`` ≤ true count ≤ ``n_upper`` always (the pruned-counter
    bound); ``guaranteed`` marks items whose lower bound meets or beats
    the (k+1)-th largest upper bound — those are PROVABLY in the true
    top-k regardless of how the pruned mass is distributed. With ≤ k
    candidates total, the cutoff is the sum of all slice thresholds (the
    max possible count of an item pruned from every slice), keeping the
    certificate sound even when every slice kept the same values.
    """
    slice_thr = summaries.select("slice_id", "slice_threshold").distinct()
    total_thr = slice_thr.agg(
        F.coalesce(F.sum("slice_threshold"), F.lit(0)).alias("__total_thr")
    )
    per_item = (
        summaries.groupBy("value")
        .agg(
            F.sum("n").alias("n_lower"),
            F.sum("slice_threshold").alias("__present_thr"),
        )
        .crossJoin(F.broadcast(total_thr))
        .withColumn(
            "n_upper",
            F.col("n_lower") + F.col("__total_thr") - F.col("__present_thr"),
        )
    )
    # single-partition window: the input here is the MERGED summary
    # (≤ #slices × capacity rows by construction), the same bounded-window
    # stance as the ngram bitmap vocabulary — never data-sized
    w_ub = Window.orderBy(F.desc("n_upper"), F.asc("value"))
    cutoff = (
        per_item.withColumn("__ub_rank", F.row_number().over(w_ub))
        .filter(F.col("__ub_rank") == k + 1)
        # no (k+1)-th candidate ⇒ the only possible displacers are items
        # pruned from EVERY slice, whose true count can reach the total
        # threshold sum — so the cutoff falls back to Σ slice_thresholds,
        # never 0 (every candidate's n_upper ≥ total_thr already, so when
        # a (k+1)-th candidate exists its bound dominates the fallback)
        .agg(F.max("n_upper").alias("__kplus1_ub"))
        .crossJoin(F.broadcast(total_thr))
        .select(
            F.coalesce(F.col("__kplus1_ub"), F.col("__total_thr")).alias(
                "__cutoff"
            )
        )
    )
    return (
        per_item.crossJoin(F.broadcast(cutoff))
        .withColumn("guaranteed", F.col("n_lower") >= F.col("__cutoff"))
        .orderBy(F.desc("n_lower"), F.asc("value"))
        .limit(k)
        .select("value", "n_lower", "n_upper", "guaranteed")
    )
