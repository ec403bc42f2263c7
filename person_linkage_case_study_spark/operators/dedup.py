"""Dedup operators (SURVEY.md §2.5 W1-W2, §2.7 U2).

The reference's 97-line ``drop_duplicates(subset, sort_col, keep)``
(distributed_compute.py:426-522) — a set_index-shuffle plus per-partition
sort — is the canonical Spark window top-1: one shuffle on the key, codegen
sort within partitions, no custom machinery.

Determinism (SURVEY.md §7.3.2): the reference's ``keep="last"`` depends on
unstable distributed sort order; here every ordering gets an explicit
tiebreak column so results are reproducible across partitionings.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_best(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    tiebreak: str | None = None,
) -> DataFrame:
    """W1: best row per key group by explicit ordering.

    ``order_by`` are ready-made Column orderings (e.g.
    ``[F.desc("match_probability")]``); ``tiebreak`` (a column name,
    ascending) makes the total order deterministic — pass the record id.
    """
    ordering = list(order_by)
    if tiebreak is not None:
        ordering.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def max_per_group_with_ties(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """W2: all rows achieving the group max (argmax with ties kept) —
    the reference computes max-per-key then joins back
    (03_link_datasets.ipynb:2171-2187); a single window max avoids the
    second shuffle of the self-join entirely.
    """
    w = Window.partitionBy(*keys)
    return (
        df.withColumn("__mx", F.max(value_col).over(w))
        .filter(F.col(value_col) == F.col("__mx"))
        .drop("__mx")
    )
