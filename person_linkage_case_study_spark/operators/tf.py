"""Splink-style term-frequency adjustments (§2.9 K-surface deepening).

The reference's trained settings carry ``has_tf_adjustments: false`` on
every level (small_sample 03_link_datasets.ipynb settings dumps), so this
is beyond-parity coverage of the public Splink scoring surface: without
TF adjustment, an exact match on "SMITH" counts the same as one on a
one-in-a-million surname; with it, the chance-agreement probability of
the *specific value* replaces the level average.

Semantics (Splink's documented formula, weight ``w`` interpolating from
no adjustment at 0 to full at 1): for an exact match on value ``v`` of a
comparison whose exact level has average u-probability ``u_exact``,

    match_weight += w * (log2(u_exact) - log2(tf(v)))

where ``tf(v)`` is the value's relative frequency in the input. Common
values (tf > u_exact) are penalized, rare ones boosted; the un-adjusted
weight is the tf-weighted average, so EM-trained m/u stay valid.

Scale shape: a TF table is a per-column value histogram — bounded by
column cardinality, not data size — built with one partial-agg groupBy
and broadcast to the scored pairs. The adjustment itself is a broadcast
hash join plus one CASE arm: the pair stream is never shuffled. For a
truly high-cardinality column (tf table over broadcast threshold) the
same join degrades to a shuffled hash join on the value key, which is
exactly what Splink's SQL does on any backend.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .gamma import Comparison


def term_frequency_table(df: DataFrame, col: str, tf_col: str = "tf") -> DataFrame:
    """(value, tf) — relative frequency of each non-null value of ``col``.

    For a two-frame link, pass the union of both inputs (Splink computes
    TF over the concatenated datasets). One groupBy (map-side partial agg)
    plus a broadcast of the single-row total: no driver-side action.
    """
    counts = df.filter(F.col(col).isNotNull()).groupBy(col).agg(
        F.count(F.lit(1)).alias("__n")
    )
    total = counts.agg(F.sum("__n").alias("__total"))
    return counts.crossJoin(F.broadcast(total)).select(
        F.col(col),
        (F.col("__n").cast("double") / F.col("__total")).alias(tf_col),
    )


def _exact_gamma(c: Comparison) -> int:
    non_null = [lv for lv in c.levels if lv.kind != "null"]
    for i, lv in enumerate(non_null):
        if lv.kind == "exact":
            return len(non_null) - 1 - i  # first listed = highest gamma
    raise ValueError(f"comparison {c.col} has no exact level to TF-adjust")


def add_tf_adjustment(
    scored: DataFrame,
    c: Comparison,
    tf_df: DataFrame,
    weight: float = 1.0,
    left_suffix: str = "_l",
) -> DataFrame:
    """Add ``tf_adjustment`` and ``match_weight_tf`` to scored pairs.

    Joins the (broadcast) TF table on the left value — at the exact-match
    gamma both sides agree, so the left value IS the matched value — and
    applies the formula above only on that gamma; every other level's
    adjustment is 0.
    """
    g = _exact_gamma(c)
    u_exact = c.u[g]
    if u_exact <= 0:
        raise ValueError(f"u[{g}] must be positive for {c.col}")
    val = f"{c.col}{left_suffix}"
    tf = tf_df.select(F.col(c.col).alias(val), F.col("tf").alias("__tf"))
    out = scored.join(F.broadcast(tf), on=val, how="left")
    adj = F.when(
        (F.col(c.gamma_col) == g) & F.col("__tf").isNotNull(),
        F.lit(weight) * (F.lit(math.log2(u_exact)) - F.log2(F.col("__tf"))),
    ).otherwise(F.lit(0.0))
    out = out.withColumn("tf_adjustment", adj).withColumn(
        "match_weight_tf", F.col("match_weight") + F.col("tf_adjustment")
    )
    return out.withColumn(
        "match_probability_tf",
        F.lit(1.0) / (F.lit(1.0) + F.pow(F.lit(2.0), -F.col("match_weight_tf"))),
    ).drop("__tf")


def tf_adjustment_sql(
    c: Comparison, weight: float = 1.0, tf_expr: str = "tf"
) -> str:
    """DuckDB mirror of the adjustment CASE (same literal constants); the
    caller joins the TF table and passes its column as ``tf_expr``."""
    g = _exact_gamma(c)
    u_exact = c.u[g]
    return (
        f"CASE WHEN {c.gamma_col} = {g} AND {tf_expr} IS NOT NULL "
        f"THEN {weight!r} * ({math.log2(u_exact)!r} - log2({tf_expr})) "
        f"ELSE 0.0 END"
    )
