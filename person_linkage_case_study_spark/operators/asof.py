"""As-of (temporal nearest-prior) join.

The reference has no temporal operator — its tables are snapshots — but a
production linkage/curation pipeline over event-shaped data constantly
needs "each record paired with the most recent earlier state" (latest
address on file at census day, price in effect at order time, last
heartbeat before an event). Spark has no built-in as-of join, and the
naive formulations are scale-traps:

* inequality join + argmin window: the range join explodes to
  |left|x|right| per key before the window prunes it;
* ``mapInPandas`` with ``pandas.merge_asof``: leaves the JVM and needs a
  per-key sort anyway.

This implementation is the union trick — ONE shuffle, no pair explosion:

1. tag right rows side=0, left rows side=1, union on (keys, ts);
2. window ``partitionBy(keys) orderBy(ts, side [, right order cols])``
   with ``rowsBetween(unboundedPreceding, currentRow)`` and
   ``last(payload, ignorenulls=True)`` — each left row reads the latest
   right payload at or before its timestamp;
3. keep side=1 rows; apply the optional tolerance filter.

Cost is exactly one hash exchange of |left|+|right| rows on the join
keys plus a per-partition sort — the same price as a co-partitioned
merge join, and AQE-splittable if one key is hot. Direction
``'forward'`` flips the sort order instead of duplicating the logic.

Ties: a right row whose ts equals the left ts IS eligible (side 0 sorts
before side 1 at equal ts — pandas ``merge_asof`` semantics); equal-ts
right rows are resolved deterministically by the highest
``tiebreak_cols`` value (default: the right timestamp only, so the last
writer wins by sort stability is NOT relied upon — pass explicit
tiebreak cols for full determinism when right ts collide).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _orderable_ts(df: DataFrame, col: str) -> Column:
    """Orderable sort key for the union window: timestamp-like columns
    (TIMESTAMP, TIMESTAMP_NTZ, DATE) go through exact integer epoch
    micros (no double-mantissa precision cliff); numeric ts stay numeric."""
    dt = dict(df.dtypes)[col]
    if dt.startswith("timestamp") or dt == "date":
        return F.unix_micros(F.col(col).cast("timestamp")).cast("double")
    return F.col(col).cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    suffix: str = "_r",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Left as-of join: every left row, plus the right row with the
    greatest ``right_ts`` <= ``left_ts`` (``backward``) or smallest
    ``right_ts`` >= ``left_ts`` (``forward``) within the same ``on``
    key, or nulls when none qualifies.

    ``tolerance``: optional max separation as a Column (e.g.
    ``F.expr("INTERVAL 1 HOUR")`` for timestamps, ``F.lit(30)`` for
    numeric ts); matches farther away revert to nulls. Right payload
    columns are suffixed when they collide with left names. The matched
    right timestamp is always emitted as ``{right_ts}{suffix}``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    right_ts = right_ts or left_ts
    keys = list(on)

    payload_cols = [c for c in right.columns if c not in keys and c != right_ts]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload_cols
    }
    matched_ts = right_ts + suffix if right_ts in left.columns or right_ts == left_ts else right_ts

    # Two structs per right row: __ord (tiebreak prefix only) is what the
    # window sorts equal-ts rights by — keeping payload columns OUT of the
    # ORDER BY so unorderable payload types (maps) don't break the join —
    # and __payload carries the matched ts + payload for last() to pick up.
    # Right rows with a NULL timestamp are dropped up front: ASOF semantics
    # (DuckDB / pandas merge_asof) never match them, and under asc()
    # nulls-first ordering they would otherwise poison every left row.
    tb = [
        F.col(c).alias(f"__tb{i}")
        for i, c in enumerate(tiebreak_cols or [right_ts])
    ]
    r_tagged = right.filter(F.col(right_ts).isNotNull()).select(
        *keys,
        _orderable_ts(right, right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*tb).alias("__ord"),
        F.struct(
            F.col(right_ts).alias("__rts"), *[F.col(c) for c in payload_cols]
        ).alias("__payload"),
    )
    l_tagged = left.select(
        "*",
        _orderable_ts(left, left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__ord"].dataType).alias("__ord"),
        F.lit(None).cast(r_tagged.schema["__payload"].dataType).alias("__payload"),
    )

    asc = direction == "backward"
    order = [
        F.col("__ts").asc() if asc else F.col("__ts").desc(),
        F.col("__side").asc(),  # right rows first at equal ts: ties eligible
        F.col("__ord").asc_nulls_first(),  # equal-ts rights: max tiebreak last
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tagged.select(
        *[F.col(c) for c in left.columns], "__ts", "__side", "__ord", "__payload"
    ).unionByName(
        r_tagged.select(
            *[
                F.col(k) if k in keys else F.lit(None).cast(left.schema[k].dataType).alias(k)
                for k in left.columns
            ],
            "__ts",
            "__side",
            "__ord",
            "__payload",
        )
    )
    matched = (
        unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .drop("__side", "__ord", "__payload")
    )
    # a left row with NULL ts has no position in as-of order: never matches
    # (under desc ordering it would otherwise sort last and see every right)
    matched = matched.withColumn(
        "__match", F.when(F.col(left_ts).isNotNull(), F.col("__match"))
    )
    if tolerance is not None:
        # signed gap in the ORIGINAL ts type: timestamp - timestamp is an
        # interval, so an interval tolerance (the natural spelling for
        # timestamps) compares directly; numeric ts compare numerically
        rts = F.col("__match.__rts")
        gap = (
            F.col(left_ts) - rts if direction == "backward" else rts - F.col(left_ts)
        )
        matched = matched.withColumn(
            "__match", F.when(gap <= tolerance, F.col("__match"))
        )
    return matched.select(
        *[F.col(c) for c in left.columns],
        F.col("__match.__rts").alias(matched_ts),
        *[F.col(f"__match.{c}").alias(out_names[c]) for c in payload_cols],
    )
