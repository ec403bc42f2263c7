"""Binned range join: point-in-interval and interval-overlap joins.

The reference never joins on ranges (its blocking is equality-shaped:
`/root/reference/src/person_linkage_case_study/` passes block on zip /
name-initial equality), but event-shaped curation data constantly needs
"which validity interval was this event inside" (price in effect, session
window containing a click, config epoch covering a record). Spark has no
range-join operator: the direct spelling

    left.join(right, (k equal) & (start <= ts) & (ts < end))

hash-joins on the key and evaluates the range as a residual — which
means every same-key (point, interval) pair is materialized before the
filter: quadratic per key, and with no key at all (global intervals)
Catalyst degenerates to BroadcastNestedLoopJoin outright. Fatal at
100 TB either way.

The scale-correct formulation is *binning* (the same technique behind
Databricks' range-join optimization and Postgres' SP-GiST ranges): pick a
bin width `w`, explode each interval into the integer bins it covers
(cost: interval_length/w extra rows), map each point to its single bin,
and join on (keys, bin) PLUS the exact range predicate. The equality on
bin turns the join into an ordinary shuffled hash/sort-merge join;
the exact predicate runs as the join's residual filter. Each qualifying
(point, interval) pair shares exactly ONE bin — the point's — so no
dedup is needed and left/semi/anti join types work unchanged.

For interval-vs-interval overlap the same trick needs a dedup rule,
because an overlapping pair can share many bins: the pair is credited
only in the bin containing ``greatest(a.start, b.start)`` — a point that
lies in both intervals precisely when they overlap — so again each pair
appears exactly once and outer variants stay correct.

Choosing ``bin_width``: ~the median interval length. Wider bins explode
fewer rows but let more non-matching pairs through to the residual
filter; narrower bins do the reverse. Cost model per right row is
``1 + ceil(length/w)`` exploded rows; the residual filter is a codegen
comparison, so over-wide bins only waste shuffle I/O, never correctness.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_JOIN_TYPES = ("inner", "left", "left_semi", "left_anti")


def _numeric(df: DataFrame, col: str) -> Column:
    """Exact numeric image of a timestamp/date/numeric column (epoch
    micros for temporal types), for bin arithmetic."""
    if _is_temporal(df, col):
        return F.unix_micros(F.col(col).cast("timestamp"))
    return F.col(col)


def _bins(lo: Column, hi: Column, width: int) -> Column:
    """All integer bins covered by [lo, hi] (numeric images), as an array.

    ``sequence`` is JVM-side; callers guarantee lo <= hi (empty/inverted
    intervals are filtered before this is applied).
    """
    return F.sequence(
        F.floor(lo / F.lit(width)), F.floor(hi / F.lit(width))
    )


def _is_temporal(df: DataFrame, col: str) -> bool:
    dt = dict(df.dtypes)[col]
    return dt.startswith("timestamp") or dt == "date"


def _check_unit_class(*sides: tuple[DataFrame, str]) -> None:
    """The bin arithmetic runs over each column's numeric image — epoch
    MICROS for temporal columns, raw values for numerics. Mixing the two
    classes (numeric point vs timestamp interval) would bin in mismatched
    units and silently produce wrong/empty joins, so it's an error."""
    classes = [(c, _is_temporal(df, c)) for df, c in sides]
    if len({t for _, t in classes}) > 1:
        kinds = ", ".join(
            f"{c}={'temporal' if t else 'numeric'}" for c, t in classes
        )
        raise TypeError(
            "range/interval join columns must all be temporal or all "
            f"numeric — got {kinds}"
        )


def _width_micros(df: DataFrame, col: str, bin_width: float) -> int:
    """bin_width is given in the column's natural units (seconds for
    temporal columns, raw units for numerics); convert to the internal
    numeric image's units."""
    if _is_temporal(df, col):
        return max(int(bin_width * 1_000_000), 1)
    return max(int(bin_width), 1)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    point: str,
    start: str,
    end: str,
    bin_width: float,
    how: str = "inner",
    closed: str = "left",
    suffix: str = "_r",
) -> DataFrame:
    """Join each left row (at ``left[point]``) to every right interval
    ``[right[start], right[end])`` containing it, per ``on`` key.

    ``closed``: 'left' ([start, end)), 'both' ([start, end]), 'right'
    ((start, end]), 'neither' ((start, end)). ``bin_width`` in the point
    column's natural units (seconds for timestamps). ``how`` in
    {'inner', 'left', 'left_semi', 'left_anti'}; outer variants are
    correct because each qualifying pair materializes in exactly one bin.
    Right rows with NULL/inverted bounds never match; left rows with a
    NULL point never match (and survive with null payload under 'left').
    """
    if how not in _JOIN_TYPES:
        raise ValueError(f"how must be one of {_JOIN_TYPES}")
    if closed not in ("left", "right", "both", "neither"):
        raise ValueError("closed must be left|right|both|neither")
    _check_unit_class((left, point), (right, start), (right, end))
    keys = list(on)
    width = _width_micros(left, point, bin_width)

    r_lo, r_hi = _numeric(right, start), _numeric(right, end)
    r = (
        right.filter(
            F.col(start).isNotNull()
            & F.col(end).isNotNull()
            & (F.col(start) <= F.col(end))
        )
        .withColumn("__bin", F.explode(_bins(r_lo, r_hi, width)))
    )
    # suffix right columns that collide with left names (keys are dropped
    # from the right side entirely — they're equal by the join condition)
    payload = [c for c in right.columns if c not in keys]
    renames = {c: (c + suffix if c in left.columns else c) for c in payload}
    r = r.select(
        *[F.col(k).alias(f"__rk_{k}") for k in keys],
        F.col("__bin").alias("__rbin"),
        *[F.col(c).alias(renames[c]) for c in payload],
    )

    l_pt = _numeric(left, point)
    l = left.withColumn("__bin", F.floor(l_pt / F.lit(width)))

    s_col, e_col = F.col(renames[start]), F.col(renames[end])
    lo_ok = F.col(point) >= s_col if closed in ("left", "both") else F.col(point) > s_col
    hi_ok = F.col(point) <= e_col if closed in ("right", "both") else F.col(point) < e_col
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__rk_{k}"))
    cond = cond & (F.col("__bin") == F.col("__rbin")) & lo_ok & hi_ok

    # Spark extracts the equalities (keys, __bin) as hash-join keys and
    # runs the range predicate as the join residual — one shuffle, no
    # nested loop. Verified by the plan pin in tests/test_range_join.py.
    out = l.join(r, cond, how)
    if how in ("left_semi", "left_anti"):
        return out.drop("__bin")
    return out.drop("__bin", "__rbin", *[f"__rk_{k}" for k in keys])


def _pin_row_ids(df: DataFrame) -> DataFrame:
    """Make a frame carrying ``monotonically_increasing_id`` minted ids
    safe to reference from two plan subtrees on a fault-prone cluster.

    A bare mono-id over a shuffle-derived input is only deterministic per
    *materialization* (row order within a shuffle partition depends on
    block-fetch arrival order), and ``persist`` pins one materialization
    only while every cached block lives — MEMORY_AND_DISK blocks die with
    their executor, after which Spark silently recomputes the partition
    from lineage and may assign DIFFERENT ids. So:

    - checkpoint dir configured → **reliable** ``checkpoint()``: the id'd
      rows live in fault-tolerant storage; executor loss re-reads them,
      never re-mints. This is the 1000-core-fleet mode (the submit
      template enables ``spark.decommission.enabled``).
    - otherwise → eager ``localCheckpoint()``: lineage is CUT, so a
      re-mint is impossible by construction; losing an executor's blocks
      fails the job loudly instead of corrupting the answer. Right
      trade-off for local/single-JVM runs where executor loss == JVM
      death anyway.

    **Storage note (r7, advice item).** Reliable checkpoint files are
    NOT deleted when the returned frame is dropped — by default
    (``spark.cleaner.referenceTracking.cleanCheckpoints=false``) every
    minted-id outer join leaves a full copy of its left frame in the
    checkpoint dir for the application's lifetime. A one-call-lag
    delete would reintroduce exactly the fault-sensitivity the r6 fix
    removed (a still-lazy earlier result reading a deleted checkpoint),
    so the remedies are external: ``conf/spark-cluster.conf`` now sets
    ``cleanCheckpoints=true`` (the ContextCleaner deletes a checkpoint
    only once its RDD is garbage-collected — safe by construction), and
    long-lived sessions should pass ``row_id`` (zero checkpoints, zero
    storage) — it is the preferred contract anyway.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: float,
    how: str = "inner",
    suffix: str = "_r",
    row_id: str | None = None,
) -> DataFrame:
    """Join overlapping half-open intervals per key:
    ``[l_start, l_end) ∩ [r_start, r_end) ≠ ∅``.

    Both sides explode to their covered bins; a pair is credited only in
    the bin containing ``greatest(l_start, r_start)`` — inside both
    intervals exactly when they overlap — so every overlapping pair is
    emitted exactly once. NULL or inverted (end <= start, i.e. empty)
    intervals never match.

    ``how`` in {'inner', 'left', 'left_semi', 'left_anti'}: the
    exactly-one-bin dedup means no qualifying pair duplicates and no
    spurious residual rows, so the outer variants are correct directly —
    'left' keeps non-overlapping (and NULL/empty-interval) left rows with
    null right payload exactly once, 'left_anti' answers "which records
    have NO covering epoch". Under 'left'/'left_anti', left rows with
    NULL or empty intervals count as unmatched (they overlap nothing).

    ``row_id``: name of a column on ``left`` that uniquely identifies
    each row (the same contract ``asof_join`` and the dedup pipeline
    impose). Outer variants decide matched/unmatched at original-row
    granularity, which references the left input from two plan subtrees;
    with a caller-supplied key that is safe under ANY recomputation —
    zero caches, zero checkpoints, fully fault-deterministic. Without
    one, a row id is minted and pinned via ``_pin_row_ids`` (reliable
    ``checkpoint()`` when a checkpoint dir is configured, else eager
    ``localCheckpoint()`` — note the latter runs a job at call time,
    and the former leaves checkpoint files behind unless
    ``spark.cleaner.referenceTracking.cleanCheckpoints`` is on — see
    ``_pin_row_ids``). Prefer passing ``row_id`` whenever a natural key
    exists.

    **Uniqueness is the caller's contract and is not validated** (a
    count-distinct pass per call would defeat the zero-extra-jobs point
    of the fast path): a DUPLICATED ``row_id`` makes 'left' silently
    fan out matched rows (every duplicate picks up every duplicate's
    pairs — the final join key is no longer unique) and makes
    semi/anti treat the duplicates as one row. When unsure, mint:
    leave ``row_id=None`` and the pinned ``monotonically_increasing_id``
    path guarantees uniqueness structurally.
    """
    if how not in _JOIN_TYPES:
        raise ValueError(f"how must be one of {_JOIN_TYPES}")
    _check_unit_class(
        (left, left_start), (left, left_end), (right, right_start), (right, right_end)
    )
    keys = list(on)
    width = _width_micros(left, left_start, bin_width)

    if how != "inner":
        # The exploded left side is the wrong granularity for per-ROW
        # match decisions (an interval spanning b bins would surface b
        # unmatched copies under 'left'), so outer variants decide at the
        # original-row granularity: compute the qualifying (row id, right
        # payload) pair stream with the inner machinery over a NARROW
        # projection of left, then join the ORIGINAL left against it on
        # the row id — left join for 'left' (matched rows pick up
        # payload, unmatched rows type-correct nulls, each exactly once),
        # semi/anti for the membership variants. The pair subtree is
        # referenced exactly once, so nothing pair-sized is ever cached.
        if row_id is not None:
            if row_id not in left.columns:
                raise ValueError(f"row_id column {row_id!r} not in left")
            lid, idc = left, row_id
        else:
            lid = _pin_row_ids(
                left.withColumn("__lid", F.monotonically_increasing_id())
            )
            idc = "__lid"
        # pre-rename right payload to its final (collision-suffixed)
        # names so the narrow inner call below can't rename differently
        payload = [c for c in right.columns if c not in keys]
        renames = {c: (c + suffix if c in left.columns else c) for c in payload}
        r_named = right.select(
            *keys, *[F.col(c).alias(renames[c]) for c in payload]
        )
        narrow = list(dict.fromkeys([idc, *keys, left_start, left_end]))
        pairs = interval_join(
            lid.select(*narrow),
            r_named,
            on=keys,
            left_start=left_start,
            left_end=left_end,
            right_start=renames[right_start],
            right_end=renames[right_end],
            bin_width=bin_width,
            how="inner",
            suffix=suffix,
        ).select(idc, *[renames[c] for c in payload])
        if how == "left_semi":
            return lid.join(pairs.select(idc).distinct(), idc, "left_semi").select(
                *left.columns
            )
        if how == "left_anti":
            return lid.join(pairs.select(idc).distinct(), idc, "left_anti").select(
                *left.columns
            )
        return lid.join(pairs, idc, "left").select(
            *left.columns, *[renames[c] for c in payload]
        )

    def prep(df: DataFrame, s: str, e: str, key_prefix: str) -> DataFrame:
        lo, hi = _numeric(df, s), _numeric(df, e)
        return (
            df.filter(
                F.col(s).isNotNull() & F.col(e).isNotNull() & (F.col(s) < F.col(e))
            )
            # half-open [lo, hi): covering through floor(hi/w) may emit one
            # bin past the last truly-covered one — a harmless extra
            # candidate row the residual overlap filter removes; computing
            # the tight cap would assume integer bounds, this doesn't
            .withColumn(
                f"__{key_prefix}bin",
                F.explode(_bins(lo, hi, width)),
            )
            .withColumn(f"__{key_prefix}lo", lo)
        )

    l = prep(left, left_start, left_end, "l")
    payload = [c for c in right.columns if c not in keys]
    renames = {c: (c + suffix if c in left.columns else c) for c in payload}
    r = prep(right, right_start, right_end, "r").select(
        *[F.col(k).alias(f"__rk_{k}") for k in keys],
        "__rbin",
        "__rlo",
        *[F.col(c).alias(renames[c]) for c in payload],
    )

    rs, re_ = F.col(renames[right_start]), F.col(renames[right_end])
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__rk_{k}"))
    cond = (
        cond
        & (F.col("__lbin") == F.col("__rbin"))
        # overlap of half-open intervals
        & (F.col(left_start) < re_)
        & (rs < F.col(left_end))
        # dedup: credit the pair only in max(l_start, r_start)'s bin
        & (
            F.col("__lbin")
            == F.floor(F.greatest(F.col("__llo"), F.col("__rlo")) / F.lit(width))
        )
    )
    out = l.join(r, cond, "inner")
    return out.drop(
        "__lbin", "__rbin", "__llo", "__rlo", *[f"__rk_{k}" for k in keys]
    )
