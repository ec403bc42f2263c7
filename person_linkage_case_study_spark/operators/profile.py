"""Single-pass table profiler — `describe` that survives 100 TB.

The reference profiles interactively (`.describe()`, `value_counts`,
A8/A9 in SURVEY §2) — fine in pandas, but a naive port runs one job per
column per statistic. At ingest scale the profile must be ONE pass: every
statistic below compiles into a single `agg(...)` over one scan —
count / nulls / approximate NDV (HyperLogLog++) / min / max / mean and
approximate quantiles (Greenwald-Khanna) for numerics — all JVM-side
expressions, no Python, no extra shuffle beyond the global-aggregate
collapse (partial aggregation does the heavy lifting map-side).

The wide 1-row aggregate is then unpivoted driver-side into the familiar
long form (one row per column) — a #columns-bounded reshape, not a data
pass. Approximate knobs: `rel_err` for quantiles (Spark's
`percentile_approx` accuracy = 1/rel_err), HLL++ default rsd ≈ 2.3%.

Incremental variant (``profile_increment`` / ``merge_increments``): at
100 TB the table arrives in slices (a day of ingest, one source shard) and
re-profiling the whole table per slice is a full rescan per day. Every
statistic the incremental profiler keeps is MERGEABLE: count/nulls/sum
add, min/max combine, and NDV is carried as the Apache DataSketches HLL
sketch itself (``hll_sketch_agg`` → BINARY column) rather than a number.
Sketch union is STATE-lossless (the merged sketch has seen every value
exactly once), but the reported estimate is not bit-identical to a
single-pass sketch: a directly-updated DataSketches HLL reports via the
HIP estimator while a union result falls back to the composite estimator,
so merged NDV agrees with the single-pass number only to within the
sketch's rsd (~1.04/sqrt(2^lg_k); pinned by test at 2·rsd). Exact stats
(count/nulls/min/max/mean) merge identically. Profile each slice once,
store the #cols-row sketch table next to the data, and fold sketches at
query time: stats over any subset of slices without touching data bytes
again. Quantiles merge through a KLL-style mergeable summary carried as a
serialized value-sample array (``profile_increment(..., quantile_k=...)``
→ ``merge_increments``), giving rank error ~1/k — same mergeability
story as the HLL column, implemented as compact per-slice reservoirs
folded by weighted re-compression driver-side (the fold input is
#slices × #cols rows, never data-sized).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, NumericType

_Q = (0.25, 0.5, 0.75)


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    quantiles: Sequence[float] = _Q,
    rel_err: float = 0.01,
    by: Sequence[str] | None = None,
) -> DataFrame:
    """One-pass profile: DataFrame with a row per profiled column —
    ``(column, count, nulls, approx_distinct, min, max, mean, std, q_*)``.

    min/max/mean/std/quantiles are null for non-numeric columns (min/max
    on strings would force full-string comparisons through the aggregate;
    profile those via NDV + nulls, or cast explicitly if needed). ``std``
    is the n-1 sample form, matching pandas ``describe`` and DuckDB
    ``stddev_samp``.

    ``by``: optional grouping columns — the grouped describe
    (``df.groupby(by).describe()`` in pandas): one output row per
    (group × profiled column), still ONE scan and ONE aggregate; the
    global collapse just becomes a keyed hash aggregate.
    """
    by = list(by or [])
    cols = list(cols or [c for c in df.columns if c not in by])
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    aggs = []
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"{c}__count"))
        aggs.append(F.count_if(F.col(c).isNull()).alias(f"{c}__nulls"))
        aggs.append(F.approx_count_distinct(c).alias(f"{c}__ndv"))
        if c in numeric:
            aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
            aggs.append(F.avg(c).cast("double").alias(f"{c}__mean"))
            aggs.append(F.stddev_samp(F.col(c).cast("double")).alias(f"{c}__std"))
            aggs.append(
                F.percentile_approx(
                    F.col(c).cast("double"),
                    F.array(*[F.lit(q) for q in quantiles]),
                    F.lit(max(2, int(1.0 / rel_err))),
                ).alias(f"{c}__qs")
            )
    wide = df.groupBy(*by).agg(*aggs) if by else df.agg(*aggs)

    # unpivot the wide aggregate (one row per group, or exactly one):
    # #cols structs, plan-side shape only — never a data pass
    qnames = [f"q{int(q * 100):02d}" for q in quantiles]
    rows = []
    for c in cols:
        fields = [
            F.lit(c).alias("column"),
            F.col(f"{c}__count").alias("count"),
            F.col(f"{c}__nulls").alias("nulls"),
            F.col(f"{c}__ndv").alias("approx_distinct"),
        ]
        if c in numeric:
            fields += [
                F.col(f"{c}__min").alias("min"),
                F.col(f"{c}__max").alias("max"),
                F.round(F.col(f"{c}__mean"), 6).alias("mean"),
                F.round(F.col(f"{c}__std"), 6).alias("std"),
                *[
                    F.round(F.col(f"{c}__qs").getItem(i), 6).alias(n)
                    for i, n in enumerate(qnames)
                ],
            ]
        else:
            fields += [
                F.lit(None).cast("double").alias("min"),
                F.lit(None).cast("double").alias("max"),
                F.lit(None).cast("double").alias("mean"),
                F.lit(None).cast("double").alias("std"),
                *[F.lit(None).cast("double").alias(n) for n in qnames],
            ]
        rows.append(F.struct(*fields))
    return wide.select(*by, F.explode(F.array(*rows)).alias("p")).select(
        *by, "p.*"
    )


def _hll_input(df: DataFrame, c: str):
    """hll_sketch_agg accepts int/long/string/binary; everything else is
    profiled through its canonical string form (NDV-equivalent)."""
    dt = dict(df.dtypes)[c]
    if dt in ("int", "bigint", "string", "binary"):
        return F.col(c)
    return F.col(c).cast("string")


def profile_increment(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    lg_k: int = 12,
    quantile_k: int = 128,
) -> DataFrame:
    """Profile ONE slice of a growing table into mergeable state: a row per
    column — ``(column, count, nulls, min, max, sum, ndv_sketch,
    q_summary)`` where ``ndv_sketch`` is the serialized HLL sketch
    (BINARY) and ``q_summary`` is a ``quantile_k + 1``-point equi-depth
    value grid (order statistics at ranks 0, 1/k, …, 1 via
    ``percentile_approx`` — a compact mergeable quantile summary with
    ~1/(2·quantile_k) rank error; null for non-numeric columns).

    Same single-scan / single-agg shape as :func:`profile_table`. Persist
    the result (e.g. parquet partitioned by slice id); fold any set of
    slices with :func:`merge_increments` — no data rescan.

    ``lg_k`` must match across slices that will be merged (sketch union
    requires a common configuration; 12 → ~1.6% rsd, 4 KB per column).
    ``quantile_k`` may differ per slice (grids merge by weight, not by
    position), but a common value keeps error analysis simple.
    """
    cols = list(cols or df.columns)
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    grid = [i / quantile_k for i in range(quantile_k + 1)]
    aggs = []
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"{c}__count"))
        aggs.append(F.count_if(F.col(c).isNull()).alias(f"{c}__nulls"))
        aggs.append(
            F.hll_sketch_agg(_hll_input(df, c), F.lit(lg_k)).alias(f"{c}__hll")
        )
        if c in numeric:
            aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
            aggs.append(F.sum(F.col(c).cast("double")).alias(f"{c}__sum"))
            aggs.append(
                F.percentile_approx(
                    F.col(c).cast("double"),
                    F.array(*[F.lit(q) for q in grid]),
                    F.lit(max(100, 4 * quantile_k)),
                ).alias(f"{c}__qgrid")
            )
    wide = df.agg(*aggs)
    rows = []
    for c in cols:
        fields = [
            F.lit(c).alias("column"),
            F.col(f"{c}__count").alias("count"),
            F.col(f"{c}__nulls").alias("nulls"),
        ]
        if c in numeric:
            fields += [
                F.col(f"{c}__min").alias("min"),
                F.col(f"{c}__max").alias("max"),
                F.col(f"{c}__sum").alias("sum"),
            ]
        else:
            fields += [
                F.lit(None).cast("double").alias("min"),
                F.lit(None).cast("double").alias("max"),
                F.lit(None).cast("double").alias("sum"),
            ]
        fields.append(F.col(f"{c}__hll").alias("ndv_sketch"))
        fields.append(
            (
                F.col(f"{c}__qgrid")
                if c in numeric
                else F.lit(None).cast("array<double>")
            ).alias("q_summary")
        )
        rows.append(F.struct(*fields))
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def _weighted_quantiles(grids, weights, qs):
    """Fold equi-depth grids into quantile values: every grid point of a
    slice with ``n`` non-null rows carries ``n / len(grid)`` mass; the
    merged CDF is interpolated at the requested ranks (midpoint rule)."""
    import numpy as np

    vals, ws = [], []
    for g, n in zip(grids, weights):
        if g is None or n <= 0 or len(g) == 0:
            continue
        vals.append(np.asarray(g, dtype="float64"))
        ws.append(np.full(len(g), n / len(g)))
    if not vals:
        return None
    v = np.concatenate(vals)
    w = np.concatenate(ws)
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cw = np.cumsum(w) - 0.5 * w
    total = w.sum()
    return np.interp([q * total for q in qs], cw, v)


def merge_increments(
    profiles: DataFrame,
    quantiles: Sequence[float] = _Q,
    keep_state: bool = False,
) -> DataFrame:
    """Fold slice profiles (union of :func:`profile_increment` outputs,
    any number of slices) into final per-column stats.

    Input size is #slices × #cols rows — merging is driver-trivial no
    matter how big the underlying data was. ``approx_distinct`` comes from
    the UNIONED sketch (one sketch that has seen every value once — never
    a sum of per-slice estimates, which would overcount shared values);
    the union estimate agrees with a single-pass sketch within the
    sketch's rsd, not bit-exactly (HIP vs composite estimator — see module
    docstring). Quantiles come from the weight-merged per-slice grids
    (rank error ~1/quantile_k + per-slice GK error).

    ``keep_state=True`` keeps the mergeable columns (``sum``,
    ``ndv_sketch``, and a re-compressed ``q_summary``) in the output, so
    merged rows can themselves be fed back into :func:`merge_increments`
    — hierarchical folds (days → months → total) without ever returning
    to the data.
    """
    has_q = "q_summary" in profiles.columns
    agg_cols = [
        F.sum("count").alias("count"),
        F.sum("nulls").alias("nulls"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
        F.sum("sum").alias("sum"),
        F.hll_union_agg("ndv_sketch").alias("__hll"),
    ]
    if has_q:
        agg_cols.append(
            F.collect_list(
                F.struct(
                    F.col("q_summary").alias("grid"),
                    # `count` is F.count(col) — already the NON-null row
                    # count, i.e. exactly the mass the grid summarizes;
                    # subtracting nulls again would under-weight (or with
                    # >50% nulls, negative-weight) null-bearing slices
                    F.col("count").alias("n"),
                )
            ).alias("__grids")
        )
    merged = profiles.groupBy("column").agg(*agg_cols)

    qnames = [f"q{int(q * 100):02d}" for q in quantiles]
    out = [
        "column",
        "count",
        "nulls",
        F.hll_sketch_estimate("__hll").alias("approx_distinct"),
        "min",
        "max",
        F.round(
            F.when(F.col("count") > 0, F.col("sum") / F.col("count")), 6
        ).alias("mean"),
    ]
    if has_q:
        # fold the grids with a tiny vectorized UDF: input is one row per
        # column (post-agg), each holding #slices compact grids — bytes,
        # not data. Recompute both the requested quantiles and (for
        # keep_state) a re-compressed grid in one pass.
        qs = list(quantiles)

        @F.pandas_udf(ArrayType(DoubleType()))
        def _fold_quantiles(grids: pd.Series) -> pd.Series:
            outv = []
            for slice_list in grids:
                if slice_list is None or len(slice_list) == 0:
                    outv.append(None)
                    continue
                gs = [s["grid"] for s in slice_list]
                ns = [s["n"] for s in slice_list]
                r = _weighted_quantiles(gs, ns, qs)
                outv.append(None if r is None else [float(x) for x in r])
            return pd.Series(outv)

        merged = merged.withColumn("__qvals", _fold_quantiles("__grids"))
        out += [
            F.round(F.col("__qvals").getItem(i), 6).alias(n)
            for i, n in enumerate(qnames)
        ]
    if keep_state:
        out += ["sum", F.col("__hll").alias("ndv_sketch")]
        if has_q:
            # re-compress the merged grids to a fresh equi-depth grid so
            # the output row is a valid profile_increment row again
            recompress_k = 128
            rq = [i / recompress_k for i in range(recompress_k + 1)]

            @F.pandas_udf(ArrayType(DoubleType()))
            def _recompress(grids: pd.Series) -> pd.Series:
                outv = []
                for slice_list in grids:
                    if slice_list is None or len(slice_list) == 0:
                        outv.append(None)
                        continue
                    gs = [s["grid"] for s in slice_list]
                    ns = [s["n"] for s in slice_list]
                    r = _weighted_quantiles(gs, ns, rq)
                    outv.append(None if r is None else [float(x) for x in r])
                return pd.Series(outv)

            out.append(_recompress("__grids").alias("q_summary"))
    return merged.select(*out)
