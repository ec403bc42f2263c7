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
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

_Q = (0.25, 0.5, 0.75)


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    quantiles: Sequence[float] = _Q,
    rel_err: float = 0.01,
) -> DataFrame:
    """One-pass profile: DataFrame with a row per profiled column —
    ``(column, count, nulls, approx_distinct, min, max, mean, q_*)``.

    min/max/mean/quantiles are null for non-numeric columns (min/max on
    strings would force full-string comparisons through the aggregate;
    profile those via NDV + nulls, or cast explicitly if needed).
    """
    cols = list(cols or df.columns)
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
            aggs.append(
                F.percentile_approx(
                    F.col(c).cast("double"),
                    F.array(*[F.lit(q) for q in quantiles]),
                    F.lit(max(2, int(1.0 / rel_err))),
                ).alias(f"{c}__qs")
            )
    wide = df.agg(*aggs)

    # unpivot the 1-row wide aggregate: #cols structs, driver-side shape only
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
                *[F.lit(None).cast("double").alias(n) for n in qnames],
            ]
        rows.append(F.struct(*fields))
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
