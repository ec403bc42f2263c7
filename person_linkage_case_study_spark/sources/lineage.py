"""Lineage pair tables (SURVEY.md §1.1).

The reference tracks which raw records contributed to each derived
reference-file row with a long-format ``(record_id, source_record_id)``
table maintained through merges/dedupes/concats
(02_generate_case_study_files.ipynb:286-298,312-365,368-413). The same
relational design works unchanged on Spark; the fold below is the J5
"multi-way accumulating merge" re-expressed as chained outer joins plus
``unionByName`` on the lineage side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def new_lineage(df: DataFrame, record_id: str = "record_id") -> DataFrame:
    """Seed lineage: every row is its own source."""
    return df.select(
        F.col(record_id).alias("record_id"),
        F.col(record_id).alias("source_record_id"),
    )


def merge_preserving_source_records(
    tables: Sequence[tuple[DataFrame, DataFrame]],
    key: str,
    record_id: str = "record_id",
) -> tuple[DataFrame, DataFrame]:
    """J5: fold N ``(table, lineage)`` pairs by ``key``, re-keying the merged
    record id and unioning lineage at each step
    (reference 02_generate_case_study_files.ipynb:312-365).

    Each step full-outer-joins the accumulator with the next table on
    ``key``; the merged row's record_id is ``coalesce(left_id, right_id)``
    and both sides' lineage rows are re-pointed at it. Column conflicts are
    resolved left-preferentially with ``coalesce`` (the reference keeps the
    first non-null by merge order).

    Returns ``(merged_table, merged_lineage)``.
    """
    if not tables:
        raise ValueError("need at least one (table, lineage) pair")
    acc, acc_lin = tables[0]
    for nxt, nxt_lin in tables[1:]:
        l = acc.alias("l")
        r = nxt.alias("r")
        joined = l.join(r, on=key, how="full_outer")
        merged_id = F.coalesce(F.col(f"l.{record_id}"), F.col(f"r.{record_id}"))
        # remap both lineages onto the surviving record_id
        id_map_l = joined.select(
            F.col(f"l.{record_id}").alias("old_id"), merged_id.alias("new_id")
        ).where(F.col("old_id").isNotNull())
        id_map_r = joined.select(
            F.col(f"r.{record_id}").alias("old_id"), merged_id.alias("new_id")
        ).where(F.col("old_id").isNotNull())
        acc_lin = (
            acc_lin.join(id_map_l, acc_lin["record_id"] == id_map_l["old_id"], "inner")
            .select(F.col("new_id").alias("record_id"), "source_record_id")
            .unionByName(
                nxt_lin.join(id_map_r, nxt_lin["record_id"] == id_map_r["old_id"], "inner")
                .select(F.col("new_id").alias("record_id"), "source_record_id")
            )
            .dropDuplicates()
        )
        # merge data columns: left wins where present
        out_cols = [F.col(key), merged_id.alias(record_id)]
        l_cols = [c for c in acc.columns if c not in (key, record_id)]
        r_cols = [c for c in nxt.columns if c not in (key, record_id)]
        for c in l_cols:
            if c in r_cols:
                out_cols.append(F.coalesce(F.col(f"l.{c}"), F.col(f"r.{c}")).alias(c))
            else:
                out_cols.append(F.col(f"l.{c}").alias(c))
        for c in r_cols:
            if c not in l_cols:
                out_cols.append(F.col(f"r.{c}").alias(c))
        acc = joined.select(*out_cols)
    return acc, acc_lin
