"""Exact deduplication — hash-groupBy keep-first.

One shuffle on the content hash; at 100 TB the md5 is computed map-side
and only (hash, id) pairs shuffle if you project first, which
``exact_dedup`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Return one keeper row per distinct ``text_col`` value (lowest id),
    with the duplicate count. Only (fingerprint, id) shuffle — the text
    stays at the mappers."""
    fp = df.select(
        F.md5(F.col(text_col).cast("binary")).alias("fingerprint"), F.col(id_col)
    )
    return fp.groupBy("fingerprint").agg(
        F.min(id_col).alias(f"keeper_{id_col}"),
        F.count(F.lit(1)).alias("n_copies"),
    )
