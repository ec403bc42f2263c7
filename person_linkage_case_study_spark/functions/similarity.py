"""String & vector similarity (SURVEY.md §2.8 F11, §2.11 X2; dedup/ANN support).

Jaro-Winkler: the reference gets it from Splink's bundled Scala UDF jar on
Spark (distributed_compute.py:993-996) or DuckDB natively. Spark SQL has no
built-in, so we ship an Arrow-batched pandas UDF over a pure-Python
implementation of the standard algorithm (Winkler 1990: prefix bonus capped
at 4 chars, scaling 0.1, boost threshold 0.7) — semantics match DuckDB's
``jaro_winkler_similarity`` so the correctness oracle can diff us directly.

Token-set Jaccard and cosine similarity are pure built-in column
expressions (JVM-side, codegen) — the fast path for document dedup and ANN.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def jaro_similarity(s1: str, s2: str) -> float:
    """Jaro similarity of two strings.

    Conventions follow DuckDB's ``jaro_similarity`` exactly (our
    correctness oracle): empty vs anything — including empty vs empty —
    scores 0.0, and the transposition count is integer-halved.
    """
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(max(len1, len2) // 2 - 1, 0)
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, ch in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == ch:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                transpositions += 1
            j += 1
    t = transpositions // 2
    m = matches
    return (m / len1 + m / len2 + (m - t) / m) / 3


def jaro_winkler_similarity(
    s1: str | None, s2: str | None, prefix_weight: float = 0.1
) -> float | None:
    """Jaro-Winkler with the conventional 0.7 boost threshold and 4-char
    prefix cap (matches DuckDB/jellyfish for ASCII inputs)."""
    if s1 is None or s2 is None:
        return None
    jaro = jaro_similarity(s1, s2)
    if jaro > 0.7:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a == b:
                prefix += 1
            else:
                break
        jaro += prefix * prefix_weight * (1 - jaro)
    return jaro


@pandas_udf(DoubleType())
def jaro_winkler_udf(left: pd.Series, right: pd.Series) -> pd.Series:
    """F11/X2: Arrow-vectorized Jaro-Winkler; NULL if either side NULL
    (Splink comparison levels treat NULL as its own gamma level)."""
    out = [
        jaro_winkler_similarity(l, r) if (l is not None and r is not None) else None
        for l, r in zip(left, right)
    ]
    return pd.Series(out, dtype="float64")


def jaccard_tokens(left: Column, right: Column) -> Column:
    """Token-set Jaccard similarity of two array<string> columns — pure
    built-ins (array_intersect/array_union), JVM-side. Empty∪empty → 0.0."""
    inter = F.size(F.array_intersect(left, right))
    union = F.size(F.array_union(left, right))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def cosine_similarity(left: Column, right: Column) -> Column:
    """Cosine similarity of two array<numeric> columns via
    ``zip_with`` + ``aggregate`` — stays in the JVM, no UDF.

    Returns NULL if either vector is NULL; 0.0 if either norm is 0.
    """
    def dot(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    num = dot(left, right)
    denom = F.sqrt(dot(left, left)) * F.sqrt(dot(right, right))
    return F.when(denom == 0, F.lit(0.0)).otherwise(num / denom)
