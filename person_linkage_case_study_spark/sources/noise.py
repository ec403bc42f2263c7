"""Seeded custom noise generators (SURVEY.md §2.11 X3).

The reference's notebook-02 custom noise layer (02_generate_case_study_files
.ipynb:268-386) applies three pandas transforms per partition with a
partition-derived seed (``seed + partition_number * 10_000``, cell 20):

- ``split_columns_incorrectly`` — re-split a person's full name into the
  name columns at random token boundaries (models badly parsed names);
- ``shuffle_columns``           — permute the name columns within a row
  (models first/last swaps);
- ``truncate_column``           — keep the first N characters of a column
  on a random subset of cells (models the IRS 4-char last-name records).

Spark-first shape: each transform is a ``mapInPandas`` over the DataFrame
with the SAME per-partition seeding contract — one rng per partition,
seeded ``seed + spark_partition_id() * 10_000``, consumed sequentially
across the partition's Arrow batches. Noise is therefore deterministic for
a fixed partitioning (exactly the reference's Dask ``map_partitions``
semantics — repartitioning changes the draw, same as theirs).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PID = "__noise_pid"


def _map_with_partition_rng(df: DataFrame, transform) -> DataFrame:
    """Run ``transform(pdf, rng) -> pdf`` over every row with one
    numpy Generator per partition (reference cell 20 seeding)."""
    # noise can blank a value the upstream plan proved non-null (e.g. a
    # name built by concat of literals); declare every field nullable or
    # downstream codegen NPEs on the null it was promised never to see
    schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in df.schema.fields]
    )

    def apply(batches):
        rng = None
        for pdf in batches:
            if rng is None and len(pdf):
                rng = np.random.default_rng(transform.seed + int(pdf[_PID].iloc[0]) * 10_000)
            if len(pdf):
                yield transform(pdf.drop(columns=[_PID]), rng)

    out = df.withColumn(_PID, F.spark_partition_id()).mapInPandas(apply, schema)
    return out


class _Transform:
    """Callable carrying its base seed (read by the partition wrapper)."""

    def __init__(self, fn, seed: int):
        self._fn = fn
        self.seed = seed

    def __call__(self, pdf, rng):
        return self._fn(pdf, rng)


def split_columns_incorrectly(
    df: DataFrame, columns: list[str], row_probability: float, seed: int = 1234
) -> DataFrame:
    """Re-split the concatenated name into ``columns`` at random token
    boundaries for a ``row_probability`` subset of rows (reference
    02:268-338). Token multiset is preserved: join with spaces, split on
    space/hyphen, cut at ``len(columns)-1`` random points."""

    def fn(pdf: pd.DataFrame, rng) -> pd.DataFrame:
        mask = rng.random(len(pdf)) < row_probability
        if not mask.any():
            return pdf
        pdf = pdf.copy()
        sel = pdf.loc[mask, columns].fillna("")
        full = sel.agg(" ".join, axis=1).str.strip()
        n_cols = len(columns)
        for ridx, name in zip(sel.index, full):
            toks = [t for t in re.split("[ -]", name) if t != ""]
            n_seps = max(len(toks) - 1, 0)
            cuts = np.ceil(np.sort(rng.random(n_cols - 1)) * n_seps).astype(int)
            bounds = [0, *cuts.tolist(), len(toks)]
            for ci, col in enumerate(columns):
                pdf.at[ridx, col] = " ".join(toks[bounds[ci] : bounds[ci + 1]]) or None
        return pdf

    return _map_with_partition_rng(df, _Transform(fn, seed))


def shuffle_columns(
    df: DataFrame, columns: list[str], row_probability: float, seed: int = 1234
) -> DataFrame:
    """Randomly permute ``columns`` within a ``row_probability`` subset of
    rows (reference 02:338-351) — vectorized argsort-of-uniforms, exactly
    the reference's draw shape."""

    def fn(pdf: pd.DataFrame, rng) -> pd.DataFrame:
        mask = rng.random(len(pdf)) < row_probability
        if not mask.any():
            return pdf
        pdf = pdf.copy()
        vals = pdf.loc[mask, columns].values
        order = np.argsort(rng.random(vals.shape), axis=1)
        pdf.loc[mask, columns] = np.take_along_axis(vals, order, axis=1)
        return pdf

    return _map_with_partition_rng(df, _Transform(fn, seed))


def truncate_column(
    df: DataFrame,
    column: str,
    cell_probability: float,
    truncation_length: int,
    seed: int = 1234,
) -> DataFrame:
    """Truncate ``column`` to its first ``truncation_length`` characters on
    a ``cell_probability`` subset of cells (reference 02:351-364 — note the
    reference hard-codes ``last_name`` as the target regardless of its
    ``column`` argument; this implementation honors the argument)."""

    def fn(pdf: pd.DataFrame, rng) -> pd.DataFrame:
        mask = rng.random(len(pdf)) < cell_probability
        if not mask.any():
            return pdf
        pdf = pdf.copy()
        pdf.loc[mask, column] = pdf.loc[mask, column].str[:truncation_length]
        return pdf

    return _map_with_partition_rng(df, _Transform(fn, seed))
