"""Sequence packing — assemble documents into fixed-token-budget training
sequences (the LLM-pretraining packing step), 100 TB-shaped.

Contiguous-fill packing: documents take their deterministic content-hash
order (operators/sampling.hash_shuffle's order), and a document joins
sequence ``floor(tokens_before_it / target)``. The order, and therefore
every sequence's contents, is identical across partitionings, retries,
and engines.

Distributed shape — ONE range exchange, no global window:

1. range-partition + sort by the content hash (the only shuffle);
2. within-partition running token sums via ``mapInPandas`` (Arrow batches,
   a running counter per partition — cumulative sums are the case where a
   narrow Python pass beats the built-in alternative, because a window
   over the whole order would funnel 100 TB through one reducer and a
   pid-partitioned window would re-shuffle everything);
3. per-partition token totals (tiny agg) → broadcast cumulative offsets;
4. ``seq_id = floor((offset + within_cum_before) / target)`` — exact
   integer arithmetic, DuckDB-replicable as a SQL window over the same
   order (the oracle for ``pack_documents_into_sequences``).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import md5_hash32
from ..operators.sampling import _key, _key_sql


def pack_sequences(
    df: DataFrame,
    key_cols: Sequence[str],
    token_col: str,
    target_tokens: int,
    seed: int = 0,
    seq_col: str = "seq_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``seq_col``: the training-sequence index this document packs
    into under a ``target_tokens`` budget, in deterministic hash order."""
    from pyspark.sql import Window

    h = md5_hash32(_key(seed, key_cols))
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    order_cols = ["__h", *key_cols]
    ordered = (
        df.withColumn("__h", h)
        .repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.shiftrightunsigned(F.monotonically_increasing_id(), 33))
    )

    fields = ordered.schema.fields
    out_schema = T.StructType(fields + [T.StructField("__cum_before", T.LongType())])

    def running(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one partition per iterator; batches arrive in partition order
        total = 0
        for pdf in it:
            toks = pdf[token_col].fillna(0).astype("int64")
            cum = toks.cumsum()
            pdf = pdf.assign(__cum_before=(cum - toks + total).astype("int64"))
            total += int(toks.sum())
            yield pdf

    with_cum = ordered.mapInPandas(running, out_schema)

    part_totals = ordered.groupBy("__pid").agg(
        F.sum(F.coalesce(F.col(token_col), F.lit(0))).alias("__cnt")
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = part_totals.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
    ).select("__pid", "__off")

    return (
        with_cum.join(F.broadcast(offsets), on="__pid")
        .withColumn(
            seq_col,
            F.floor((F.col("__off") + F.col("__cum_before")) / target_tokens).cast("long"),
        )
        .drop("__h", "__pid", "__cum_before", "__off")
    )


def pack_sequences_sql(
    key_cols: Sequence[str], token_col: str, target_tokens: int, seed: int = 0
) -> str:
    """DuckDB expression for ``pack_sequences``'s sequence index — a window
    cumsum over the same content-hash total order."""
    tiebreak = ", ".join(key_cols)
    cum_before = (
        f"coalesce(sum(coalesce({token_col}, 0)) OVER ("
        f"ORDER BY {_key_sql(seed, key_cols)}, {tiebreak} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
    )
    return f"CAST(floor({cum_before} / {target_tokens}) AS BIGINT)"
