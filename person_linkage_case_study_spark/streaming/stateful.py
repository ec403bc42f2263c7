"""Custom stateful streaming operators (``applyInPandasWithState``).

The built-in streaming state ops (``dropDuplicates``, ``session_window``)
cover the common cases; this module is the explicit-state escape hatch
the brief's training-data pipeline needs — continuous dedup where the
seen-set must persist across micro-batches and be eviction-controlled.

Scale shape: state is keyed by the dedup fingerprint, so it shards with
the stream's shuffle partitioning; per-key state is one counter (16
bytes), and the Arrow batches flowing through the Python worker carry
only the groups present in the current micro-batch, not the state store.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-content fingerprint (md5) — the dedup key. Computed JVM-side
    before the stateful shuffle so only (fingerprint, payload) rows flow."""
    return df.withColumn("fingerprint", F.md5(F.col(text_col)))


def streaming_first_seen_dedup(
    docs: DataFrame,
    key_col: str = "fingerprint",
    order_col: str = "doc_id",
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Emit only the first-seen row per ``key_col`` across the life of the
    stream (within a micro-batch, the lowest ``order_col`` wins; across
    micro-batches, arrival order wins — streaming semantics, unlike the
    batch min-id twin).

    State per key is a single seen-count. ``ttl_minutes`` evicts idle
    keys via processing-time timeout — the knob that bounds state size
    for unbounded key domains (an evicted key's next occurrence is
    treated as first-seen again).
    """
    out_schema = docs.schema
    state_schema = T.StructType([T.StructField("n_seen", T.LongType())])
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )

    def dedup(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.get[0] if state.exists else 0
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(order_col)
            if seen == 0:
                yield pdf.iloc[[0]]
            state.update((int(seen + len(pdf)),))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)

    return docs.groupBy(key_col).applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )
