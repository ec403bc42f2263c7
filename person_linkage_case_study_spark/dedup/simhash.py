"""SimHash near-duplicate detection (32-bit, token-level).

Each token hashes to 32 bits (built-in xxhash64 truncated); per document,
each bit position accumulates +1/-1; the sign pattern is the simhash.
Candidate pairs: pigeonhole over 4 byte-chunks (hamming distance ≤ 3
guarantees ≥1 identical chunk), then exact ``bit_count(xor)`` filter.

All JVM built-ins: explode → groupBy(doc) with 32 conditional sums →
chunk join. The chunk join is equivalent to 4 hash-partitioned self-joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..textops.analysis import tokens

_BITS = 32
_CHUNKS = 4


# portable 32-bit md5 hash (== DuckDB md5_number_lower & 0xFFFFFFFF);
# shared with deterministic sampling — see functions/hashing.py
from ..functions.hashing import md5_hash32 as _md5_hash32  # noqa: E402


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
    engine: str = "arrow",
) -> DataFrame:
    """(id, simhash int) per document; docs with no tokens yield no row.

    ``hash_fn``: "xxhash64" (fastest, JVM-native) or "md5" (portable —
    reproducible in DuckDB/any engine with md5, used by the oracle-checked
    catalog entry). Both are JVM built-ins; md5 costs ~2× per token.

    ``engine``: like minhash (see dedup/minhash.py), the signature is
    row-local, so the default "arrow" engine needs NO shuffle: one JVM
    projection hashes the tokens, a numpy pandas UDF bit-unpacks and
    sign-sums per document (``np.add.reduceat`` per bit over the
    flattened batch). "agg" keeps the explode → groupBy 32-conditional-sum
    formulation (one shuffle on doc id); bit-parity between the two is
    pinned in tests/test_dedup.py. NULL-text and zero-token docs are
    dropped by both engines (agg at explode; arrow by a post-UDF NULL
    filter, which sits above the Python-eval barrier and therefore cannot
    be pushed down into a re-evaluation of the tokenizer — see the
    pushdown trap documented in dedup/minhash.py)."""
    if engine == "arrow":
        return _simhash_arrow(df, text_col, id_col, hash_fn)
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    if hash_fn == "md5":
        h = tok.select(id_col, _md5_hash32(F.col("token")).alias("h"))
    else:
        h = tok.select(id_col, F.xxhash64(F.col("token")).alias("h"))
    sums = h.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                    -1
                )
            ).alias(f"b{i}")
            for i in range(_BITS)
        ]
    )
    sig = None
    for i in range(_BITS):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sums.select(F.col(id_col), sig.alias("simhash"))


def _simhash_arrow(
    df: DataFrame, text_col: str, id_col: str, hash_fn: str
) -> DataFrame:
    """Zero-shuffle simhash: JVM token hashes → numpy bit sign-sums."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _sig(xs: pd.Series) -> pd.Series:
        out = np.full(len(xs), -1, dtype=np.int64)  # -1 = no tokens → NULL
        lens = np.fromiter(
            (len(v) if v is not None else 0 for v in xs),
            dtype=np.int64,
            count=len(xs),
        )
        keep = lens > 0
        if keep.any():
            flat = np.concatenate(
                [np.asarray(v, dtype=np.int64) for v, k in zip(xs, keep) if k]
            )
            klens = lens[keep]
            starts = np.zeros(len(klens), dtype=np.int64)
            np.cumsum(klens[:-1], out=starts[1:])
            sig = np.zeros(len(klens), dtype=np.int64)
            for i in range(_BITS):
                # +1 where bit set, -1 where clear: 2*popsum - n
                bitsum = 2 * np.add.reduceat((flat >> i) & 1, starts) - klens
                sig |= (bitsum > 0).astype(np.int64) << i
            out[keep] = sig
        res = pd.Series(out, dtype="Int64")
        res[~keep] = pd.NA
        return res

    # `text RLIKE '\S'` ⟺ the tokenizer yields ≥1 token (split on \s+
    # drops empty strings), so this scan-level filter replaces a post-UDF
    # NULL filter. Filtering the UDF output instead is a trap twice over:
    # the predicate is pushed below the repartition with its OWN duplicate
    # ArrowEvalPython node — tokenizer AND kernel run twice (measured
    # 6.1s vs 0.9s at sf0.1).
    spread = (
        df.select(id_col, text_col)
        .filter(F.col(text_col).isNotNull() & F.col(text_col).rlike(r"\S"))
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )
    tok = spread.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    if hash_fn == "md5":
        from ..functions.hashing import md5_hash32_hof

        hashed = tok.select(
            F.col(id_col), md5_hash32_hof(F.col("__toks")).alias("__hs")
        )
    else:
        hashed = tok.select(
            F.col(id_col),
            F.transform(F.col("__toks"), lambda t: F.xxhash64(t)).alias("__hs"),
        )
    # no post-UDF NULL filter needed: the rlike prefilter guarantees ≥1
    # token, so the kernel's NA branch is unreachable from this plan
    return hashed.select(F.col(id_col), _sig(F.col("__hs")).alias("simhash"))


def simhash_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash_l, simhash_r) <= max_hamming.

    Requires max_hamming < _CHUNKS so the pigeonhole blocking is lossless:
    with 4 chunks and ≤3 differing bits, at least one chunk is identical.

    ``materialize`` persists ``sigs`` before the chunk self-join —
    sub-plans with a Python UDF node defeat exchange reuse, so without it
    the signature pipeline runs once per join side (see
    minhash_candidate_pairs).
    """
    if max_hamming >= _CHUNKS:
        raise ValueError("max_hamming must be < number of chunks (4)")
    if materialize:
        from pyspark import StorageLevel

        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    bits_per_chunk = _BITS // _CHUNKS
    chunked = sigs.select(
        F.col(id_col).alias("id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_idx"),
                        F.shiftright(F.col("simhash"), c * bits_per_chunk)
                        .bitwiseAND(F.lit((1 << bits_per_chunk) - 1))
                        .alias("chunk_val"),
                    )
                    for c in range(_CHUNKS)
                ]
            )
        ).alias("ch"),
    ).select("id", "simhash", "ch.chunk_idx", "ch.chunk_val")

    l = chunked.select(
        F.col("id").alias("id_l"), F.col("simhash").alias("sim_l"), "chunk_idx", "chunk_val"
    )
    r = chunked.select(
        F.col("id").alias("id_r"), F.col("simhash").alias("sim_r"), "chunk_idx", "chunk_val"
    )
    pairs = (
        l.join(r, on=["chunk_idx", "chunk_val"])
        .filter(F.col("id_l") < F.col("id_r"))
        .dropDuplicates(["id_l", "id_r"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("sim_l").bitwiseXOR(F.col("sim_r"))),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.select(
        F.col("id_l").alias(f"{id_col}_l"),
        F.col("id_r").alias(f"{id_col}_r"),
        "hamming",
    )
