"""SimHash near-duplicate detection (32-bit, token-level).

Each token hashes to 32 bits (built-in xxhash64 truncated); per document,
each bit position accumulates +1/-1; the sign pattern is the simhash.
Candidate pairs: pigeonhole over 4 byte-chunks (hamming distance ≤ 3
guarantees ≥1 identical chunk), then exact ``bit_count(xor)`` filter.

All JVM built-ins: explode → groupBy(doc) with 32 conditional sums →
chunk join. The chunk join is equivalent to 4 hash-partitioned self-joins.
"""

from __future__ import annotations

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
) -> DataFrame:
    """(id, simhash int) per document; empty docs hash to 0.

    ``hash_fn``: "xxhash64" (fastest, JVM-native) or "md5" (portable —
    reproducible in DuckDB/any engine with md5, used by the oracle-checked
    catalog entry). Both are JVM built-ins; md5 costs ~2× per token."""
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


def simhash_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with hamming(simhash_l, simhash_r) <= max_hamming.

    Requires max_hamming < _CHUNKS so the pigeonhole blocking is lossless:
    with 4 chunks and ≤3 differing bits, at least one chunk is identical.
    """
    if max_hamming >= _CHUNKS:
        raise ValueError("max_hamming must be < number of chunks (4)")
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
