"""Blocked n-gram / token-set Jaccard near-dup pairs.

The exact-similarity companion to MinHash: for candidate generation use
minhash (sub-quadratic); this operator computes the *true* Jaccard on a
bounded pair set — either candidates from LSH or pairs blocked on a
grouping column.

Two physical strategies, picked by measured vocabulary size:

* **bitmap** (vocab ≤ ``max_bitmap_vocab``): dictionary-encode tokens to
  dense ids and pack each document's token set into an ``array<long>``
  bitmap (one 64-bit word per 64 vocab ids).  Pair comparison is then
  ``Σ bit_count(l[i] & r[i])`` via ``zip_with`` — pure whole-stage-codegen
  integer arithmetic, no per-pair string hashing.  On the documents table
  (vocab ≈ 31, 3.3M blocked pairs at sf0.1) this is ~6× faster than
  ``array_intersect`` on string arrays.
* **hashed-id array** (large vocab): each document's token set is carried
  as ``array<int>`` of 32-bit token hashes and pairs intersect the id
  arrays. No dictionary build (dense ids would need a data-sized global
  ranking — the exact single-reducer anti-pattern), no extra shuffle, and
  the pair payload through the candidate-scoring join is ~4× narrower
  than raw token strings AFTER shuffle compression (4-byte packed ints vs
  LZ4-compressed UTF8String arrays) — that payload width was the measured
  one-box ceiling at rehearsal mult 8 (SCALING.md, DEDUP_BENCH_r04.json:
  ~43M pairs × two raw token arrays overflowed the shuffle scratch; see
  ``_hashed_ids`` for the collision analysis and why 32 bits, and the
  scoring join for why it must be a shuffled-hash join, not sort-merge).
  The union size is derived as ``|A|+|B|-|A∩B|`` instead of materializing
  ``array_union`` (arrays are already distinct), halving the per-pair
  array work.

Both paths share a size prefilter — ``J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|)``,
so pairs whose sizes differ by more than the threshold ratio are dropped
before any set arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..textops.analysis import tokens

# 4096 vocab ids -> 64-long bitmap per doc; above this the per-row bitmap
# outweighs the per-pair savings and the string-array path wins
DEFAULT_MAX_BITMAP_VOCAB = 64 * 64

# below ~250k estimated pairs the bitmap's fixed cost (dictionary build +
# two extra shuffles) exceeds what it saves per pair (measured crossover
# between sf0.01's 33k pairs and sf0.1's 3.3M)
DEFAULT_MIN_BITMAP_PAIRS = 250_000

# Previous candidates-path PAYLOAD cache (one narrow id+ids/bitmap frame),
# released on the next call — the returned DataFrame is lazy, so a call
# can never release its own. The corpus-sized token-set cache never
# reaches this handoff: it is unpersisted INSIDE the call, right after
# the payload cache is eagerly populated (the r6 tightening of the r3
# one-call-lag contract; range_join dropped its module caches entirely
# the same round). Lock: calls from concurrent jobs must not unpersist
# each other's in-flight caches.
_last_candidates_caches: list = []
_caches_lock = __import__("threading").Lock()


def _token_sets(df: DataFrame, block_col: str, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        F.array_distinct(tokens(F.col(text_col))).alias("toks"),
    )


def _bitmap_encode(t: DataFrame, vocab_size: int) -> DataFrame:
    """(id, blk, sz, bm array<long>) — token sets as fixed-width bitmaps.

    The dictionary is dense-rank over the (small, counted) vocabulary; the
    single-partition window is bounded by ``max_bitmap_vocab`` rows.  Docs
    with no tokens keep an all-zero bitmap (sz = 0).
    """
    n_chunks = (vocab_size + 63) // 64
    vocab = (
        t.select(F.explode("toks").alias("tok"))
        .distinct()
        .withColumn("tid", F.row_number().over(Window.orderBy("tok")) - 1)
    )
    enc = (
        t.select("id", "blk", F.size("toks").alias("sz"), F.explode_outer("toks").alias("tok"))
        .join(F.broadcast(vocab), "tok", "left")
        .groupBy("id", "blk", "sz", (F.col("tid") / 64).cast("int").alias("chunk"))
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(tid % 64 AS INT))")).alias("w"))
    )
    return (
        enc.groupBy("id", "blk", "sz")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.when(F.col("chunk").isNotNull(), F.struct("chunk", "w"))
                )
            ).alias("m")
        )
        .select(
            "id",
            "blk",
            "sz",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_chunks - 1)),
                lambda c: F.coalesce(F.element_at("m", c), F.lit(0).cast("long")),
            ).alias("bm"),
        )
    )


def _bitmap_intersection(left: str, right: str):
    counts = F.zip_with(left, right, lambda a, b: F.bit_count(a.bitwiseAND(b)))
    return F.aggregate(counts, F.lit(0), lambda acc, x: acc + x)


def _hashed_ids(tok_col) -> F.Column:
    """Token set → ``array<int>`` of 32-bit token-hash ids. Pure codegen,
    no dictionary, no shuffle.

    32-bit (not 64) because hash values are incompressible: the shuffle
    files LZ4-compress string tokens ~1.5:1 but random hashes not at all,
    so 8-byte ids only matched compressed strings byte-for-byte (measured:
    the mult-8 rehearsal still overflowed scratch on long ids). 4-byte ids
    genuinely halve the pair payload. Collision cost at 32 bits: a
    1M-token vocabulary expects ~V²/2³³ ≈ 120 colliding token PAIRS
    globally, and a single cross-pair collision inflates a 130-token
    pair's Jaccard by ≤ 1/|A∪B| with probability ≈ |A|·|B|/2³² ≈ 4·10⁻⁶ —
    noise far below any dedup threshold's decision boundary."""
    # F.hash is Spark's native 32-bit Murmur3 — already INT, so no
    # ANSI-mode overflow from narrowing a 64-bit hash
    return F.array_distinct(F.transform(tok_col, lambda t: F.hash(t)))


def ngram_jaccard_pairs(
    df: DataFrame,
    block_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.2,
    num_partitions: int | None = None,
    max_bitmap_vocab: int = DEFAULT_MAX_BITMAP_VOCAB,
    min_bitmap_pairs: int = DEFAULT_MIN_BITMAP_PAIRS,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Token-set Jaccard ≥ threshold over one of two pair sources:

    * ``candidates`` — a DataFrame of (``{id_col}_l``, ``{id_col}_r``)
      candidate pairs (e.g. from :func:`..minhash.minhash_candidate_pairs`).
      This is THE scale path: pair volume is whatever the LSH tier emitted,
      never |block|², and the join back to token payloads is two plain hash
      joins on the id.
    * ``block_col`` — all same-block pairs via self-join. Quadratic *within
      block*; only for small-cardinality blocks. The self-join explodes
      (|block|² pairs from |block| rows), so the join parallelism is pinned
      — AQE would coalesce the tiny input shuffle and funnel millions of
      set comparisons through a few tasks.

    Exactly one of ``candidates`` / ``block_col`` must be given.
    """
    if (block_col is None) == (candidates is None):
        raise ValueError("pass exactly one of block_col / candidates")
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    if candidates is not None:
        from pyspark import StorageLevel

        # release the PREVIOUS call's payload cache (the returned
        # DataFrame is lazy, so a call can never release its own — the
        # handoff bounds the leak to ONE narrow frame per session)
        global _last_candidates_caches
        with _caches_lock:
            olds, _last_candidates_caches = _last_candidates_caches, []
        for old in olds:
            try:
                old.unpersist()
            except Exception:
                pass  # session of the old cache may already be gone

        # token sets are cached FIRST: the vocab count, the dictionary
        # build, and the bitmap encode each consume them — uncached, the
        # corpus would be re-tokenized (regex split over full text, the
        # expensive part at scale) three times
        raw = df.select(
            F.col(id_col).alias("id"),
            F.array_distinct(tokens(F.col(text_col))).alias("toks"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        t = raw
        # bitmap decision on vocab alone: counting the candidates would
        # execute the (expensive) candidate pipeline a second time, while
        # the vocab count is one cheap pass over the cached token sets
        vocab_size = t.select(F.explode("toks")).distinct().count()
        use_bitmap = 0 < vocab_size <= max_bitmap_vocab
        if use_bitmap:
            t = _bitmap_encode(t.withColumn("blk", F.lit(0)), vocab_size).drop("blk")
            payload = ["sz", "bm"]
        else:
            # large vocab: hashed-id arrays — the pair payload through the
            # scoring join is packed 32-bit ints, never raw token strings
            # (the measured mult-8 shuffle-scratch ceiling; 64-bit ids
            # were tried and still overflowed — see _hashed_ids)
            t = t.select(
                "id", _hashed_ids("toks").alias("hids")
            ).withColumn("sz", F.size("hids"))
            payload = ["sz", "hids"]
        # the payload table feeds BOTH join sides, and neither plan-time
        # nor AQE exchange reuse deduplicates the two subtrees (each
        # carries its own dictionary window) — without the persist the
        # encode pipeline genuinely executes twice (same trap as the
        # minhash signature self-join; measured 9.4s -> 6.0s at sf0.1 /
        # 12.3M candidates). Populate it EAGERLY so the corpus-sized
        # token-set cache can be dropped before this call returns —
        # only the narrow (id, sz, ids/bitmap) frame survives the call,
        # and lineage recompute after eviction re-derives it from the
        # (uncached) token projection, correctness unaffected.
        t = t.persist(StorageLevel.MEMORY_AND_DISK)
        t.count()
        raw.unpersist()
        with _caches_lock:
            _last_candidates_caches.append(t)
        cand = candidates.select(
            F.col(f"{id_col}_l").alias("id_l"), F.col(f"{id_col}_r").alias("id_r")
        )
        l = t.select(
            F.col("id").alias("id_l"), *[F.col(c).alias(f"{c}_l") for c in payload]
        )
        r = t.select(
            F.col("id").alias("id_r"), *[F.col(c).alias(f"{c}_r") for c in payload]
        )
        # Large-vocab path: SHUFFLE_HASH, not sort-merge — SMJ would SORT
        # the pair stream, spilling the wide (pair × id-array) rows
        # through UnsafeExternalSorter a second time, the very bytes the
        # id encoding just shrank (measured: the mult-8 rehearsal's
        # sorter spill overflowed scratch even with compact ids). The
        # build side is the doc-payload table (corpus-sized, partition
        # slices of it are executor-memory-sized); the pair stream is
        # only streamed. The bitmap path (small vocab ⇒ small corpus
        # payload table) is left unhinted so Catalyst can auto-broadcast
        # it — forcing SHJ there would add a needless doc-table shuffle.
        if not use_bitmap:
            l, r = l.hint("shuffle_hash"), r.hint("shuffle_hash")
        pairs = cand.join(l, on="id_l").join(r, on="id_r")
    else:
        t = _token_sets(df, block_col, text_col, id_col)
        n_rows = df.count()
        n_blocks = df.select(block_col).distinct().count()

        # uniform-blocks estimate; only pay the bitmap's fixed costs (vocab
        # count, dictionary build, two extra shuffles) when the pair volume
        # will amortize them
        est_pairs = n_rows * n_rows / (2 * max(n_blocks, 1))
        use_bitmap = est_pairs >= min_bitmap_pairs
        if use_bitmap:
            vocab_size = t.select(F.explode("toks")).distinct().count()
            use_bitmap = 0 < vocab_size <= max_bitmap_vocab
        if use_bitmap:
            t = _bitmap_encode(t, vocab_size)
            payload = ["sz", "bm"]
        else:
            t = t.select(
                "id", "blk", _hashed_ids("toks").alias("hids")
            ).withColumn("sz", F.size("hids"))
            payload = ["sz", "hids"]

        l = t.select(
            F.col("id").alias("id_l"), "blk", *[F.col(c).alias(f"{c}_l") for c in payload]
        )
        r = t.select(
            F.col("id").alias("id_r"), "blk", *[F.col(c).alias(f"{c}_r") for c in payload]
        )
        # salt the explosion: replicate the right side over k salt buckets and
        # split the left by id hash, so one language-block's pairs spread over
        # k × (block partitions) tasks instead of one
        k = max(1, num_partitions // max(n_blocks, 1))
        if k > 1:
            l = l.withColumn("__salt", F.pmod(F.hash("id_l"), F.lit(k)))
            r = r.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
            join_keys = ["blk", "__salt"]
        else:
            join_keys = ["blk"]
        l = l.repartition(num_partitions, *join_keys)

        pairs = (
            l.join(r, on=join_keys).drop("__salt").filter(F.col("id_l") < F.col("id_r"))
        )
    if threshold > 0:
        # J(A,B) <= min(|A|,|B|)/max(|A|,|B|): size-ratio prefilter
        pairs = pairs.filter(
            (F.col("sz_l") >= threshold * F.col("sz_r"))
            & (F.col("sz_r") >= threshold * F.col("sz_l"))
        )

    if use_bitmap:
        pairs = pairs.withColumn("__inter", _bitmap_intersection("bm_l", "bm_r"))
    else:
        pairs = pairs.withColumn("__inter", F.size(F.array_intersect("hids_l", "hids_r")))
    union = F.col("sz_l") + F.col("sz_r") - F.col("__inter")
    return (
        pairs.withColumn(
            "jaccard",
            F.when(union == 0, F.lit(0.0)).otherwise(F.col("__inter") / union),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("id_l").alias(f"{id_col}_l"),
            F.col("id_r").alias(f"{id_col}_r"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )
