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

from pyspark.sql import DataFrame
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


def register_cache_for_release(df: DataFrame) -> None:
    """Enroll a persisted frame in the one-call-lag release contract:
    it is unpersisted when the NEXT ``ngram_jaccard_pairs(candidates=)``
    call (or ``release_previous_caches()``) starts. For composed
    pipelines (``dedup.pipeline``) whose auxiliary caches must outlive
    the lazy returned DataFrame but not the next invocation."""
    with _caches_lock:
        _last_candidates_caches.append(df)


def release_previous_caches() -> None:
    """Unpersist the previous invocation's registered caches NOW.

    Composed pipelines must call this BEFORE persisting their own
    frames: successive invocations build byte-identical logical plans,
    and Spark's CacheManager keys cache entries BY plan — persisting
    generation N+1 first is a no-op against generation N's entry
    ("already cached"), after which the deferred release drops that one
    shared entry and every consumer silently recomputes (measured: 3
    concurrent single-task rebuilds of the group frame, ~10s of a 17s
    wall, before the ordering was fixed in r15)."""
    global _last_candidates_caches
    with _caches_lock:
        olds, _last_candidates_caches = _last_candidates_caches, []
    for old in olds:
        try:
            old.unpersist()
        except Exception:
            pass  # session of the old cache may already be gone


def _token_sets(df: DataFrame, block_col: str, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        F.array_distinct(tokens(F.col(text_col))).alias("toks"),
    )


def _collect_vocab(t: DataFrame, max_vocab: int) -> list[str] | None:
    """The bitmap-path dictionary, collected to the driver: the sorted
    distinct tokens IF there are ≤ ``max_vocab`` of them, else ``None``.
    Bounded driver transfer (``limit(max_vocab + 1)``, ≤ 4097 rows at
    the default cap — dimension-table scale, not data scale); one job
    replaces the former separate ``distinct().count()`` probe AND the
    single-partition ``row_number`` window that built the dictionary as
    a second pass (r15: two serialized driver-latency jobs → one)."""
    rows = (
        t.select(F.explode("toks").alias("tok"))
        .distinct()
        .limit(max_vocab + 1)
        .collect()
    )
    if len(rows) > max_vocab:
        return None
    return sorted(r["tok"] for r in rows)


def _bitmap_encode(
    t: DataFrame, vocab: list[str], extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(id, blk, sz, bm array<long>) — token sets as fixed-width bitmaps.

    ``vocab`` is the driver-collected sorted dictionary (see
    ``_collect_vocab``); ids are its indices. One broadcast join tags
    each exploded token, then ONE groupBy builds all chunk words with
    per-chunk ``bit_or`` aggregates (r15: was groupBy(chunk) +
    map_from_entries regroup — two shuffles and an interpreted-HOF
    reassembly). Docs with no tokens keep an all-zero bitmap (sz = 0:
    ``bit_or`` sees only NULLs, coalesced to 0)."""
    n_chunks = (len(vocab) + 63) // 64
    vocab_df = t.sparkSession.createDataFrame(
        [(tok, i) for i, tok in enumerate(vocab)], "tok string, tid int"
    )
    enc = (
        t.select(
            "id", "blk", *extra_cols,
            F.size("toks").alias("sz"), F.explode_outer("toks").alias("tok"),
        )
        .join(F.broadcast(vocab_df), "tok", "left")
        .groupBy("id", "blk", *extra_cols, "sz")
        .agg(
            *[
                F.bit_or(
                    F.when(
                        (F.col("tid") / 64).cast("int") == c,
                        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(tid % 64 AS INT))"),
                    )
                ).alias(f"__w{c}")
                for c in range(n_chunks)
            ]
        )
    )
    return enc.select(
        "id",
        "blk",
        *extra_cols,
        "sz",
        F.array(
            *[
                F.coalesce(F.col(f"__w{c}"), F.lit(0).cast("long"))
                for c in range(n_chunks)
            ]
        ).alias("bm"),
    )


def _bitmap_intersection(left: str, right: str, n_chunks: int):
    """Σ bit_count(l[c] & r[c]), statically unrolled over the (plan-time
    known, ≤ 64) chunk count — whole-stage-codegen integer arithmetic.
    The former ``zip_with`` + ``aggregate`` HOF form was interpreted
    per pair (lambda eval, no codegen): on 12.3M candidate pairs the
    unroll is the difference between an expression and a per-row
    interpreter loop (r15, guide §4.1 'prefer built-ins/codegen')."""
    out = F.bit_count(
        F.element_at(left, 1).bitwiseAND(F.element_at(right, 1))
    )
    for c in range(1, n_chunks):
        out = out + F.bit_count(
            F.element_at(left, c + 1).bitwiseAND(F.element_at(right, c + 1))
        )
    return out


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
    tokens_col: str | None = None,
    carry_cols: list[str] | None = None,
    eager_payload: bool = False,
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

    ``tokens_col`` (candidates path only): name of a column of ``df``
    already holding the DISTINCT token array (``array_distinct(tokens
    (text))`` equivalent). The scorer then skips its own tokenize pass
    AND its token-set persist — the caller's (typically cached) column
    is the source of truth; the narrow encoded payload is persisted
    lazily and released on the next call as usual (r15, for composed
    pipelines whose group-collapse already materialized the sets).

    ``carry_cols`` (candidates path only): extra columns of ``df``
    carried through the scoring joins onto each surviving pair as
    ``{col}_l`` / ``{col}_r``. They ride the SAME two payload joins the
    scorer already performs (post-candidate-distinct, pre-threshold —
    never through an extra exchange), which is how the collapsed
    pipeline attaches group member lists without two more joins and
    their broadcast builds (r15).

    ``eager_payload`` (candidates + ``tokens_col`` path only, r16):
    populate the narrow encoded-payload cache with one count job before
    returning, instead of lazily on the first action. On its own this
    is a wash (same work, one more driver job); it exists so a composed
    pipeline can run this call's whole chain (vocab collect → encode →
    populate) in one thread CONCURRENTLY with an independent chain
    (guide §2.6 — dedup/pipeline.py overlaps it with the LSH band
    join), instead of the final action serializing the payload build
    behind the candidate build."""
    if (block_col is None) == (candidates is None):
        raise ValueError("pass exactly one of block_col / candidates")
    if (tokens_col or carry_cols) and candidates is None:
        raise ValueError("tokens_col / carry_cols require the candidates path")
    if eager_payload and tokens_col is None:
        raise ValueError("eager_payload requires the tokens_col path")
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    if candidates is not None:
        from pyspark import StorageLevel

        # release the PREVIOUS call's payload cache (the returned
        # DataFrame is lazy, so a call can never release its own — the
        # handoff bounds the leak to ONE narrow frame per session)
        release_previous_caches()

        # token sets are cached FIRST: the vocab count, the dictionary
        # build, and the bitmap encode each consume them — uncached, the
        # corpus would be re-tokenized (regex split over full text, the
        # expensive part at scale) three times. With ``tokens_col`` the
        # caller already materialized (and typically cached) the sets,
        # so no tokenize and no scorer-side set cache at all.
        carry = tuple(carry_cols or ())
        manage_raw = tokens_col is None
        if manage_raw:
            raw = df.select(
                F.col(id_col).alias("id"),
                F.array_distinct(tokens(F.col(text_col))).alias("toks"),
                *carry,
            ).persist(StorageLevel.MEMORY_AND_DISK)
        else:
            # NULL token arrays would silently yield sz = size(NULL) = -1,
            # corrupting the size-ratio prefilter and the union math for
            # any pair touching that id (r15 ADVICE) — drop them, same
            # contract as minhash's tokens_col path and the text path's
            # isNotNull filter
            raw = df.select(
                F.col(id_col).alias("id"), F.col(tokens_col).alias("toks"), *carry
            ).filter(F.col("toks").isNotNull())
        t = raw
        # bitmap decision on vocab alone: counting the candidates would
        # execute the (expensive) candidate pipeline a second time, while
        # the vocab probe is one cheap pass over the cached token sets
        # (and doubles as the dictionary collect — see _collect_vocab)
        vocab = _collect_vocab(t, max_bitmap_vocab)
        use_bitmap = vocab is not None and len(vocab) > 0
        n_chunks = (len(vocab) + 63) // 64 if use_bitmap else 0
        if use_bitmap:
            t = _bitmap_encode(
                t.withColumn("blk", F.lit(0)), vocab, extra_cols=carry
            ).drop("blk")
            payload = ["sz", "bm", *carry]
        else:
            # large vocab: hashed-id arrays — the pair payload through the
            # scoring join is packed 32-bit ints, never raw token strings
            # (the measured mult-8 shuffle-scratch ceiling; 64-bit ids
            # were tried and still overflowed — see _hashed_ids)
            t = t.select(
                "id", _hashed_ids("toks").alias("hids"), *carry
            ).withColumn("sz", F.size("hids"))
            payload = ["sz", "hids", *carry]
        # the payload table feeds BOTH join sides, and neither plan-time
        # nor AQE exchange reuse deduplicates the two subtrees (each
        # carries its own dictionary subtree) — without the persist the
        # encode pipeline genuinely executes twice (same trap as the
        # minhash signature self-join; measured 9.4s -> 6.0s at sf0.1 /
        # 12.3M candidates). When this call tokenized the corpus itself,
        # populate the payload EAGERLY so the corpus-sized token-set
        # cache can be dropped before the call returns — only the
        # narrow (id, sz, ids/bitmap) frame survives; with ``tokens_col``
        # the sets belong to the caller and the payload fills lazily on
        # the first action (no extra eager job).
        t = t.persist(StorageLevel.MEMORY_AND_DISK)
        if manage_raw:
            t.count()
            raw.unpersist()
        elif eager_payload:
            t.count()
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
        vocab = None
        if use_bitmap:
            vocab = _collect_vocab(t, max_bitmap_vocab)
            use_bitmap = vocab is not None and len(vocab) > 0
        n_chunks = (len(vocab) + 63) // 64 if use_bitmap else 0
        if use_bitmap:
            t = _bitmap_encode(t, vocab)
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
        pairs = pairs.withColumn(
            "__inter", _bitmap_intersection("bm_l", "bm_r", n_chunks)
        )
    else:
        pairs = pairs.withColumn("__inter", F.size(F.array_intersect("hids_l", "hids_r")))
    union = F.col("sz_l") + F.col("sz_r") - F.col("__inter")
    carried = [
        F.col(f"{c}_{side}") for c in (carry_cols or ()) for side in ("l", "r")
    ]
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
            *carried,
        )
    )
