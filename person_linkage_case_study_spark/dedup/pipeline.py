"""Near-dup pipeline with exact token-set collapse (guide §8 shape).

``near_dup_pairs_collapsed`` computes EXACTLY the same pair set as

    sigs  = minhash_signatures(docs, shingle_n=1)
    cands = minhash_candidate_pairs(sigs, bands=..., est_jaccard_threshold=None)
    ngram_jaccard_pairs(docs, candidates=cands, threshold=...)

but collapses documents with identical *distinct token sets* to one
representative before the quadratic-ish LSH band join, and expands the
group members back into doc pairs after scoring.

Why this is an optimization and not a semantics change: with unigram
shingles the minhash signature is a pure function of the distinct token
set (``shingles_of_tokens(t, 1)`` emits the distinct tokens for
``size ≥ 2`` and ``[concat_ws(" ", t)]`` — the single token, or ``""`` —
below, both order-invariant; the min-reduce is order-invariant), band
hashes are functions of the signature, and the exact token-set Jaccard
is a function of the two sets. So every doc sharing a set is
interchangeable at every decision point:

* cross-group: a doc pair (a ∈ G_l, b ∈ G_r) is an LSH candidate iff
  the representative pair is, and scores the same Jaccard — expand the
  member lists of each PASSING representative pair (tiny by then).
* within-group: identical sets collide in every band and score J = 1.0,
  which passes any threshold ≤ 1 — EXCEPT the empty token set, whose
  union is 0 and scores J = 0.0 by the scorer's convention; the
  expansion guards on set size > 0 to match.

The win is quadratic in group multiplicity: a g-member group of
near-dup-heavy data contributes bands × g² pre-distinct band-join rows
(at sf0.1: 5000 docs → 3935 distinct sets, one 248-doc empty-set group
alone = 32 × 248² ≈ 2.0M of the 334M pre-distinct rows; collapsed
volume 165M, distinct candidates 12.32M → 7.58M, all measured). At
crawl scale exact duplicates are the norm, so the collapse factor only
grows. The expansion joins touch only pairs that PASSED the threshold.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.concurrent import run_concurrent
from ..textops.analysis import tokens
from .minhash import minhash_candidate_pairs, minhash_signatures
from .ngram import (
    ngram_jaccard_pairs,
    register_cache_for_release,
    release_previous_caches,
)


def near_dup_pairs_collapsed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    bands: int = 32,
    num_hashes: int = 64,
    max_allpairs_pairs: int = 16_000_000,
) -> DataFrame:
    """(``{id_col}_l``, ``{id_col}_r``, jaccard) — identical to the
    uncollapsed minhash → LSH → exact-Jaccard composition at
    ``shingle_n=1`` (the only shingle width where the signature is a
    function of the token set; wider shingles would need the collapse
    key to be the shingle set while the scorer stays token-set-based,
    so they are not supported here).

    ``threshold`` must be > 0: the direct composition's ``jaccard >=
    threshold`` filter would emit J = 0.0 within-empty-set pairs at
    threshold 0, which the collapsed pipeline's ``__nonempty`` guard
    drops — the one threshold where the two diverge (r15 ADVICE).

    **Route selection (r16).** After the collapse the pipeline knows the
    representative count n (the group build is counted eagerly either
    way). When ``n(n-1)/2 ≤ max_allpairs_pairs`` the LSH tier is pure
    overhead and is SKIPPED: the scorer consumes the all-pairs candidate
    stream (one broadcast-nested-loop cross of the rep ids — zero
    exchanges; the exact-Jaccard filter is the selective step either
    way). Measured at sf0.1 (event-log CPU accounting, r16): banding
    kept 7.58M of the 7.74M possible rep pairs — a 2% prune — while its
    signature kernel, 82.5M-row band join and pair DISTINCT burned
    ~55-90 of the pipeline's ~95-165 steady-state CPU-seconds. Above the
    budget (crawl scale, where banding actually prunes), the LSH route
    runs unchanged, with the candidate build overlapped §2.6-style
    against the scorer's vocab/payload chain. Result parity: the exact
    scorer applies the same threshold to a SUPERSET of the banding
    candidates, so outputs are identical wherever the banding meets its
    recall contract (callers here derive b from min_recall=1-1e-9 ⇒
    P[miss a boundary pair] ≈ 6.6e-15; the full-quadratic oracle pins
    the all-pairs form as ground truth)."""
    if not threshold > 0.0:
        raise ValueError(
            f"near_dup_pairs_collapsed requires threshold > 0 (got "
            f"{threshold}): at 0.0 the uncollapsed composition emits "
            "J=0.0 empty-token-set pairs the collapse's __nonempty "
            "guard excludes"
        )
    # release the previous invocation's caches BEFORE persisting this
    # one's: successive invocations build byte-identical plans, and a
    # late release would evict the one shared CacheManager entry out
    # from under every consumer (see release_previous_caches)
    release_previous_caches()
    key = F.array_sort(F.array_distinct(tokens(F.col(text_col))))
    groups = (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(key.alias("__toks"))
        .agg(
            # the representative is the group's lowest-id doc; its TOKEN
            # SET (the grouping key itself) is all downstream stages need
            # — the signature kernel and the scorer both take tokens_col,
            # so rep text never shuffles and nothing re-tokenizes
            F.min(F.col(id_col)).alias(id_col),
            F.sort_array(F.collect_list(F.col(id_col))).alias("__members"),
        )
        .select(
            id_col,
            "__toks",
            "__members",
            (F.size("__toks") > 0).alias("__nonempty"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    spark = df.sparkSession
    # ONE eager job populates the group cache (the corpus tokenize +
    # group shuffle) before anything fans out over it — an unpopulated
    # shared parent touched by two concurrent chains would be computed
    # once per chain (run_concurrent's contract) — and its row count is
    # the route-selection input for free
    spark.sparkContext.setJobDescription("dedup: token-set group build")
    n_reps = groups.count()
    spark.sparkContext.setJobDescription(None)

    def _scorer(cands, eager: bool) -> DataFrame:
        # member lists ride the scorer's own payload joins (carry_cols)
        # — no expansion joins, no extra broadcast builds; they surface
        # only on pairs that PASSED the threshold (tiny), where the
        # explode expands each group pair into its doc pairs
        return ngram_jaccard_pairs(
            groups.select(id_col, "__toks", "__members"),
            id_col=id_col, threshold=threshold,
            candidates=cands, tokens_col="__toks", carry_cols=["__members"],
            eager_payload=eager,
        )

    if n_reps * (n_reps - 1) // 2 <= max_allpairs_pairs:
        # small-collapsed-corpus route (see docstring): candidates are
        # ALL rep pairs — a broadcast-nested-loop cross of two id-only
        # projections of the cached group frame. No signature kernel, no
        # band shuffle, and above all no pair DISTINCT (pairs are unique
        # by construction); the scorer's payload joins broadcast the
        # (tiny, ≤ √(2·budget)-row) encoded frame, so the whole pair
        # path is one codegen stage with zero exchanges.
        ids_l = groups.select(F.col(id_col).alias(f"{id_col}_l"))
        ids_r = groups.select(F.col(id_col).alias(f"{id_col}_r"))
        cands = ids_l.crossJoin(F.broadcast(ids_r)).filter(
            F.col(f"{id_col}_l") < F.col(f"{id_col}_r")
        )
        scored = _scorer(cands, eager=False)
        register_cache_for_release(groups)
    else:
        reps = groups.select(id_col, "__toks")
        # signatures feed both sides of the band self-join; persist here
        # (materialize=False) so this cache rides the same release-on-
        # next-call registry as the scorer payload instead of leaking
        sigs = minhash_signatures(reps, id_col=id_col, num_hashes=num_hashes,
                                  shingle_n=1, tokens_col="__toks")
        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
        cands = minhash_candidate_pairs(
            sigs, id_col=id_col, bands=bands,
            est_jaccard_threshold=None, materialize=False,
        ).persist(StorageLevel.MEMORY_AND_DISK)

        # §2.6 overlap (r16): the serialized driver-latency chain here
        # was vocab collect → payload encode+populate → signature
        # populate → band join → scoring. The two chains below are
        # independent given the populated group cache (band-join
        # candidates never touch the vocab/payload; the payload encode
        # never touches signatures), so they run as concurrent jobs and
        # the wall is their MAX. The candidate frame is persisted above
        # so the eager build here is the one the final scoring join
        # consumes (two longs per row — narrower than the band shuffle
        # that produces it).
        def _candidate_chain() -> None:
            sigs.count()  # populate BEFORE the self-join's two stages race
            cands.count()

        _, scored = run_concurrent(
            spark,
            [_candidate_chain, lambda: _scorer(cands, eager=True)],
            labels=["dedup: signatures + band-join candidates",
                    "dedup: vocab + payload encode"],
        )
        register_cache_for_release(groups)
        register_cache_for_release(sigs)
        register_cache_for_release(cands)

    cross = (
        scored
        .select("jaccard", F.explode("__members_l").alias("__a"), "__members_r")
        .select("jaccard", "__a", F.explode("__members_r").alias("__b"))
        .select(
            F.least("__a", "__b").alias(f"{id_col}_l"),
            F.greatest("__a", "__b").alias(f"{id_col}_r"),
            "jaccard",
        )
    )
    # members are sorted ascending, so the (i, j>i) HOF emits each
    # unordered within-group pair once, already oriented l < r
    within = (
        groups.filter((F.size("__members") > 1) & F.col("__nonempty"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(__members, (x, i) -> "
                    "transform(slice(__members, i + 2, size(__members) - i - 1), "
                    "y -> named_struct('l', x, 'r', y))))"
                )
            ).alias("__p")
        )
        .select(
            F.col("__p.l").alias(f"{id_col}_l"),
            F.col("__p.r").alias(f"{id_col}_r"),
            F.round(F.lit(1.0), 6).alias("jaccard"),
        )
    )
    return cross.unionByName(within)
