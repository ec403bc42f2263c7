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
) -> DataFrame:
    """(``{id_col}_l``, ``{id_col}_r``, jaccard) — identical to the
    uncollapsed minhash → LSH → exact-Jaccard composition at
    ``shingle_n=1`` (the only shingle width where the signature is a
    function of the token set; wider shingles would need the collapse
    key to be the shingle set while the scorer stays token-set-based,
    so they are not supported here)."""
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

    reps = groups.select(id_col, "__toks")
    # signatures feed both sides of the band self-join; persist here
    # (materialize=False) so this cache rides the same release-on-next-
    # call registry as the scorer payload instead of leaking per rep
    sigs = minhash_signatures(reps, id_col=id_col, num_hashes=num_hashes,
                              shingle_n=1, tokens_col="__toks")
    sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    cands = minhash_candidate_pairs(
        sigs, id_col=id_col, bands=bands,
        est_jaccard_threshold=None, materialize=False,
    )
    # member lists ride the scorer's own payload joins (carry_cols) —
    # no expansion joins, no extra broadcast builds; they surface only
    # on pairs that PASSED the threshold (tiny), where the explode
    # expands each group pair into its doc pairs
    scored = ngram_jaccard_pairs(
        groups.select(id_col, "__toks", "__members"),
        id_col=id_col, threshold=threshold,
        candidates=cands, tokens_col="__toks", carry_cols=["__members"],
    )
    # the scorer call above just released the PREVIOUS invocation's
    # caches; register this invocation's group/signature caches there so
    # repeated calls (bench reps) stay bounded at one generation
    register_cache_for_release(groups)
    register_cache_for_release(sigs)

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
