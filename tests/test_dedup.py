"""Document dedup operators: exact, minhash-LSH, simhash, ngram-jaccard."""

import pytest
from pyspark.sql import functions as F

from person_linkage_case_study_spark.dedup.exact import exact_dedup
from person_linkage_case_study_spark.dedup.minhash import (
    minhash_candidate_pairs,
    minhash_signatures,
)
from person_linkage_case_study_spark.dedup.ngram import ngram_jaccard_pairs
from person_linkage_case_study_spark.dedup.simhash import (
    simhash,
    simhash_candidate_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE, "en"),
        (2, BASE, "en"),  # exact dup of 1
        (3, BASE.replace("lazy", "sleepy"), "en"),  # near dup of 1
        (4, "completely different text about spark dataframes and shuffles", "en"),
        (5, "otro documento totalmente distinto sobre flores y montañas", "es"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_exact_dedup(docs):
    out = {r["fingerprint"]: r for r in exact_dedup(docs).collect()}
    assert len(out) == 4  # 5 docs, one exact dup
    dup_group = [r for r in out.values() if r["n_copies"] == 2]
    assert len(dup_group) == 1 and dup_group[0]["keeper_doc_id"] == 1


def test_minhash_finds_near_dups(docs):
    sigs = minhash_signatures(docs, num_hashes=64, shingle_n=2)
    assert sigs.count() == 5
    # identical docs -> identical signatures
    s = {r["doc_id"]: tuple(r["signature"]) for r in sigs.collect()}
    assert s[1] == s[2]
    pairs = minhash_candidate_pairs(sigs, est_jaccard_threshold=0.5).collect()
    found = {(r["doc_id_l"], r["doc_id_r"]) for r in pairs}
    assert (1, 2) in found  # exact dup certainly collides
    assert (1, 3) in found  # near dup (1-word change) collides
    assert (1, 4) not in found and (4, 5) not in found


def test_minhash_engines_bit_identical(docs, spark):
    """The zero-shuffle arrow kernel and the explode/groupBy agg
    formulation must agree bit-for-bit (same base hash, same signed-64
    affine arithmetic), including dropping NULL-text docs identically."""
    with_null = docs.withColumn(
        "text", F.when(F.col("doc_id") == 4, F.lit(None)).otherwise(F.col("text"))
    )
    for hf in ("md5", "crc32"):
        a = {
            r["doc_id"]: tuple(r["signature"])
            for r in minhash_signatures(
                with_null, shingle_n=2, hash_fn=hf, engine="arrow"
            ).collect()
        }
        g = {
            r["doc_id"]: tuple(r["signature"])
            for r in minhash_signatures(
                with_null, shingle_n=2, hash_fn=hf, engine="agg"
            ).collect()
        }
        assert a == g, hf
        assert 4 not in a  # NULL text dropped by both engines


def test_minhash_deterministic(docs):
    a = minhash_signatures(docs, num_hashes=16).collect()
    b = minhash_signatures(docs, num_hashes=16).collect()
    assert {r["doc_id"]: tuple(r["signature"]) for r in a} == {
        r["doc_id"]: tuple(r["signature"]) for r in b
    }


def test_simhash_near_dups(docs):
    sigs = simhash(docs)
    s = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    assert s[1] == s[2]
    pairs = simhash_candidate_pairs(sigs, max_hamming=3).collect()
    found = {(r["doc_id_l"], r["doc_id_r"]) for r in pairs}
    assert (1, 2) in found
    ham = {(r["doc_id_l"], r["doc_id_r"]): r["hamming"] for r in pairs}
    assert ham[(1, 2)] == 0


def test_simhash_engines_bit_identical(docs, spark):
    """Arrow zero-shuffle simhash == explode/groupBy agg simhash, both
    hash modes, with NULL-text and whitespace-only docs dropped alike."""
    degenerate = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 4, F.lit(None))
        .when(F.col("doc_id") == 5, F.lit("  \t "))
        .otherwise(F.col("text")),
    )
    for hf in ("md5", "xxhash64"):
        a = {
            r["doc_id"]: r["simhash"]
            for r in simhash(degenerate, hash_fn=hf, engine="arrow").collect()
        }
        g = {
            r["doc_id"]: r["simhash"]
            for r in simhash(degenerate, hash_fn=hf, engine="agg").collect()
        }
        assert a == g, hf
        assert 4 not in a and 5 not in a


def test_minhash_md5_mode(docs):
    # portable base hash: identical docs still produce identical signatures
    # and surface as candidates (the DuckDB oracle checks exact parity)
    sigs = minhash_signatures(docs, num_hashes=16, hash_fn="md5")
    s = {r["doc_id"]: tuple(r["signature"]) for r in sigs.collect()}
    assert s[1] == s[2]
    pairs = minhash_candidate_pairs(sigs, bands=4, est_jaccard_threshold=0.9).collect()
    assert any({r["doc_id_l"], r["doc_id_r"]} == {1, 2} for r in pairs)


def test_simhash_md5_mode(docs, spark):
    # portable-hash mode: identical docs still collide at hamming 0
    sigs = simhash(docs, hash_fn="md5")
    s = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    assert s[1] == s[2]
    # the Spark-side 32-bit LE md5 reconstruction matches hashlib (and
    # therefore DuckDB's md5_number_lower & 0xFFFFFFFF — the oracle contract)
    import hashlib

    from person_linkage_case_study_spark.dedup.simhash import _md5_hash32

    from pyspark.sql import functions as F

    words = ["hello", "tok", "Ünïcode", "123"]
    got = {
        r["w"]: r["h"]
        for r in spark.createDataFrame([(w,) for w in words], ["w"])
        .select("w", _md5_hash32(F.col("w")).alias("h"))
        .collect()
    }
    for w in words:
        m = hashlib.md5(w.encode()).hexdigest()
        assert got[w] == int(m[22:24] + m[20:22] + m[18:20] + m[16:18], 16), w


def test_ngram_jaccard(docs):
    pairs = ngram_jaccard_pairs(docs, block_col="lang", threshold=0.5).collect()
    found = {(r["doc_id_l"], r["doc_id_r"]): r["jaccard"] for r in pairs}
    assert found[(1, 2)] == 1.0
    assert found[(1, 3)] > 0.8
    assert (1, 4) not in found
    # blocking respected: doc 5 is in its own lang block
    assert not any(5 in p for p in found)


def test_ngram_jaccard_bitmap_path_matches_string_path(docs):
    # force both physical strategies on the same input
    bitmap = ngram_jaccard_pairs(
        docs, block_col="lang", threshold=0.3, min_bitmap_pairs=0
    ).collect()
    strings = ngram_jaccard_pairs(
        docs, block_col="lang", threshold=0.3, max_bitmap_vocab=0
    ).collect()
    assert {tuple(r) for r in bitmap} == {tuple(r) for r in strings}
    assert len(bitmap) > 0


def test_minhash_simhash_engine_parity_fuzz(spark):
    """Hypothesis-generated unicode corpora (whitespace runs, empties,
    CJK, combining marks): arrow and agg engines must agree bit-for-bit
    for both kernels — one Spark comparison over the whole fuzz corpus."""
    from hypothesis import given, settings, strategies as st

    corpus: list[str] = []
    texty = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        min_size=0,
        max_size=80,
    )

    @settings(max_examples=150, deadline=None)
    @given(texty)
    def collect(s):
        corpus.append(s)

    collect()
    rows = [(i, s) for i, s in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    a = {
        r["doc_id"]: tuple(r["signature"])
        for r in minhash_signatures(
            df, shingle_n=2, hash_fn="md5", engine="arrow"
        ).collect()
    }
    g = {
        r["doc_id"]: tuple(r["signature"])
        for r in minhash_signatures(
            df, shingle_n=2, hash_fn="md5", engine="agg"
        ).collect()
    }
    assert a == g

    sa = {
        r["doc_id"]: r["simhash"]
        for r in simhash(df, hash_fn="md5", engine="arrow").collect()
    }
    sg = {
        r["doc_id"]: r["simhash"]
        for r in simhash(df, hash_fn="md5", engine="agg").collect()
    }
    assert sa == sg


def test_candidates_path_equals_quadratic_at_high_threshold(spark):
    """Pin for the catalog's scale path (dedup_cluster_canonical /
    corpus_curation_pipeline / dedup_near_exact_pipeline): MinHash-LSH
    candidates (unigram shingles, 32 bands x 2 rows) scored by the exact
    kernel must recover EXACTLY the J>=0.8 pair set of the full
    quadratic self-join — miss probability (1-0.64)^32 ~ 1e-14 per true
    pair, so equality, not containment. Randomized dup-injected corpus:
    seeded so failures replay."""
    import random

    rng = random.Random(1234)
    words = [f"w{i}" for i in range(60)]
    rows = []
    doc_id = 0
    for _ in range(25):
        base = rng.sample(words, rng.randint(8, 20))
        rows.append((doc_id, " ".join(base)))
        doc_id += 1
        # inject near dups: drop/replace up to 2 tokens
        for _ in range(rng.randint(0, 2)):
            mutated = list(base)
            for _ in range(rng.randint(0, 2)):
                op = rng.random()
                if op < 0.5 and len(mutated) > 3:
                    mutated.pop(rng.randrange(len(mutated)))
                else:
                    mutated[rng.randrange(len(mutated))] = rng.choice(words)
            rows.append((doc_id, " ".join(mutated)))
            doc_id += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = minhash_signatures(df, shingle_n=1)
    cands = minhash_candidate_pairs(sigs, bands=32, est_jaccard_threshold=None)
    via_lsh = {
        (r["doc_id_l"], r["doc_id_r"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(df, candidates=cands, threshold=0.8).collect()
    }
    quad = {
        (r["doc_id_l"], r["doc_id_r"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(
            df.withColumn("one", F.lit(0)), block_col="one", threshold=0.8
        ).collect()
    }
    assert via_lsh == quad
    assert len(quad) > 0  # the injection produced true near-dups


def test_collapsed_pipeline_equals_uncollapsed(spark):
    """r15 optimization pin: `near_dup_pairs_collapsed` (identical
    token-SET collapse → LSH on representatives → member expansion)
    must return exactly the pair set of the uncollapsed
    minhash→LSH→exact-Jaccard composition. The corpus stresses every
    collapse edge: exact dup text, same-set different token ORDER,
    same-set with repeated tokens, an empty/whitespace-text group (must
    contribute NOTHING — union 0 ⇒ J = 0.0 by the scorer's convention),
    a NULL-text doc, singletons, and true near-dups across groups."""
    import random

    from person_linkage_case_study_spark.dedup.pipeline import (
        near_dup_pairs_collapsed,
    )

    rng = random.Random(77)
    words = [f"w{i}" for i in range(40)]
    rows = []
    doc_id = 0
    for _ in range(15):
        base = rng.sample(words, rng.randint(6, 15))
        rows.append((doc_id, " ".join(base)))
        doc_id += 1
        # exact dup, shuffled-order dup, repeated-token dup: one GROUP
        rows.append((doc_id, " ".join(base))); doc_id += 1
        shuf = list(base); rng.shuffle(shuf)
        rows.append((doc_id, " ".join(shuf))); doc_id += 1
        rows.append((doc_id, " ".join(base + [base[0], base[-1]]))); doc_id += 1
        # near dup in a different group
        mutated = list(base)
        mutated[rng.randrange(len(mutated))] = rng.choice(words)
        rows.append((doc_id, " ".join(mutated))); doc_id += 1
    rows += [(doc_id, ""), (doc_id + 1, "   "), (doc_id + 2, ""),
             (doc_id + 3, None), (doc_id + 4, "lonely singleton doc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = minhash_signatures(df, shingle_n=1)
    cands = minhash_candidate_pairs(sigs, bands=32, est_jaccard_threshold=None)
    direct = {
        (r["doc_id_l"], r["doc_id_r"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(df, candidates=cands, threshold=0.8).collect()
    }
    # BOTH routes (r16): the default budget takes the all-pairs route on
    # this corpus; max_allpairs_pairs=0 forces the LSH banding route —
    # each must match the uncollapsed composition exactly
    collapsed_df = near_dup_pairs_collapsed(df, threshold=0.8, bands=32)
    collapsed_rows = collapsed_df.collect()
    collapsed = {
        (r["doc_id_l"], r["doc_id_r"], round(r["jaccard"], 9))
        for r in collapsed_rows
    }
    assert collapsed == direct
    assert len(collapsed_rows) == len(collapsed)  # no duplicate pairs
    assert len(direct) > 0
    banded = {
        (r["doc_id_l"], r["doc_id_r"], round(r["jaccard"], 9))
        for r in near_dup_pairs_collapsed(
            df, threshold=0.8, bands=32, max_allpairs_pairs=0
        ).collect()
    }
    assert banded == direct
    # same column names and types (nullability may tighten: the
    # expansion's ids come from exploding non-null member arrays)
    direct_schema = ngram_jaccard_pairs(df, candidates=cands, threshold=0.8).schema
    assert [(f.name, f.dataType) for f in collapsed_df.schema] == [
        (f.name, f.dataType) for f in direct_schema
    ]


def test_candidates_scoring_plan_is_shuffled_hash_for_large_vocab(spark):
    """Scale pin for the r5 mult-8 fix: on the hashed-id (large-vocab)
    path the candidate-scoring joins must be ShuffledHashJoin — a
    sort-merge join would sort (and sorter-spill) the wide pair stream, the
    measured one-box scratch ceiling. The bitmap path stays unhinted so
    small payload tables can broadcast."""
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} shared") for i in range(50)],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 48, 2)], "doc_id_l long, doc_id_r long"
    )
    out = ngram_jaccard_pairs(
        docs, candidates=cands, threshold=0.1, max_bitmap_vocab=0
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pick_bands_s_curve_solver():
    """pick_bands inverts the LSH S-curve: smallest divisor band count
    whose catch probability AT the threshold meets the recall floor —
    the measured-in-DEDUP_BENCH rule that fewer/longer bands are the
    candidate-volume control, made a contract instead of a hand pick."""
    from person_linkage_case_study_spark.dedup.minhash import (
        banding_recall,
        pick_bands,
    )

    # closed-form spot checks of the curve itself
    assert banding_recall(0.8, 1, 1) == pytest.approx(0.8)
    assert banding_recall(0.8, 16, 4) == pytest.approx(1 - (1 - 0.8**4) ** 16)

    # the pipeline default: threshold 0.8, 64 hashes, 0.999 floor -> 16
    # bands of 4 rows (recall 0.99978); the next-coarser banding (8x8)
    # only reaches 0.77 so it must NOT be picked
    assert pick_bands(0.8, 64, min_recall=0.999) == 16
    assert banding_recall(0.8, 16, 4) >= 0.999
    assert banding_recall(0.8, 8, 8) < 0.999

    # higher thresholds need fewer/longer bands (more selective buckets):
    # monotone non-increasing band counts as the threshold rises
    picks = [pick_bands(t, 64, min_recall=0.99) for t in (0.5, 0.7, 0.8, 0.9)]
    assert picks == sorted(picks, reverse=True)
    # at 0.9 the 8x8 banding is enough (0.9^8=0.43 -> 1-0.57^8 = 0.989...)
    assert pick_bands(0.9, 64, min_recall=0.98) == 8

    # returned value always divides the hash budget; impossible floors
    # fall back to r=1 (max-recall banding)
    for t in (0.3, 0.6, 0.85):
        assert 64 % pick_bands(t, 64) == 0
    # 1-(1-0.01)^64 = 0.474 — no banding of 64 hashes can catch
    # jaccard-0.01 pairs with 0.999999 probability
    assert pick_bands(0.01, 64, min_recall=0.999999) == 64

    with pytest.raises(ValueError):
        pick_bands(1.5)


def test_pick_bands_recall_holds_empirically(spark):
    """End-to-end floor check: planted pairs ABOVE the threshold are all
    caught by the solver-picked banding (deterministic seed)."""
    from person_linkage_case_study_spark.dedup.minhash import (
        minhash_candidate_pairs,
        minhash_signatures,
        pick_bands,
    )

    base = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(30):
        toks = [f"{w}_{d}" for w in base]
        rows.append((2 * d, " ".join(toks)))
        # near-dup: 36/44 overlap -> jaccard ~0.82 > 0.8
        rows.append((2 * d + 1, " ".join(toks[:36] + [f"x{j}_{d}" for j in range(4)])))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(docs, shingle_n=1)
    cands = minhash_candidate_pairs(
        sigs, bands=pick_bands(0.8, 64, min_recall=0.999),
        est_jaccard_threshold=None,
    )
    got = {tuple(r) for r in cands.collect()}
    for d in range(30):
        assert (2 * d, 2 * d + 1) in got, d


def test_ngram_candidates_cache_bounded_to_one_narrow_frame(spark):
    """The candidates path may carry AT MOST one persisted frame across
    calls (the narrow payload handoff) — the corpus-sized token-set
    cache must be released before the call returns, and repeated calls
    must not accumulate (r6 tightening; r5 range_join precedent)."""
    jsc_sc = spark.sparkContext._jsc.sc()
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} shared common words") for i in range(60)],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 58, 2)], "doc_id_l long, doc_id_r long"
    )
    before = jsc_sc.getPersistentRDDs().size()
    for _ in range(3):
        ngram_jaccard_pairs(
            docs, candidates=cands, threshold=0.1, max_bitmap_vocab=0
        ).count()
    # one in-flight payload frame is allowed; 3 calls must not stack 3+
    assert jsc_sc.getPersistentRDDs().size() <= before + 1
