"""Deterministic hash sampling (operators/sampling.py) — P11's scale-correct
form: content-keyed, partition-independent, engine-portable."""

import hashlib

from pyspark.sql import functions as F

from person_linkage_case_study_spark.operators.sampling import (
    hash_sample,
    hash_shuffle,
    hash_split,
    stratified_hash_sample,
)


def test_fraction_lands_in_band(spark):
    df = spark.range(10_000).select(F.col("id").alias("k"))
    n = hash_sample(df, ["k"], fraction=0.1, seed=7).count()
    assert 800 <= n <= 1200, n


def test_partition_independent(spark):
    # THE property Spark's sample(seed=) lacks: identical rows selected
    # regardless of physical layout
    df = spark.range(5_000).select(F.col("id").alias("k"))
    a = {r["k"] for r in hash_sample(df.repartition(3), ["k"], 0.2, seed=1).collect()}
    b = {r["k"] for r in hash_sample(df.repartition(17), ["k"], 0.2, seed=1).collect()}
    c = {r["k"] for r in hash_sample(df.coalesce(1), ["k"], 0.2, seed=1).collect()}
    assert a == b == c and len(a) > 0


def test_seed_changes_sample(spark):
    df = spark.range(5_000).select(F.col("id").alias("k"))
    a = {r["k"] for r in hash_sample(df, ["k"], 0.2, seed=1).collect()}
    b = {r["k"] for r in hash_sample(df, ["k"], 0.2, seed=2).collect()}
    assert a != b
    # similar size, mostly disjoint membership (independent draws)
    assert len(a & b) < len(a) * 0.5


def test_coordinated_by_key(spark):
    # duplicate keys are kept or dropped together — entity-consistent
    df = spark.range(2_000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("v")
    )
    kept = hash_sample(df, ["k"], 0.3, seed=3).groupBy("k").count().collect()
    assert len(kept) > 0
    assert all(r["count"] == 4 for r in kept)


def test_stratified_quotas(spark):
    df = spark.range(6_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "de").otherwise("zh").alias("lang"),
    )
    kept = stratified_hash_sample(df, "lang", {"en": 0.1, "de": 1.0}, ["k"], seed=5)
    counts = {r["lang"]: r["count"] for r in kept.groupBy("lang").count().collect()}
    assert counts["de"] == 2000            # fraction 1.0 keeps everything
    assert 120 <= counts["en"] <= 280      # ~10% of 2000
    assert "zh" not in counts              # absent stratum dropped


def test_split_deterministic_and_partitioned(spark):
    df = spark.range(10_000).select(F.col("id").alias("k"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(df.repartition(4), ["k"], w, seed=9)
    b = hash_split(df.repartition(13), ["k"], w, seed=9)
    ma = {r["k"]: r["split"] for r in a.collect()}
    mb = {r["k"]: r["split"] for r in b.collect()}
    assert ma == mb                        # partition-independent assignment
    from collections import Counter

    c = Counter(ma.values())
    assert set(c) == {"train", "val", "test"}
    assert 7_600 <= c["train"] <= 8_400
    assert sum(c.values()) == 10_000       # total order partition: every row in exactly one split


def test_shuffle_positions_contiguous_and_stable(spark):
    df = spark.range(3_000).select(F.col("id").alias("k"))
    a = {r["k"]: r["shuffle_pos"] for r in hash_shuffle(df.repartition(5), ["k"], seed=2).collect()}
    b = {r["k"]: r["shuffle_pos"] for r in hash_shuffle(df.repartition(11), ["k"], seed=2, num_partitions=7).collect()}
    assert a == b                              # layout-independent order
    assert sorted(a.values()) == list(range(3_000))  # exactly 0..n-1
    # hash order, not input order: position 0 is almost surely not id 0
    import hashlib

    def h(k):
        m = hashlib.md5(f"2\x1f{k}".encode()).hexdigest()
        return (int(m[22:24] + m[20:22] + m[18:20] + m[16:18], 16), k)

    expect = {k: i for i, k in enumerate(sorted(range(3_000), key=h))}
    assert a == expect                         # equals the true global rank


def test_md5_hash32_property_fuzz(spark):
    # hypothesis-driven: the Spark-side LE reconstruction equals hashlib
    # for arbitrary unicode keys (one Spark job over the whole corpus)
    from hypothesis import given, settings, strategies as st

    corpus: list[str] = []

    @settings(max_examples=200, deadline=None)
    @given(st.text(min_size=0, max_size=40))
    def collect(s):
        corpus.append(s)

    collect()
    from person_linkage_case_study_spark.functions.hashing import md5_hash32

    rows = [(i, s) for i, s in enumerate(set(corpus))]
    got = {
        r["i"]: r["h"]
        for r in spark.createDataFrame(rows, "i long, s string")
        .select("i", md5_hash32(F.col("s")).alias("h"))
        .collect()
    }
    for i, s in rows:
        m = hashlib.md5(s.encode()).hexdigest()
        assert got[i] == int(m[22:24] + m[20:22] + m[18:20] + m[16:18], 16), repr(s)


def test_matches_reference_hash(spark):
    # the decision rule is md5-based and reproducible outside Spark: keep
    # iff LE-int32(md5("{seed}\x1f{key}")) < fraction * 2^32
    df = spark.range(200).select(F.col("id").alias("k"))
    got = {r["k"] for r in hash_sample(df, ["k"], 0.25, seed=42).collect()}
    expect = set()
    for k in range(200):
        m = hashlib.md5(f"42\x1f{k}".encode()).hexdigest()
        h = int(m[22:24] + m[20:22] + m[18:20] + m[16:18], 16)
        if h < int(0.25 * (1 << 32)):
            expect.add(k)
    assert got == expect


def test_mixture_upsample_copy_counts(spark):
    """floor(w) copies guaranteed; the fractional extra copy follows the
    same md5 decision rule as hash_sample, reproducible off-Spark."""
    from person_linkage_case_study_spark.operators.sampling import mixture_upsample

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "k long, src string")
    weights = {"a": 2.4, "b": 0.7}
    out = mixture_upsample(df, "src", weights, ["k"], seed=5).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r["copy_idx"])
    import hashlib

    for k, src in rows:
        w = weights[src]
        m = hashlib.md5(f"5\x1f{k}".encode()).hexdigest()
        h = int(m[22:24] + m[20:22] + m[18:20] + m[16:18], 16)
        n = int(w) + (1 if h < int((w - int(w)) * (1 << 32)) else 0)
        got = sorted(by_key.get(k, []))
        assert got == list(range(n)), (k, src, n, got)
    # aggregate sanity: expected size ~ sum of weights over rows
    assert abs(len(out) - (50 * 2.4 + 50 * 0.7)) < 15


def test_mixture_upsample_unknown_source_dropped(spark):
    from person_linkage_case_study_spark.operators.sampling import mixture_upsample

    df = spark.createDataFrame([(1, "x"), (2, "a")], "k long, src string")
    out = mixture_upsample(df, "src", {"a": 1.0}, ["k"]).collect()
    assert {r["k"] for r in out} == {2}


def test_temperature_weights():
    from person_linkage_case_study_spark.operators.sampling import (
        temperature_weights,
    )

    counts = {"en": 8000, "de": 1500, "fr": 500}
    w1 = temperature_weights(counts, 1.0)
    assert all(abs(v - 1.0) < 1e-9 for v in w1.values())  # T=1 → natural
    w = temperature_weights(counts, 2.0)
    # rarer source ⇒ larger epoch multiplier; expected total preserved
    assert w["fr"] > w["de"] > w["en"]
    assert abs(sum(w[s] * counts[s] for s in counts) - sum(counts.values())) < 1e-6
    # T→∞ approaches uniform sampling: expected per-source sizes equalize
    winf = temperature_weights(counts, 1e9)
    sizes = [winf[s] * counts[s] for s in counts]
    assert max(sizes) / min(sizes) < 1.001
