"""Sequence packing (textops/packing.py): deterministic contiguous-fill
assignment of documents to fixed-token training sequences."""

import hashlib

from pyspark.sql import functions as F

from person_linkage_case_study_spark.textops.packing import pack_sequences


def _h(seed, k):
    m = hashlib.md5(f"{seed}\x1f{k}".encode()).hexdigest()
    return (int(m[22:24] + m[20:22] + m[18:20] + m[16:18], 16), k)


def test_matches_local_reference_and_is_layout_independent(spark):
    rows = [(k, (k * 37) % 400 + 1) for k in range(2_000)]  # 1..400 tokens
    df = spark.createDataFrame(rows, "k long, n_tokens long")
    target = 4096

    got_a = {
        r["k"]: r["seq_id"]
        for r in pack_sequences(df.repartition(3), ["k"], "n_tokens", target, seed=4).collect()
    }
    got_b = {
        r["k"]: r["seq_id"]
        for r in pack_sequences(
            df.repartition(17), ["k"], "n_tokens", target, seed=4, num_partitions=5
        ).collect()
    }
    assert got_a == got_b  # physical layout never changes the packing

    # local reference: cumsum in hash order, bin = cum_before // target
    order = sorted(range(2_000), key=lambda k: _h(4, k))
    toks = dict(rows)
    expect, cum = {}, 0
    for k in order:
        expect[k] = cum // target
        cum += toks[k]
    assert got_a == expect

    # packing invariants: bins are contiguous from 0; every doc assigned
    bins = set(got_a.values())
    assert bins == set(range(max(bins) + 1))
    assert len(got_a) == 2_000


def test_null_and_zero_token_docs_pack_safely(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 0), (3, 10)], "k long, n_tokens long"
    )
    out = pack_sequences(df, ["k"], "n_tokens", 8, seed=1).collect()
    assert len(out) == 3
    assert all(r["seq_id"] is not None and r["seq_id"] >= 0 for r in out)
