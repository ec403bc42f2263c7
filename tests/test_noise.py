"""X3 seeded noise generators (SURVEY.md §2.11; reference 02:268-386)."""

from collections import Counter

from pyspark.sql import functions as F

from person_linkage_case_study_spark.sources.noise import (
    shuffle_columns,
    split_columns_incorrectly,
    truncate_column,
)

COLS = ["first_name", "middle_initial", "last_name"]


def make_people(spark, n=400):
    rows = [
        (str(i), f"FIRST{i}", "Q", f"LAST{i}-SUFF" if i % 3 == 0 else f"LAST{i}")
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, ["record_id", "first_name", "middle_initial", "last_name"]
    ).repartition(4, "record_id")


def test_split_preserves_tokens_and_rate(spark):
    df = make_people(spark)
    out = split_columns_incorrectly(df, COLS, row_probability=0.5, seed=1)
    orig = {r["record_id"]: r for r in df.collect()}
    changed = 0
    for r in out.collect():
        o = orig[r["record_id"]]
        import re

        def toks(row):
            joined = " ".join(x for x in (row[c] for c in COLS) if x)
            return Counter(t for t in re.split("[ -]", joined) if t)

        assert toks(r) == toks(o), "split must preserve the token multiset"
        if tuple(r[c] for c in COLS) != tuple(o[c] for c in COLS):
            changed += 1
    assert 100 <= changed  # ~50% of 400, minus no-op resplits


def test_shuffle_permutes_within_row(spark):
    df = make_people(spark)
    out = shuffle_columns(df, COLS, row_probability=0.5, seed=2)
    orig = {r["record_id"]: r for r in df.collect()}
    changed = 0
    for r in out.collect():
        o = orig[r["record_id"]]
        assert Counter(r[c] for c in COLS) == Counter(o[c] for c in COLS)
        if tuple(r[c] for c in COLS) != tuple(o[c] for c in COLS):
            changed += 1
    assert 50 <= changed <= 250  # half the rows, 1/3 of permutations are identity-ish


def test_truncate_rate_and_length(spark):
    df = make_people(spark)
    out = truncate_column(df, "last_name", cell_probability=0.4, truncation_length=4, seed=3)
    orig = {r["record_id"]: r["last_name"] for r in df.collect()}
    truncated = sum(
        1
        for r in out.collect()
        if r["last_name"] != orig[r["record_id"]]
    )
    for r in out.collect():
        o = orig[r["record_id"]]
        assert r["last_name"] == o or r["last_name"] == o[:4]
    assert 100 <= truncated <= 220  # ~40% of 400 (some already <=4 chars stay equal)


def test_determinism_fixed_partitioning(spark):
    df = make_people(spark)
    a = split_columns_incorrectly(df, COLS, 0.3, seed=9)
    b = split_columns_incorrectly(df, COLS, 0.3, seed=9)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    c = shuffle_columns(df, COLS, 0.3, seed=9)
    d = shuffle_columns(df, COLS, 0.3, seed=9)
    assert sorted(map(tuple, c.collect())) == sorted(map(tuple, d.collect()))
    # different seed -> different output
    e = shuffle_columns(df, COLS, 0.9, seed=10)
    assert sorted(map(tuple, c.collect())) != sorted(map(tuple, e.collect()))
