"""Text analysis operators."""

import pytest
from pyspark.sql import functions as F

from person_linkage_case_study_spark.textops.analysis import (
    add_language_guess,
    add_quality_signals,
    add_rolling_fingerprint,
    add_token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat and looked at the dog"),
            (2, "el gato y el perro en la casa que los vio"),
            (3, "12345 67890 !!!???"),
            (4, ""),
            (5, "zzz qqq xxx"),
        ],
        ["doc_id", "text"],
    )


def test_token_stats(docs):
    rows = {r["doc_id"]: r for r in add_token_stats(docs).collect()}
    assert rows[1]["n_tokens"] == 11
    assert rows[4]["n_tokens"] == 0
    assert rows[4]["avg_token_len"] == 0.0
    assert rows[1]["avg_token_len"] == pytest.approx(
        sum(len(w) for w in "the cat sat on the mat and looked at the dog".split()) / 11
    )


def test_quality_signals(docs):
    rows = {r["doc_id"]: r for r in add_quality_signals(docs).collect()}
    assert rows[1]["quality_ok"] is True
    assert rows[3]["digit_ratio"] > 0.5
    assert rows[3]["quality_ok"] is False  # too much punct+digits, few tokens
    assert rows[1]["stopword_ratio"] > 0


def test_language_guess(docs):
    rows = {r["doc_id"]: r["lang_guess"] for r in add_language_guess(docs).collect()}
    assert rows[1] == "en"
    assert rows[2] == "es"
    assert rows[5] == "und"


def test_fingerprint_deterministic_and_distinct(docs):
    a = {r["doc_id"]: r["fingerprint64"] for r in add_rolling_fingerprint(docs).collect()}
    b = {r["doc_id"]: r["fingerprint64"] for r in add_rolling_fingerprint(docs).collect()}
    assert a == b
    assert a[1] != a[2]
    # python reference of the same fold
    text = "the cat sat on the mat and looked at the dog"
    acc = 0
    for ch in text:
        acc = (acc * 31 + ord(ch)) % 1_000_000_007
    assert a[1] == acc
