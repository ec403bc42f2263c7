"""Jaro-Winkler must match DuckDB (the correctness oracle) exactly."""

import random
import string

import duckdb
import pytest

from person_linkage_case_study_spark.functions.similarity import (
    jaro_winkler_similarity,
)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_jw_known_values(con):
    for a, b in [
        ("MARTHA", "MARHTA"),
        ("DWAYNE", "DUANE"),
        ("DIXON", "DICKSONX"),
        ("", ""),
        ("A", ""),
        ("SMITH", "SMITH"),
    ]:
        ref = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jaro_winkler_similarity(a, b) == pytest.approx(ref, abs=1e-12)


def test_jw_random_fuzz_vs_duckdb(con):
    rng = random.Random(99)
    for _ in range(500):
        a = "".join(rng.choice("ABCDE") for _ in range(rng.randint(0, 10)))
        b = "".join(rng.choice(string.ascii_uppercase) for _ in range(rng.randint(0, 12)))
        ref = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jaro_winkler_similarity(a, b) == pytest.approx(ref, abs=1e-12), (a, b)


def test_jw_null_handling():
    assert jaro_winkler_similarity(None, "X") is None
    assert jaro_winkler_similarity("X", None) is None


def test_vector_functions(spark):
    from pyspark.sql import functions as F

    from person_linkage_case_study_spark.functions.similarity import (
        cosine_similarity,
        jaccard_tokens,
    )

    df = spark.createDataFrame(
        [([1.0, 2.0], [2.0, 4.0], ["a", "b"], ["b", "c"])],
        ["v1", "v2", "t1", "t2"],
    )
    row = df.select(
        cosine_similarity(F.col("v1"), F.col("v2")).alias("cos"),
        jaccard_tokens(F.col("t1"), F.col("t2")).alias("jac"),
    ).first()
    assert row["cos"] == pytest.approx(1.0, abs=1e-9)
    assert row["jac"] == pytest.approx(1 / 3, abs=1e-9)
