"""Native JVM Jaro-Winkler must match the pandas UDF (and thus DuckDB)."""

import random
import string

import pytest
from pyspark.sql import functions as F

from person_linkage_case_study_spark.functions.similarity import (
    JVM_JW_NAME,
    ensure_jvm_jw,
    jaro_winkler_similarity,
)


def test_jvm_jw_matches_python(spark):
    if not ensure_jvm_jw(spark):
        pytest.skip("sparklinkage.jar not on classpath (run jvm/build.sh)")
    rng = random.Random(4)
    rows = [
        (
            "".join(rng.choice("ABCDE") for _ in range(rng.randint(0, 10))),
            "".join(rng.choice(string.ascii_uppercase) for _ in range(rng.randint(0, 12))),
        )
        for _ in range(500)
    ] + [("MARTHA", "MARHTA"), ("", ""), ("A", "")]
    df = spark.createDataFrame(rows, "a string, b string")
    got = df.select("a", "b", F.call_udf(JVM_JW_NAME, "a", "b").alias("jw")).collect()
    for r in got:
        assert r["jw"] == pytest.approx(
            jaro_winkler_similarity(r["a"], r["b"]), abs=1e-12
        ), (r["a"], r["b"])


def test_auto_strategy_gamma_parity(spark):
    """add_gammas(auto) must equal add_gammas(inline) row-for-row."""
    from person_linkage_case_study_spark.operators.gamma import (
        add_gammas,
        jw_comparison,
    )

    pairs = spark.createDataFrame(
        [("SMITH", "SMYTH"), ("SMITH", "SMITH"), (None, "X"), ("AB", "ZZ")],
        "name_l string, name_r string",
    )
    comp = jw_comparison("name", thresholds=(0.9, 0.7))
    a = [r["gamma_name"] for r in add_gammas(pairs, [comp], jw_strategy="auto").collect()]
    b = [r["gamma_name"] for r in add_gammas(pairs, [comp], jw_strategy="inline").collect()]
    assert sorted(a, key=str) == sorted(b, key=str)
