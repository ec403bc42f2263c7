"""Term-frequency adjustment (operators/tf.py)."""

import math

import pytest
from pyspark.sql import functions as F

from person_linkage_case_study_spark.operators.gamma import exact_comparison
from person_linkage_case_study_spark.operators.scoring import LinkageModel, score_pairs
from person_linkage_case_study_spark.operators.tf import (
    add_tf_adjustment,
    term_frequency_table,
)


@pytest.fixture(scope="module")
def model():
    c = exact_comparison("name")
    c.m = [0.1, 0.9]
    c.u = [0.9, 0.1]
    return LinkageModel([c], lambda_prior=0.01)


def test_term_frequency_table(spark):
    df = spark.createDataFrame(
        [("SMITH",), ("SMITH",), ("SMITH",), ("RARE",), (None,)], ["name"]
    )
    tf = {r["name"]: r["tf"] for r in term_frequency_table(df, "name").collect()}
    assert tf == {"SMITH": 0.75, "RARE": 0.25}


def test_tf_adjustment_formula(spark, model):
    pairs = spark.createDataFrame(
        [
            (1, 10, "SMITH", "SMITH"),  # exact match, common value
            (2, 20, "RARE", "RARE"),  # exact match, rare value
            (3, 30, "SMITH", "RARE"),  # mismatch
            (4, 40, None, "SMITH"),  # null level
        ],
        ["id_l", "id_r", "name_l", "name_r"],
    )
    base = spark.createDataFrame(
        [("SMITH",)] * 3 + [("RARE",)], ["name"]
    )
    tf = term_frequency_table(base, "name")
    scored = score_pairs(pairs, model)
    out = {
        r["id_l"]: r
        for r in add_tf_adjustment(scored, model.comparisons[0], tf).collect()
    }
    u_exact = 0.1
    # common value: tf=0.75 > u_exact -> penalized
    assert out[1]["tf_adjustment"] == pytest.approx(
        math.log2(u_exact) - math.log2(0.75)
    )
    assert out[1]["tf_adjustment"] < 0
    # rare value: tf=0.25 -> boosted relative to common, still > u_exact
    assert out[2]["tf_adjustment"] == pytest.approx(
        math.log2(u_exact) - math.log2(0.25)
    )
    assert out[2]["tf_adjustment"] > out[1]["tf_adjustment"]
    # non-exact gammas: no adjustment
    assert out[3]["tf_adjustment"] == 0.0
    assert out[4]["tf_adjustment"] == 0.0
    # weights recomposed
    assert out[1]["match_weight_tf"] == pytest.approx(
        out[1]["match_weight"] + out[1]["tf_adjustment"]
    )
    # half weight interpolates
    half = {
        r["id_l"]: r
        for r in add_tf_adjustment(
            scored, model.comparisons[0], tf, weight=0.5
        ).collect()
    }
    assert half[1]["tf_adjustment"] == pytest.approx(out[1]["tf_adjustment"] / 2)


def test_tf_plan_broadcasts(spark, model):
    pairs = spark.createDataFrame([(1, 2, "A", "A")], ["id_l", "id_r", "name_l", "name_r"])
    base = spark.createDataFrame([("A",)], ["name"])
    tf = term_frequency_table(base, "name")
    plan = (
        add_tf_adjustment(score_pairs(pairs, model), model.comparisons[0], tf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
