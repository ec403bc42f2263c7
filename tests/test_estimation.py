"""u-estimation and EM training (SURVEY.md §2.4 A10/A11)."""

import pytest
from pyspark.sql import functions as F

from person_linkage_case_study_spark.operators.estimation import (
    estimate_m_em,
    estimate_u,
    lambda_from_expected_match_rate,
)
from person_linkage_case_study_spark.operators.gamma import exact_comparison
from person_linkage_case_study_spark.operators.scoring import LinkageModel


def test_estimate_u_proportions(spark):
    # left/right share the value 'x' in ~10% of rows: u[exact gamma=1] ≈ 0.1^... small
    left = spark.createDataFrame(
        [(("x" if i % 10 == 0 else f"l{i}"),) for i in range(200)], ["v"]
    )
    right = spark.createDataFrame(
        [(("x" if i % 10 == 0 else f"r{i}"),) for i in range(200)], ["v"]
    )
    comps = [exact_comparison("v")]
    estimate_u(left, right, comps, max_pairs=1e6, seed=7)
    u = comps[0].u
    assert len(u) == 2
    # P(random pair agrees) = 0.1 * 0.1 = 0.01
    assert u[1] == pytest.approx(0.01, rel=0.5)
    assert u[0] == pytest.approx(0.99, rel=0.05)


def test_em_recovers_m_on_planted_data(spark):
    """Plant matched pairs (same id => name agrees 90%) among non-matches;
    EM with fixed u/λ should push m[1] toward ~0.9."""
    import random

    rng = random.Random(5)
    n = 400
    rows_l, rows_r = [], []
    for i in range(n):
        blk = i % 20
        name = f"name{i}"
        rows_l.append((blk, name, i))
        # matched partner agrees on name with p=0.9
        rname = name if rng.random() < 0.9 else f"other{i}"
        rows_r.append((blk, rname, i))
    left = spark.createDataFrame(rows_l, ["blk", "name", "lid"])
    right = spark.createDataFrame(rows_r, ["blk", "name", "rid"])

    comp = exact_comparison("name")
    # u from seeded random sampling first (the reference's order of
    # operations: estimate_u_using_random_sampling, then EM with u fixed)
    estimate_u(left, right, [comp], max_pairs=1e6, seed=3)
    assert comp.u[1] < 0.01  # names almost never agree at random
    model = LinkageModel([comp], lambda_prior=1 / 20)  # 1 match per 20-pair block
    estimate_m_em(left, right, ["blk"], model)
    assert model.comparisons[0].m[1] == pytest.approx(0.9, abs=0.08)


def test_lambda_prior():
    lam = lambda_from_expected_match_rate(1000, 1000, 900)
    assert lam == pytest.approx(9e-4)
