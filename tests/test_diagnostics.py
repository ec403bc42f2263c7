"""K11 diagnostics tables + multi-session EM combining (SURVEY.md §2.9).

Reference parity targets: the Splink chart data the reference saves as
HTML reports (03_link_datasets.ipynb:1610-1738) and the two-EM-session
training recipe (03_link_datasets.ipynb:1650-1692).
"""

import math

import pytest

from person_linkage_case_study_spark.operators.estimation import (
    estimate_m_em,
    estimate_m_two_sessions,
    estimate_u,
)
from person_linkage_case_study_spark.operators.gamma import (
    exact_comparison,
    jw_comparison,
)
from person_linkage_case_study_spark.operators.scoring import (
    LinkageModel,
    score_pairs,
)
from person_linkage_case_study_spark.plans.diagnostics import (
    em_history_table,
    gamma_pattern_summary,
    match_weights_table,
    mu_parameters_table,
)


def make_model():
    name = jw_comparison("name", thresholds=(0.9,))
    name.m = [0.1, 0.2, 0.7]
    name.u = [0.8, 0.15, 0.05]
    year = exact_comparison("year")
    year.m = [0.2, 0.8]
    year.u = [0.9, 0.1]
    return LinkageModel([name, year], lambda_prior=0.01)


def test_mu_parameters_table_closed_form(spark):
    got = {
        (r["comparison"], r["gamma"]): r
        for r in mu_parameters_table(spark, make_model()).collect()
    }
    assert len(got) == 5
    r = got[("name", 2)]
    assert r["m"] == 0.7 and r["u"] == 0.05
    assert r["bayes_factor"] == pytest.approx(14.0, abs=1e-6)
    assert r["log2_bayes_factor"] == pytest.approx(math.log2(14.0), abs=1e-6)


def test_match_weights_table_prior_and_levels(spark):
    rows = {(r["comparison"], r["gamma"]): r["match_weight"]
            for r in match_weights_table(spark, make_model()).collect()}
    assert rows[("__prior__", -1)] == pytest.approx(math.log2(0.01 / 0.99), abs=1e-6)
    assert rows[("year", 1)] == pytest.approx(3.0, abs=1e-6)  # log2(0.8/0.1)


def test_em_history_records_iterations(spark):
    left = spark.createDataFrame(
        [(i % 10, f"n{i}") for i in range(100)], ["blk", "name"]
    )
    right = spark.createDataFrame(
        [(i % 10, f"n{i}" if i % 2 else f"x{i}") for i in range(100)], ["blk", "name"]
    )
    comp = exact_comparison("name")
    comp.u = [0.99, 0.01]
    hist: list = []
    estimate_m_em(left, right, ["blk"], LinkageModel([comp], 0.1), history=hist)
    assert hist, "history must record at least one iteration"
    df = em_history_table(spark, hist)
    assert df.columns == ["iteration", "comparison", "gamma", "m", "max_delta"]
    iters = sorted({r["iteration"] for r in df.collect()})
    assert iters[0] == 0 and iters == list(range(len(iters)))
    # final history row matches the trained model
    last = [r for r in df.collect() if r["iteration"] == iters[-1] and r["gamma"] == 1]
    assert last[0]["m"] == pytest.approx(comp.m[1], abs=1e-12)


def test_gamma_pattern_summary(spark):
    model = make_model()
    pairs = spark.createDataFrame(
        [
            ("MARTHA", "MARTHA", 1980, 1980),
            ("MARTHA", "MARTHA", 1980, 1980),
            ("MARTHA", "XAVIER", 1980, 1990),
        ],
        ["name_l", "name_r", "year_l", "year_r"],
    )
    scored = score_pairs(pairs, model)
    rows = gamma_pattern_summary(scored, model.comparisons).collect()
    assert rows[0]["gamma_name"] == 2 and rows[0]["gamma_year"] == 1
    assert rows[0]["n_pairs"] == 2
    expected = math.log2(0.01 / 0.99) + math.log2(0.7 / 0.05) + math.log2(0.8 / 0.1)
    assert rows[0]["mean_match_weight"] == pytest.approx(expected, abs=1e-5)


def test_two_session_em_combining(spark):
    """Reference recipe: session A blocks on dob (estimates name m),
    session B blocks on name (estimates dob m); combining fills BOTH
    comparisons with data-driven estimates — either single session leaves
    its own blocking column at the (wrong) initial value."""
    import random

    rng = random.Random(11)
    n = 400
    rows_l, rows_r = [], []
    for i in range(n):
        name = f"name{i}"
        dob = f"d{i}"
        rows_l.append((name, dob))
        # matched partner: name agrees 85%, dob agrees 70%
        rows_r.append(
            (
                name if rng.random() < 0.85 else f"on{i}",
                dob if rng.random() < 0.70 else f"od{i}",
            )
        )
    left = spark.createDataFrame(rows_l, ["name", "dob"])
    right = spark.createDataFrame(rows_r, ["name", "dob"])

    # λ fixed near 1: the blocked training pairs are (by construction of
    # unique keys) almost all true matches — a mis-set λ makes EM reassign
    # disagreeing matched pairs to the non-match class and biases m upward
    name_c, dob_c = exact_comparison("name"), exact_comparison("dob")
    estimate_u(left, right, [name_c, dob_c], max_pairs=1e6, seed=3)
    model = LinkageModel([name_c, dob_c], lambda_prior=0.999)

    single = LinkageModel(
        [exact_comparison("name"), exact_comparison("dob")], lambda_prior=0.999
    )
    for c, src in zip(single.comparisons, model.comparisons):
        c.u = list(src.u)
    estimate_m_em(left, right, ["dob"], single)
    # the single dob-blocked session never observes dob disagreement:
    # m for dob stays at the uninformative init, far from the true 0.70
    assert abs(single.comparisons[1].m[1] - 0.70) > 0.15

    estimate_m_two_sessions(left, right, [["dob"], ["name"]], model)
    assert model.comparisons[0].m[1] == pytest.approx(0.85, abs=0.08)
    assert model.comparisons[1].m[1] == pytest.approx(0.70, abs=0.08)


def test_chart_specs_and_report(spark, tmp_path):
    from person_linkage_case_study_spark.plans.diagnostics import (
        em_history_chart_spec,
        match_weights_chart_spec,
        mu_chart_spec,
        write_diagnostics_report,
    )

    model = make_model()
    mu = mu_chart_spec(mu_parameters_table(spark, model))
    # long-form: one row per (comparison, gamma, m|u)
    n_levels = sum(c.n_gamma_levels() for c in model.comparisons)
    assert len(mu["data"]["values"]) == 2 * n_levels
    assert mu["mark"] == "bar" and mu["encoding"]["x"]["field"] == "p"

    mw = match_weights_chart_spec(match_weights_table(spark, model))
    vals = mw["data"]["values"]
    assert any(v["comparison"] == "__prior__" for v in vals)
    # weights in the spec equal log2(m/u) from the model
    name_top = next(v for v in vals if v["comparison"] == "name" and v["gamma"] == 2)
    assert name_top["match_weight"] == pytest.approx(math.log2(0.7 / 0.05), abs=1e-5)

    hist = [
        {"iteration": i, "comparison": "name", "gamma": 2, "m": 0.5 + 0.1 * i, "max_delta": 0.1}
        for i in range(3)
    ]
    em = em_history_chart_spec(em_history_table(spark, hist))
    assert len(em["data"]["values"]) == 3 and em["mark"] == "line"

    out = tmp_path / "report.html"
    write_diagnostics_report(str(out), {"m/u": mu, "weights": mw, "EM": em})
    html = out.read_text()
    assert "vegaEmbed" in html and '"match_weight"' in html
    assert html.count("<h2>") == 3


def test_parameter_estimate_comparisons_table(spark):
    """The cross-session m-estimate comparison (ref 03:1702): final m per
    session per (comparison, gamma), with spread; sessions only carry the
    comparisons they estimated."""
    from person_linkage_case_study_spark.plans.diagnostics import (
        parameter_estimate_comparisons_table,
    )

    # two synthetic histories: session 0 estimated name, session 1 both
    h0 = [
        {"iteration": 1, "comparison": "name", "gamma": 1, "m": 0.5, "max_delta": 1},
        {"iteration": 2, "comparison": "name", "gamma": 1, "m": 0.62, "max_delta": 0.1},
    ]
    h1 = [
        {"iteration": 1, "comparison": "name", "gamma": 1, "m": 0.7, "max_delta": 1},
        {"iteration": 1, "comparison": "dob", "gamma": 1, "m": 0.3, "max_delta": 1},
    ]
    t = parameter_estimate_comparisons_table(
        spark, [h0, h1], session_labels=["block_dob", "block_name"]
    )
    rows = {(r["session"], r["comparison"], r["gamma"]): r for r in t.collect()}
    # last iteration wins as the session estimate
    assert rows[("block_dob", "name", 1)]["m_estimate"] == 0.62
    assert rows[("block_name", "name", 1)]["m_estimate"] == 0.7
    assert rows[("block_dob", "name", 1)]["m_spread"] == pytest.approx(0.08)
    assert rows[("block_dob", "name", 1)]["n_sessions"] == 2
    assert rows[("block_name", "dob", 1)]["n_sessions"] == 1
    assert rows[("block_name", "dob", 1)]["m_spread"] == 0.0


def test_parameter_comparisons_from_real_two_session_run(spark):
    """End-to-end: histories= from estimate_m_two_sessions feed the table;
    each session contributes only the non-blocked comparison."""
    from person_linkage_case_study_spark.plans.diagnostics import (
        parameter_estimate_comparisons_chart_spec,
        parameter_estimate_comparisons_table,
    )

    left = spark.createDataFrame(
        [(f"n{i}", f"d{i}") for i in range(60)], ["name", "dob"]
    )
    right = spark.createDataFrame(
        [(f"n{i}" if i % 5 else f"x{i}", f"d{i}") for i in range(60)],
        ["name", "dob"],
    )
    name_c, dob_c = exact_comparison("name"), exact_comparison("dob")
    name_c.u, dob_c.u = [0.9, 0.1], [0.9, 0.1]
    model = LinkageModel([name_c, dob_c], lambda_prior=0.999)
    histories = []
    estimate_m_two_sessions(
        left, right, [["dob"], ["name"]], model, histories=histories
    )
    t = parameter_estimate_comparisons_table(
        spark, histories, session_labels=["block_dob", "block_name"]
    )
    got = {(r["session"], r["comparison"]) for r in t.collect()}
    assert ("block_dob", "name") in got and ("block_name", "dob") in got
    assert ("block_dob", "dob") not in got  # session skips its own block col
    spec = parameter_estimate_comparisons_chart_spec(t)
    assert spec["mark"] == "bar" and spec["encoding"]["color"]["field"] == "session"


def test_pair_drilldown_table(spark):
    """Per-pair waterfall (ref 03:2036-2041): prior + per-comparison
    contributions reconstruct the pair's match weight exactly."""
    from person_linkage_case_study_spark.operators.gamma import banded_comparison  # noqa: F401
    from person_linkage_case_study_spark.plans.diagnostics import pair_drilldown_table

    model = make_model()
    pairs = spark.createDataFrame(
        [
            ("a", "x", "JONES", "JONES", 2001, 2001),
            ("b", "y", "JONES", "SMITH", 2001, 1990),
        ],
        ["id_l", "id_r", "name_l", "name_r", "year_l", "year_r"],
    )
    scored = score_pairs(pairs, model)
    d = {r["id_l"]: r for r in pair_drilldown_table(
        scored, model, id_cols=["id_l", "id_r"]
    ).collect()}
    a = d["a"]
    assert a["gamma_name"] == 2 and a["gamma_year"] == 1
    expected = (
        math.log2(0.01 / 0.99) + math.log2(0.7 / 0.05) + math.log2(0.8 / 0.1)
    )
    assert a["total_match_weight"] == pytest.approx(expected, abs=1e-5)
    assert a["prior_weight"] + a["log2_bf_name"] + a["log2_bf_year"] == pytest.approx(
        a["total_match_weight"], abs=2e-6
    )
    b = d["b"]
    assert b["gamma_name"] in (0, 1) and b["gamma_year"] == 0
    assert b["log2_bf_year"] == pytest.approx(math.log2(0.2 / 0.9), abs=1e-5)
