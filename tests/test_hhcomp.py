"""HHComp reference-file construction + λ prior calculator."""

import pytest
from pyspark.sql import functions as F

from person_linkage_case_study_spark.operators.estimation import (
    probability_two_random_records_match,
)
from person_linkage_case_study_spark.plans.hhcomp import (
    add_pseudo_household_id,
    build_hhcomp_reference_file,
)


@pytest.fixture(scope="module")
def hh_fixture(spark):
    # household H1 (geokey G1): c1 PIKed, c2 unPIKed -> eligible
    # household H2 (geokey G2): c3, c4 both PIKed -> not eligible
    # household H3 (geokey G3): c5 unPIKed only -> not eligible
    census = spark.createDataFrame(
        [
            ("c1", "G1"), ("c2", "G1"),
            ("c3", "G2"), ("c4", "G2"),
            ("c5", "G3"),
            ("c6", None),  # GQ-suppressed: no household
        ],
        "record_id_raw_input_file string, geokey_for_blocking string",
    )
    confirmed = spark.createDataFrame(
        [("c1", "P1"), ("c3", "P3"), ("c4", "P4")],
        "record_id_raw_input_file string, pik string",
    )
    geobase = spark.createDataFrame(
        [
            # P1 (confirmed) lives at G1: its OTHER records excluded by the
            # confirmed-PIK rule; P9 unconfirmed at G1 -> included
            ("g1", "P1", "G1", "Alice"),
            ("g2", "P9", "G1", "Bob"),
            # P8 unconfirmed at G2 -> household not eligible, excluded
            ("g3", "P8", "G2", "Carol"),
            ("g4", "P7", None, "Dana"),  # no geokey -> excluded
        ],
        "record_id string, pik string, geokey_for_blocking string, first_name string",
    )
    return census, confirmed, geobase


def test_hhcomp_reference_file(hh_fixture):
    census, confirmed, geobase = hh_fixture
    census_phh = add_pseudo_household_id(census)
    phh = {
        r["record_id_raw_input_file"]: r["pseudo_household_id"]
        for r in census_phh.collect()
    }
    assert phh["c1"] == phh["c2"] and phh["c1"] is not None
    assert phh["c6"] is None

    ref = build_hhcomp_reference_file(census_phh, geobase, confirmed)
    rows = ref.collect()
    # only P9@G1 survives: G1 is the only eligible household's geokey, and
    # P1's record there is excluded because P1 is already confirmed
    assert len(rows) == 1
    assert rows[0]["pik"] == "P9"
    assert rows[0]["pseudo_household_id"] == phh["c1"]


def test_prior_calculator(spark):
    census = spark.createDataFrame(
        [(f"c{i}",) for i in range(100)], "record_id_raw_input_file string"
    )
    ref = spark.createDataFrame(
        [(f"P{i % 50}", i) for i in range(200)], "pik string, x long"
    )
    lam = probability_two_random_records_match(census, ref)
    # exact port: people_in=95, people_ref=49.75, both=85.5,
    # matches = 85.5 * (95/100) * (49.75/200); λ = matches / 20000
    expected = 85.5 * (95 / 100) * (49.75 / 200) / 20000
    assert lam == pytest.approx(expected, rel=1e-12)
    empty = spark.createDataFrame([], "record_id_raw_input_file string")
    assert probability_two_random_records_match(empty, ref) == 0.5
