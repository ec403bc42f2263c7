"""Reference-file builder (notebook-02 parity) + accuracy harness."""

import pytest
from pyspark.sql import functions as F

from person_linkage_case_study_spark.plans.accuracy import (
    accuracy_report,
    pik_simulant_pairs,
)
from person_linkage_case_study_spark.plans.reference_files import (
    best_data_from_columns,
    build_geobase_reference_file,
    build_name_dob_reference_file,
    dedupe_alternates,
    mint_pik_crosswalk,
)


@pytest.fixture(scope="module")
def numident(spark):
    rows = [
        # ssn1: name changed over time -> best = latest; two alternates
        ("t1", "111-11-1111", "Alice", None, "Smith", "19800115", "20000101", "birth"),
        ("t2", "111-11-1111", "Alice", None, "Jones", "19800115", "20150601", "name_change"),
        # ssn2: single record
        ("t3", "222-22-2222", "Bob", "Q", "Brown", "19751231", "19751231", "birth"),
        # ssn9 (ITIN)
        ("t4", "999-99-9999", "Zed", None, "Gray", "19900101", "19900101", "birth"),
    ]
    return spark.createDataFrame(
        rows,
        "record_id string, ssn string, first_name string, middle_name string, "
        "last_name string, date_of_birth string, event_date string, event_type string",
    )


def test_best_data_latest_wins(numident):
    best, lineage = best_data_from_columns(
        numident, ["first_name", "middle_name", "last_name"]
    )
    rows = {r["ssn"]: r for r in best.collect()}
    assert rows["111-11-1111"]["last_name"] == "Jones"  # latest transaction
    assert rows["222-22-2222"]["last_name"] == "Brown"
    assert lineage.count() == best.count()


def test_alternates_and_crosswalk(numident):
    alts = dedupe_alternates(
        numident, ["ssn", "first_name", "middle_name", "last_name"]
    )
    assert alts.filter(F.col("ssn") == "111-11-1111").count() == 2
    xwalk = mint_pik_crosswalk(numident, include_itins=False)
    piks = {r["ssn"]: r["pik"] for r in xwalk.collect()}
    assert "999-99-9999" not in piks  # ITIN branch excluded
    assert len(set(piks.values())) == len(piks)  # unique piks
    # deterministic across rebuilds
    again = {r["ssn"]: r["pik"] for r in mint_pik_crosswalk(numident, False).collect()}
    assert piks == again


def test_reference_file_cartesian(spark, numident):
    alts_name = dedupe_alternates(
        numident, ["ssn", "first_name", "middle_name", "last_name"]
    )
    alts_dob = dedupe_alternates(numident, ["ssn", "date_of_birth"])
    xwalk = mint_pik_crosswalk(numident)
    name_dob = build_name_dob_reference_file(alts_name, alts_dob, xwalk)
    # ssn1: 2 name combos x 1 dob = 2 rows
    assert name_dob.filter(F.col("ssn") == "111-11-1111").count() == 2
    addresses = spark.createDataFrame(
        [("a1", "111-11-1111", "1 Main St"), ("a2", "111-11-1111", "2 Oak St"),
         ("a3", "222-22-2222", "3 Elm St")],
        "record_id string, ssn string, mailing_address_street_name string",
    )
    geobase = build_geobase_reference_file(name_dob, addresses)
    # ssn1: 2 name-dob x 2 addresses = 4
    assert geobase.filter(F.col("ssn") == "111-11-1111").count() == 4
    assert geobase.select("record_id").distinct().count() == geobase.count()


def test_accuracy_definitions(spark):
    census_piked = spark.createDataFrame(
        [("c1", "PK1"), ("c2", "PK2"), ("c3", "PKMULTI"), ("c4", None)],
        "record_id string, pik string",
    )
    truth = spark.createDataFrame(
        [("c1", "s1"), ("c2", "s2"), ("c3", "s3"), ("c4", "s4")],
        "record_id string, simulant_id string",
    )
    ref_truth = spark.createDataFrame(
        [("r1", "s1"), ("r2", "sX"), ("r3", "s3"), ("r4", "s5")],
        "record_id string, simulant_id string",
    )
    ref_piks = spark.createDataFrame(
        [("r1", "PK1"), ("r2", "PK2"), ("r3", "PKMULTI"), ("r4", "PKMULTI")],
        "record_id string, pik string",
    )
    ps = pik_simulant_pairs(ref_truth, ref_piks)
    rep = accuracy_report(census_piked, truth, ps)
    assert rep.n_records == 4 and rep.n_piked == 3
    assert rep.piked_proportion == pytest.approx(0.75)
    # c1: PK1->s1 single & correct; c2: PK2->sX single & wrong;
    # c3: PKMULTI->{s3,s5} multi, contains truth
    assert rep.accuracy_def1 == pytest.approx(1 / 3)
    assert rep.accuracy_def2 == pytest.approx(1 / 2)
    assert rep.accuracy_def3 == pytest.approx(2 / 3)
