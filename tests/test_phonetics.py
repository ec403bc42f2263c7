"""Phonetic goldens (FIXTURES.md §6: match jellyfish 1.0.4 semantics)."""

from person_linkage_case_study_spark.functions.phonetics import nysiis


def test_nysiis_goldens():
    # pinned against jellyfish-compatible NYSIIS outputs
    assert nysiis("Knight") == "NAGT"
    assert nysiis("MACINTOSH") == "MCANT"
    assert nysiis("Phillip") == "FALAP"
    assert nysiis("Schmidt") == "SNAD"
    assert nysiis("O'Brien") == "OBRAN"
    assert nysiis("bill") == "BAL"
    assert nysiis("Smith") == "SNAT"
    assert nysiis("Brown") == "BRAN"
    assert nysiis(None) is None
    assert nysiis("") == ""


def test_nysiis_head_tail_rules():
    assert nysiis("Knuth")[0] == "N"  # KN -> NN
    assert nysiis("Kool")[0] == "C"  # K -> C
    assert nysiis("Pfeffer")[0] == "F"  # PF -> FF (deduped in key)
    assert nysiis("Schaefer").startswith("S")
    assert nysiis("Lawson") == "LASAN"  # W after vowel folds into the vowel


def test_soundex_spark(spark):
    from pyspark.sql import functions as F

    from person_linkage_case_study_spark.functions.phonetics import (
        reverse_soundex,
        soundex,
    )

    df = spark.createDataFrame(
        [("Robert",), ("Rupert",), ("Ashcraft",), ("Tymczak",), (None,)], ["name"]
    )
    rows = df.select(
        soundex(F.col("name")).alias("sx"),
        reverse_soundex(F.col("name")).alias("rsx"),
    ).collect()
    assert rows[0]["sx"] == "R163"
    assert rows[1]["sx"] == "R163"
    assert rows[2]["sx"] == "A261"  # H/W rule
    assert rows[4]["sx"] is None
    # reverse soundex = soundex of reversed string: Robert -> trebor -> T616
    assert rows[0]["rsx"] == "T616"
