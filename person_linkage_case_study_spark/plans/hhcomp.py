"""HHCompSearch reference-file construction (SURVEY.md §7.1 step 6;
reference 03_link_datasets.ipynb:2982-3131).

After the first three modules, PVS searches within *households*: for each
household containing both PIKed and unPIKed members, the reference file
becomes the not-yet-assigned reference records at that household's
geokeys — "the program removes all household members with a PIK, leaving
the unPIKed persons in the household" (Wagner and Layne p. 16, quoted in
the reference).

Spark shape: one groupBy per household (piked/unpiked counts), two
semi/anti joins, one equi-join on geokey — all key-partitioned shuffles;
the eligible-household table is small and broadcastable late in the
cascade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import anti_join, semi_join


def add_pseudo_household_id(census: DataFrame) -> DataFrame:
    """Approximate household clustering by geokey (the reference's
    pseudo_household_id; uses geokey_for_blocking so GQ mega-households
    stay excluded — 03:2987-2996). Deterministic id = hash of the geokey
    (the reference mints positional ids; a content hash is reproducible
    across partitionings)."""
    return census.withColumn(
        "pseudo_household_id",
        F.when(
            F.col("geokey_for_blocking").isNotNull(),
            F.sha2(F.concat(F.lit("phh:"), F.col("geokey_for_blocking")), 256).substr(
                1, 16
            ),
        ),
    )


def build_hhcomp_reference_file(
    census_with_phh: DataFrame,
    geobase_reference_file: DataFrame,
    confirmed_piks: DataFrame,
) -> DataFrame:
    """The HHComp reference file (03:3010-3131):

    1. households with ≥1 PIKed and ≥1 unPIKed member are *eligible*;
    2. collect the PIKs of each eligible household → their geokeys from
       the geobase;
    3. take geobase records at those geokeys whose PIK is NOT yet
       confirmed anywhere (the surprising-but-documented PVS exclusion);
    4. tag them with the household id (the module's cut column).
    """
    piks_with_household = census_with_phh.select(
        "pseudo_household_id", "record_id_raw_input_file"
    ).join(
        confirmed_piks.select("record_id_raw_input_file", "pik"),
        on="record_id_raw_input_file",
        how="left",
    )
    by_household = piks_with_household.groupBy("pseudo_household_id").agg(
        F.count("pik").alias("piked"),
        F.count(F.lit(1)).alias("size"),
    )
    eligible_households = by_household.filter(
        (F.col("piked") > 0) & (F.col("size") - F.col("piked") > 0)
    ).select("pseudo_household_id")

    piks_by_eligible_household = (
        semi_join(
            piks_with_household.na.drop(subset=["pik"]),
            eligible_households,
            on="pseudo_household_id",
        )
        .select("pseudo_household_id", "pik")
        .distinct()
    )
    geobase_geokeys = (
        geobase_reference_file.select("pik", "geokey_for_blocking")
        .na.drop(subset=["geokey_for_blocking"])
        .distinct()
    )
    geokeys_by_eligible_household = (
        piks_by_eligible_household.join(geobase_geokeys, on="pik")
        .select("pseudo_household_id", "geokey_for_blocking")
        .distinct()
    )
    eligible_reference_records = anti_join(
        geobase_reference_file.filter(F.col("geokey_for_blocking").isNotNull()),
        confirmed_piks.select("pik").distinct(),
        on="pik",
    )
    return geokeys_by_eligible_household.join(
        eligible_reference_records, on="geokey_for_blocking"
    )
