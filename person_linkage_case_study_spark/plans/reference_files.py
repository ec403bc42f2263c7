"""Reference-file construction (SURVEY.md §7.1 step 8; reference
notebook 02_generate_case_study_files.ipynb).

From simulated administrative tables (SSA Numident transactions, tax
1040/W2 address records) build:

- ``census_numident``     — best data per SSN (latest-transaction name,
                            DOB, date of death), lineage-tracked;
- ``alternate_name`` / ``alternate_dob`` — distinct historical combos per
                            SSN (02:25315+);
- ``name_dob_reference_file``  — names × DOBs per SSN;
- ``geobase_reference_file``   — name combos × address combos per SSN
                            (J9 cartesian-by-key, the 869M-row table at
                            USA scale);
- ``pik_crosswalk``        — one PIK per SSN (ITINs — ssn starting with
                            '9' — excluded or kept per PVS branch,
                            02:899-901).

Spark shape: every "best per SSN" is the W1 window top-1 (one shuffle per
table); the cartesian-by-key is a plain many-to-many join on ssn —
skew-prone at scale, so geobase construction accepts salt/AQE settings
from the session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import keep_best
from ..sources.lineage import new_lineage


def fill_event_date_for_sort(
    df: DataFrame, date_col: str = "event_date", fill: str = "1900-01-01"
) -> DataFrame:
    """D4: sentinel-filled sort key as epoch seconds (the reference fills
    unparseable/missing dates with 1900/2100 sentinels and sorts by int64,
    02:1296-1321). ``try_to_date``, not ``to_date``: "unparseable → fill"
    is the documented contract, and under Spark 4's default ANSI mode a
    strict parse would throw on the first malformed event date instead."""
    d = F.coalesce(F.try_to_date(F.col(date_col), "yyyyMMdd"), F.lit(fill).cast("date"))
    return df.withColumn(
        "event_date_for_sort", F.unix_timestamp(d.cast("timestamp"))
    )


def best_data_from_columns(
    transactions: DataFrame,
    columns: list[str],
    best_is_latest: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Best (latest-transaction) values of ``columns`` per SSN — the
    reference's ``best_data_from_columns`` (02:~23630): fill sort dates,
    drop all-null rows, keep-last by event date. Returns (table, lineage).

    keep="last" with a deterministic record_id tiebreak (SURVEY §7.3.2).
    """
    df = fill_event_date_for_sort(transactions)
    df = df.na.drop(subset=columns, how="all")
    order = (
        [F.desc("event_date_for_sort")] if best_is_latest else [F.asc("event_date_for_sort")]
    )
    best = keep_best(df, keys=["ssn"], order_by=order, tiebreak="record_id").select(
        "record_id", "ssn", *columns
    )
    return best, new_lineage(best)


def dedupe_alternates(
    transactions: DataFrame, columns: list[str]
) -> DataFrame:
    """Distinct historical value combos per SSN (alternate names/DOBs),
    keeping a deterministic representative record_id per combo
    (02 ``dedupe_preserving_source_records``)."""
    return keep_best(
        transactions.na.drop(subset=[c for c in columns if c != "ssn"], how="all"),
        keys=columns,
        order_by=[F.asc("record_id")],
        tiebreak="record_id",
    ).select("record_id", *columns)


def mint_pik_crosswalk(ssns: DataFrame, include_itins: bool = True) -> DataFrame:
    """One PIK per distinct SSN. ITINs start with '9' (02:899-901); PVS
    keeps them in a separate branch — excluded when include_itins=False.

    PIK = deterministic function of SSN (sha2-based) so re-builds mint
    identical keys; the reference uses row position, which is partition-
    dependent — a deterministic hash is strictly better for reproducibility
    and carries no coordination cost at scale.
    """
    s = ssns.select("ssn").distinct()
    if not include_itins:
        s = s.filter(~F.col("ssn").startswith("9"))
    return s.withColumn("pik", F.sha2(F.concat(F.lit("pik:"), F.col("ssn")), 256).substr(1, 16))


def build_name_dob_reference_file(
    alternate_names: DataFrame,
    alternate_dobs: DataFrame,
    crosswalk: DataFrame,
) -> DataFrame:
    """names × DOBs per SSN with PIK attached (02: name_dob construction).
    Many-to-many join on ssn — each output row is one (name-combo,
    dob-combo) linkage record."""
    names = alternate_names.select(
        F.col("record_id").alias("name_record_id"),
        "ssn",
        "first_name",
        "middle_name",
        "last_name",
    )
    dobs = alternate_dobs.select(
        F.col("record_id").alias("dob_record_id"), "ssn", "date_of_birth"
    )
    joined = names.join(dobs, on="ssn").join(crosswalk, on="ssn")
    return joined.select(
        F.concat_ws("|", F.col("name_record_id"), F.col("dob_record_id")).alias(
            "record_id"
        ),
        "pik",
        "ssn",
        "first_name",
        "middle_name",
        "last_name",
        "date_of_birth",
    )


def build_geobase_reference_file(
    name_dob: DataFrame,
    addresses: DataFrame,
) -> DataFrame:
    """name/DOB combos × address combos per SSN (J9; at USA scale this is
    the 869M-row many-to-many join — executed usa/02 cell 86). Address
    columns keep their ``mailing_address_`` prefix as in the tax data;
    preprocessing strips it (03:690-693)."""
    addr_cols = [c for c in addresses.columns if c not in ("record_id", "ssn")]
    a = addresses.select(
        F.col("record_id").alias("addr_record_id"), "ssn", *addr_cols
    )
    joined = name_dob.join(a, on="ssn")
    return joined.select(
        F.concat_ws("|", F.col("record_id"), F.col("addr_record_id")).alias("record_id"),
        "pik",
        "ssn",
        "first_name",
        "middle_name",
        "last_name",
        "date_of_birth",
        *addr_cols,
    )


def ground_truth_sidecar(
    reference_file: DataFrame, source_truth: DataFrame, lineage: DataFrame | None = None
) -> DataFrame:
    """(record_id, simulant_id, n_unique_simulants) for accuracy scoring
    (02:1968-1988): reference rows inherit every simulant of their source
    records; multi-simulant rows come from shared/erroneous SSNs."""
    if lineage is not None:
        pairs = (
            lineage.join(
                source_truth.withColumnRenamed("record_id", "source_record_id"),
                on="source_record_id",
            )
            .select("record_id", "simulant_id")
            .distinct()
        )
    else:
        pairs = reference_file.select("record_id", "ssn").join(
            source_truth, on="ssn"
        ).select("record_id", "simulant_id").distinct()
    n = pairs.groupBy("record_id").agg(
        F.count_distinct("simulant_id").alias("n_unique_simulants")
    )
    return pairs.join(n, on="record_id")
