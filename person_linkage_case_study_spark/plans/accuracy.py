"""Ground-truth accuracy harness (SURVEY.md §5.2; reference notebook 04).

Because inputs are simulated, true identity (``simulant_id``) is known; PIK
assignments are scored under the reference's three strictness definitions
(04_calculate_ground_truth_accuracy.ipynb markdown §"Definitions of
accuracy"):

1. strict   — a PIK mapping to multiple simulants is incorrect;
2. neutral  — multi-simulant PIKs are excluded from the denominator;
3. lenient  — correct if ANY simulant of the PIK matches the truth.

All computations are a handful of joins + aggregates over small ground-
truth sidecars — driver-side scalars come out of ``collect`` on 1-row
aggregates.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pik_simulant_pairs(
    reference_ground_truth: DataFrame, reference_piks: DataFrame
) -> DataFrame:
    """(pik, simulant_id, n_unique_simulants): which true people each PIK
    covers (multi-simulant PIKs arise from reference-construction errors
    by shared SSN — reference 04:~'can be PIKs that correspond to multiple
    simulants')."""
    pairs = (
        reference_ground_truth.select("record_id", "simulant_id")
        .join(reference_piks.select("record_id", "pik"), on="record_id")
        .select("pik", "simulant_id")
        .distinct()
    )
    n_sim = pairs.groupBy("pik").agg(
        F.count_distinct("simulant_id").alias("n_unique_simulants")
    )
    return pairs.join(n_sim, on="pik")


@dataclass
class AccuracyReport:
    piked_proportion: float
    possible_to_pik_proportion: float
    accuracy_def1: float
    accuracy_def2: float
    accuracy_def3: float
    n_piked: int
    n_records: int

    def as_dict(self) -> dict:
        return self.__dict__.copy()


def accuracy_report(
    census_piked: DataFrame,
    census_ground_truth: DataFrame,
    pik_simulants: DataFrame,
) -> AccuracyReport:
    """Score PIK assignments against ground truth.

    ``census_piked``: raw census + nullable ``pik`` (cascade output).
    ``census_ground_truth``: (record_id, simulant_id).
    ``pik_simulants``: output of :func:`pik_simulant_pairs`.
    """
    n_records = census_piked.count()
    piked = census_piked.filter(F.col("pik").isNotNull()).select("record_id", "pik")
    n_piked = piked.count()

    possible = census_ground_truth.join(
        pik_simulants.select("simulant_id").distinct(), on="simulant_id", how="left_semi"
    ).count()

    # per piked record: does its pik cover the true simulant? is it multi?
    scored = (
        piked.join(census_ground_truth, on="record_id")
        .join(
            pik_simulants.withColumnRenamed("simulant_id", "pik_simulant"),
            on="pik",
            how="left",
        )
        .groupBy("record_id")
        .agg(
            F.max(
                (F.col("pik_simulant") == F.col("simulant_id")).cast("int")
            ).alias("any_match"),
            F.max("n_unique_simulants").alias("n_sim"),
        )
    )
    row = scored.agg(
        F.sum(
            ((F.col("n_sim") == 1) & (F.col("any_match") == 1)).cast("int")
        ).alias("strict_correct"),
        F.sum((F.col("n_sim") == 1).cast("int")).alias("single_sim"),
        F.sum((F.col("any_match") == 1).cast("int")).alias("lenient_correct"),
        F.count(F.lit(1)).alias("n"),
    ).first()

    def _safe(n, d):
        return float(n) / d if d else 0.0

    return AccuracyReport(
        piked_proportion=_safe(n_piked, n_records),
        possible_to_pik_proportion=_safe(possible, n_records),
        accuracy_def1=_safe(row["strict_correct"], row["n"]),
        accuracy_def2=_safe(row["strict_correct"], row["single_sim"]),
        accuracy_def3=_safe(row["lenient_correct"], row["n"]),
        n_piked=n_piked,
        n_records=n_records,
    )


def accuracy_by_module(
    confirmed_piks: DataFrame,
    census_ground_truth: DataFrame,
    pik_simulants: DataFrame,
) -> DataFrame:
    """Definition-3 accuracy per (module, pass) — the reference's tuning
    table (04: 'Accuracy by module/pass')."""
    scored = (
        confirmed_piks.join(
            census_ground_truth.withColumnRenamed("record_id", "record_id_raw_input_file"),
            on="record_id_raw_input_file",
        )
        .join(
            pik_simulants.withColumnRenamed("simulant_id", "pik_simulant"),
            on="pik",
            how="left",
        )
        .groupBy("record_id_raw_input_file", "module_name", "pass_name")
        .agg(
            F.max(
                (F.col("pik_simulant") == F.col("simulant_id")).cast("int")
            ).alias("correct")
        )
    )
    return scored.groupBy("module_name", "pass_name").agg(
        F.round(F.avg("correct"), 6).alias("accuracy"),
        F.count(F.lit(1)).alias("n_links"),
    )
