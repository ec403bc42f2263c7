"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship probabilistic-linkage query (blocked
pairs → gamma levels → Fellegi-Sunter scores) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the operator catalog from
``person_linkage_case_study_spark.queries`` — each Spark query paired with
a DuckDB-ANSI oracle generated from the same model objects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from person_linkage_case_study_spark import queries as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _catalog.fs_customer_supplier_scores(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
