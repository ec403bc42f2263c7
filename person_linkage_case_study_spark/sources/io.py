"""Sources and sinks (SURVEY.md §2.1, S1-S6).

The reference reads/writes Parquet at every inter-stage handoff
(reference distributed_compute.py:648-670) and mints a globally-unique
string ``record_id`` per row as ``{dataset}_{partition}_{rownum}``
(reference distributed_compute.py:396-422). Here the handoffs disappear
(one SparkSession keeps the DAG resident) but the same IO surface is
provided, and record-id minting is expressed with
``spark_partition_id() + row_number()`` — no UDF, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """S1: parquet scan with column pruning.

    Passing ``columns`` mirrors the reference's ``read_parquet(columns=...)``
    (distributed_compute.py:648-657); under Catalyst the explicit ``select``
    prunes the Parquet ReadSchema so only those column chunks are scanned.
    """
    df = spark.read.parquet(path)
    if columns is not None:
        df = df.select(*columns)
    return df


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S2: overwrite parquet sink (reference distributed_compute.py:659-670
    removes the target dir first; Spark's overwrite mode is the same
    semantics, atomically per-partition)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = False,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """S3: CSV scan (the reference reads a headerless fake-names list,
    03_link_datasets.ipynb:460-464)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def empty_table(spark: SparkSession, schema: T.StructType | str) -> DataFrame:
    """S6: typed empty accumulator (reference distributed_compute.py:672-679).

    Used as the seed of cross-pass accumulators (confirmed_piks,
    provisional_links) so unionByName against it is schema-checked.
    """
    return spark.createDataFrame([], schema)


def add_record_id(
    df: DataFrame, dataset_name: str, col_name: str = "record_id"
) -> DataFrame:
    """Mint a deterministic, globally-unique string record id.

    Reference scheme: ``{dataset_name}_{partition}_{rownum}``
    (distributed_compute.py:396-422, 02_generate_case_study_files.ipynb:248-283).
    Implemented as ``spark_partition_id`` + per-partition ``row_number`` —
    identical shape, no data movement beyond one narrow window per partition.

    Determinism caveat (SURVEY.md §7.3.6): ids depend on the input
    partitioning, exactly as the reference's depend on Dask partitioning.
    For reproducible ids across runs, read from the same files with the same
    split settings, or pass a pre-sorted single-column key instead.
    """
    # materialize partition id + intra-partition order in the scan stage;
    # re-evaluating spark_partition_id() after the window shuffle would see
    # the *post-shuffle* partitioning and collide ids
    df = df.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__ord", F.monotonically_increasing_id()
    )
    w = Window.partitionBy("__pid").orderBy("__ord")
    return (
        df.withColumn(
            col_name,
            F.concat_ws(
                "_",
                F.lit(dataset_name),
                F.col("__pid").cast("string"),
                (F.row_number().over(w) - F.lit(1)).cast("string"),
            ),
        )
        .drop("__pid", "__ord")
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Shuffle-free-join sink: parquet table bucketed (and optionally
    sorted) on the join key.

    Repeated same-key joins against a bucketed table skip their exchange
    entirely — both sides arrive pre-partitioned — which is the scale fix
    for the cascade's geobase-by-person-key passes: pay the shuffle once
    at write, amortize it across every pass that joins on the key.
    Hive-metastore bucketing needs ``saveAsTable``; ``path`` puts the
    files outside the default warehouse dir.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a table written by ``write_bucketed``; joins/aggregations on
    the bucket key report no Exchange on this side (verify with
    ``.explain`` — the scan carries ``SelectedBucketsCount``)."""
    return spark.table(table)
