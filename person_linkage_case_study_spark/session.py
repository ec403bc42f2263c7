"""SparkSession factory with scale-oriented defaults.

The reference hand-rolls partition balancing, spill management, and shuffle
parallelism tuning (distributed_compute.py:574-634,990-991,44-68); on Spark
these collapse into AQE + a handful of confs set once here. Every entry point
(tests, bench, driver contract) builds its session through ``get_spark`` so
the physical-execution posture is uniform.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for a large cluster but safe on local[N]:
# - AQE on: runtime partition coalescing replaces the reference's rebalance(),
#   skew-join replaces its hand salting for all but pathological keys.
# - Arrow on: vectorized pandas_udf transfer for the phonetic/similarity UDFs.
# - 64MB advisory partitions: at 100TB input this yields well-sized reducers;
#   AQE coalesces the small local case down automatically.
_DEFAULT_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # big Arrow batches amortize pandas-UDF overhead and let the JW kernel's
    # per-batch unique-pair dedup actually deduplicate (10k-row default
    # batches barely repeat; 200k-row batches repeat heavily)
    "spark.sql.execution.arrow.maxRecordsPerBatch": "200000",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": "8g",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "spark-linkage",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard confs.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    the same code runs under the driver harness, pytest, and bench.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULT_CONF)
    # ship the JVM UDF jar (native Jaro-Winkler — zero Arrow transfer on
    # the scoring hot path) when it has been built
    jar = os.path.join(os.path.dirname(__file__), "jvm", "sparklinkage.jar")
    if os.path.exists(jar):
        conf.setdefault("spark.jars", jar)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
