"""Bucketed-table sink: same-key joins skip the exchange."""

import uuid

from pyspark.sql import functions as F

from person_linkage_case_study_spark.sources.io import read_bucketed, write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    a_name = f"bk_a_{uuid.uuid4().hex[:8]}"
    b_name = f"bk_b_{uuid.uuid4().hex[:8]}"
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, a_name, ["k"], num_buckets=8, path=str(base / "a"))
    write_bucketed(b, b_name, ["k"], num_buckets=8, path=str(base / "b"))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ta, tb = read_bucketed(spark, a_name), read_bucketed(spark, b_name)
        joined = ta.join(tb, on="k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketed scans feed the sort-merge join pre-partitioned: no
        # shuffle exchange on either side
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 1000

        # same key, different values: correctness of the co-located join
        row = joined.filter(F.col("k") == 7).first()
        assert (row["va"], row["vb"]) == (14, 21)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    spark.sql(f"DROP TABLE IF EXISTS {a_name}")
    spark.sql(f"DROP TABLE IF EXISTS {b_name}")
