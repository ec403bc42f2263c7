"""run_concurrent (operators/concurrent.py): the §2.6 overlap helper the
collapsed dedup pipeline uses to run its candidate and scorer chains as
concurrent driver jobs."""

import pytest

from person_linkage_case_study_spark.operators.concurrent import run_concurrent


def test_results_in_order(spark):
    def a():
        return spark.range(10).count()

    def b():
        return "b-result"

    def c():
        return spark.range(5).agg({"id": "sum"}).collect()[0][0]

    assert run_concurrent(spark, [a, b, c], labels=["ja", None, "jc"]) == [
        10,
        "b-result",
        10,
    ]


def test_single_thunk_skips_threads(spark):
    # n == 1 runs inline (no thread machinery)
    assert run_concurrent(spark, [lambda: 42]) == [42]


def test_first_error_reraises_after_join(spark):
    done = []

    def ok():
        done.append(spark.range(3).count())
        return "ok"

    def boom():
        raise RuntimeError("thunk failed")

    with pytest.raises(RuntimeError, match="thunk failed"):
        run_concurrent(spark, [boom, ok])
    # the healthy thunk was joined (ran to completion), not orphaned
    assert done == [3]


def test_job_description_restored(spark):
    sc = spark.sparkContext
    sc.setJobDescription("outer")
    try:
        run_concurrent(
            spark,
            [lambda: spark.range(2).count(), lambda: spark.range(2).count()],
            labels=["inner-a", "inner-b"],
        )
        # labels are thread-local to the worker threads; the caller's
        # description is untouched
        assert sc.getLocalProperty("spark.job.description") == "outer"
    finally:
        sc.setJobDescription(None)
